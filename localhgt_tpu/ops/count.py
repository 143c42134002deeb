"""Saturating k-mer count tables as device arrays.

The reference keeps one `char[2^k]` per run (4 GB at k=32) updated by racy
unsynchronized threads with a saturation cap of 3
(src/extract_ref_normal_peak.cpp:23,1082-1085). The TPU formulation is a
deterministic scatter-add:

  * per batch, each index's contribution is capped at `cap` by ranking
    duplicates within the sorted batch (so int8 can never overflow), then
  * a scatter-add plus a (deferrable) clip reproduces exactly
    final_count = min(total_occurrences, cap) — the single-threaded reference
    semantics (SURVEY.md section 5 "race detection": the rebuild replaces the
    benign data race with deterministic merges).

Tables are **1-D [2^k]** for k <= 30 (hash indices fit int32) and
[2^(k-23), 2^23] for k > 30 (XLA gather/scatter indices are int32, so the
2^32 hash space splits on high bits). Shapes matter on TPU: a (1, 2^k)
array gets its unit leading dim padded to the sublane tile, quadrupling the
HBM footprint (observed: 3 x 1 GB int8 tables billed as 3 x 4 GB arguments)
— hence 1-D flat tables, and the sharded form sized so both dims are tile
multiples. The single hash value 0xFFFFFFFF
doubles as the invalid sentinel (a degenerate all-ones k-mer code; the
reference similarly treats index 0 as unusable, read_index cpp:936-941).

Multi-chip: per-shard tables merge with a saturating collective
(min(psum(local), cap)) — see localhgt_tpu.parallel.mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from localhgt_tpu.ops import encode

TABLE_BITS = 30   # largest k stored flat (indices stay int32)
SHARD_WIDTH_BITS = 23  # sharded row width: both dims are TPU tile multiples
SENTINEL = jnp.uint32(0xFFFFFFFF)


def make_table(k: int) -> jnp.ndarray:
    if k <= TABLE_BITS:
        return jnp.zeros(1 << k, dtype=jnp.int8)
    return jnp.zeros((1 << (k - SHARD_WIDTH_BITS), 1 << SHARD_WIDTH_BITS),
                     dtype=jnp.int8)


def table_lookup(table, h):
    """Gather counts for uint32 hashes from a count table."""
    if table.ndim == 1:
        # k <= 30: every hash < 2^30 fits int32; 1-D flat gather
        return table[h.astype(jnp.int32)]
    hi = (h >> jnp.uint32(SHARD_WIDTH_BITS)).astype(jnp.int32)
    lo = (h & jnp.uint32((1 << SHARD_WIDTH_BITS) - 1)).astype(jnp.int32)
    return table[hi, lo]


def capped_batch_delta(idx: jnp.ndarray, valid: jnp.ndarray, cap: int):
    """Return (sorted_idx, delta int8) with per-index delta = min(count, cap).

    Invalid entries map to SENTINEL and are dropped at scatter time.
    """
    s, contrib = capped_batch_delta_multi(
        idx.reshape(1, -1), valid.reshape(-1), cap
    )
    return s[0], contrib[0]


def capped_batch_delta_multi(idx: jnp.ndarray, valid: jnp.ndarray, cap: int):
    """Batched variant: idx [C, N] (one row per hash function), valid [N].

    One vectorized sort over the row axis instead of C separate sorts — the
    XLA sort is the compile-time hog of the count step (~16 s per instance on
    this backend), so batching it cuts cold-start by ~2x.
    """
    C, N = idx.shape[0], idx.reshape(idx.shape[0], -1).shape[1]
    flat = jnp.where(valid.reshape(1, -1), idx.reshape(C, -1).astype(jnp.uint32),
                     SENTINEL)
    s = jnp.sort(flat, axis=1)
    pos = jnp.arange(N, dtype=jnp.int32)[None, :]
    is_start = jnp.concatenate(
        [jnp.ones((C, 1), bool), s[:, 1:] != s[:, :-1]], axis=1
    )
    run_start = jax.lax.cummax(jnp.where(is_start, pos, 0), axis=1)
    rank = pos - run_start
    contrib = ((rank < cap) & (s != SENTINEL)).astype(jnp.int8)
    return s, contrib


def scatter_delta(table, s, contrib):
    """Scatter sorted hashes + capped deltas into a count table.

    The flat (k <= 30) path is a 1-D scatter — the 2-D advanced-indexing
    form compiles to a far slower TPU scatter. Sentinels map to a positive
    out-of-bounds index: negative indices (sentinel cast to int32 = -1)
    drop correctly but hit a ~8x slower TPU scatter path (measured)."""
    if table.ndim == 1:
        n = table.shape[0]
        lo = jnp.where(s == SENTINEL, jnp.int32(n), s.astype(jnp.int32))
        return table.at[lo].add(contrib, mode="drop")
    n_shards = table.shape[0]
    hi = (s >> jnp.uint32(SHARD_WIDTH_BITS)).astype(jnp.int32)
    hi = jnp.where(s == SENTINEL, jnp.int32(n_shards), hi)  # OOB -> dropped
    lo = (s & jnp.uint32((1 << SHARD_WIDTH_BITS) - 1)).astype(jnp.int32)
    return table.at[hi, lo].add(contrib, mode="drop")


def count_batch(table, hashes, valid, cap: int = 3):
    """Scatter one batch of canonical hashes into the count table."""
    s, contrib = capped_batch_delta(hashes, valid, cap)
    table = scatter_delta(table, s, contrib)
    return jnp.minimum(table, jnp.int8(cap))


@partial(jax.jit, static_argnames=("k", "cap", "clip", "return_hashes"),
         donate_argnums=(0,))
def count_reads_step(tables, codes, lengths, accept, masks, k: int,
                     cap: int = 3, clip: bool = True,
                     return_hashes: bool = False):
    """One fused device step: hash a read batch and update all hash tables.

    Fully jitted (single dispatch per batch — essential when the device sits
    behind a network tunnel) and donating the tables so updates are in-place.

    clip=False defers the saturating sweep: per-batch deltas are <= cap, so
    int8 values stay bounded for ~(127/cap) batches and a periodic
    clip_tables() restores min(total, cap) exactly (deltas of k-mers below
    cap are uncapped, so the final clip loses nothing).

    return_hashes=True additionally returns (hashes [C, B, L] uint32,
    valid & in-window [B, L] bool, pre-accept) so the later split-read vote
    pass can reuse them device-resident instead of re-reading and re-hashing
    the FASTQs.
    """
    hashes, valid = encode.canonical_hashes(jnp, codes, masks, k)
    L = codes.shape[-1]
    j = jnp.arange(L, dtype=jnp.int32)
    inwin = j[None, :] <= (lengths[:, None] - k)
    vwin = valid & inwin
    valid = vwin & accept[:, None]
    C = hashes.shape[0]
    s_all, contrib_all = capped_batch_delta_multi(
        hashes.reshape(C, -1), valid, cap
    )
    new_tables = []
    for i, t in enumerate(tables):
        t = scatter_delta(t, s_all[i], contrib_all[i])
        if clip:
            t = jnp.minimum(t, jnp.int8(cap))
        new_tables.append(t)
    if return_hashes:
        return tuple(new_tables), hashes, vwin
    return tuple(new_tables)


@partial(jax.jit, static_argnames=("cap",), donate_argnums=(0,))
def clip_tables(tables, cap: int = 3):
    return tuple(jnp.minimum(t, jnp.int8(cap)) for t in tables)


def table_lookup_np(table_host, h):
    """Host-side lookup on np.asarray(table) ([shards, width])."""
    import numpy as np

    flat = table_host.reshape(-1)
    return flat[np.asarray(h, dtype=np.int64)]
