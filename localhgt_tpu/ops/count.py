"""Saturating k-mer count tables as device arrays.

The reference keeps one `char[2^k]` per run (4 GB at k=32) updated by racy
unsynchronized threads with a saturation cap of 3
(src/extract_ref_normal_peak.cpp:23,1082-1085). The TPU formulation is a
deterministic scatter-add:

  * per batch, each index's contribution is capped at `cap` by ranking
    duplicates within the sorted batch (so int8 can never overflow), then
  * a single `at[].add` scatter plus a clip reproduces exactly
    final_count = min(total_occurrences, cap) — the single-threaded reference
    semantics (SURVEY.md section 5 "race detection": the rebuild replaces the
    benign data race with deterministic merges).

Multi-chip: per-shard tables merge with a saturating collective
(min(psum(local), cap)) — see localhgt_tpu.parallel.mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from localhgt_tpu.ops import encode


def capped_batch_delta(idx: jnp.ndarray, valid: jnp.ndarray, cap: int, table_size: int):
    """Return (sorted_idx, delta int8) with per-index delta = min(count, cap).

    Invalid entries are routed to index `table_size` (one past the end) and
    dropped by the scatter's OOB mode.
    """
    flat_idx = jnp.where(valid.reshape(-1), idx.reshape(-1).astype(jnp.uint32),
                         jnp.uint32(table_size))
    s = jnp.sort(flat_idx)
    n = s.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    # index of the first element of each run, via running max
    run_start = jax.lax.cummax(jnp.where(is_start, pos, 0))
    rank = pos - run_start
    contrib = ((rank < cap) & (s != jnp.uint32(table_size))).astype(jnp.int8)
    return s, contrib


@partial(jax.jit, static_argnums=3)
def _update(table, sorted_idx, contrib, cap):
    table = table.at[sorted_idx].add(contrib, mode="drop")
    return jnp.minimum(table, jnp.int8(cap))


def make_table(k: int) -> jnp.ndarray:
    return jnp.zeros(1 << k, dtype=jnp.int8)


def count_batch(table, hashes, valid, cap: int = 3):
    """Scatter one batch of canonical hashes into the count table.

    Args:
        table: int8 [2^k] device array (single hash function's table).
        hashes: uint32 [...] canonical k-mer indices.
        valid: bool [...] same shape; invalid entries ignored.
    """
    s, contrib = capped_batch_delta(hashes, valid, cap, table.shape[0])
    return _update(table, s, contrib, cap)


@partial(jax.jit, static_argnames=("k", "cap"), donate_argnums=(0,))
def count_reads_step(tables, codes, lengths, accept, masks, k: int, cap: int = 3):
    """One fused device step: hash a read batch and update all hash tables.

    Fully jitted (single dispatch per batch — essential when the device sits
    behind a network tunnel) and donating the tables so updates are in-place.

    Args:
        tables: tuple of int8 [2^k] tables, one per hash function.
        codes: uint8 [B, L] base codes, padded with N (=4).
        lengths: int32 [B] true read lengths.
        accept: bool [B] down-sampling acceptance per read
            (reference get_random/read_fastq:1037-1044).
        masks: uint32 [coder_num, 3] hash masks.
    """
    hashes, valid = encode.canonical_hashes(jnp, codes, masks, k)
    L = codes.shape[-1]
    j = jnp.arange(L, dtype=jnp.int32)
    inwin = j[None, :] <= (lengths[:, None] - k)
    valid = valid & inwin & accept[:, None]
    new_tables = []
    for i, t in enumerate(tables):
        s, contrib = capped_batch_delta(hashes[i], valid, cap, t.shape[0])
        t = t.at[s].add(contrib, mode="drop")
        new_tables.append(jnp.minimum(t, jnp.int8(cap)))
    return tuple(new_tables)
