#!/usr/bin/env python3
"""Micro-profile of the count-stage device step and the SW kernels on the
real chip: times the hash, sort(+cap) and scatter parts of one count batch
separately, and the lax.scan vs Pallas SW formulations, so optimization
effort lands on the measured bottleneck (VERDICT r3 asks #3/#4).

Usage: python tools/profile_stages.py [count|sw|vote]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lht_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3, **kw):
    fn(*args, **kw)  # compile
    jax.block_until_ready(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def profile_count():
    from functools import partial

    from localhgt_tpu.ops import count, encode

    k = 32
    B, L, C = 1 << 16, 192, 3
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, (B, L)).astype(np.uint8)
    lengths = np.full(B, 150, np.int32)
    accept = np.ones(B, bool)
    masks, _ = encode.hasher_for(k, C, 1)
    masks_j = jnp.asarray(masks)
    tables = tuple(count.make_table(k) for _ in range(C))
    cj, lj, aj = jnp.asarray(codes), jnp.asarray(lengths), jnp.asarray(accept)

    @partial(jax.jit, static_argnames=("k",))
    def just_hash(codes, masks, k):
        h, v = encode.canonical_hashes(jnp, codes, masks, k)
        return h.sum(), v.sum()

    @partial(jax.jit, static_argnames=("k", "cap"))
    def hash_sort(codes, lengths, accept, masks, k, cap):
        hashes, valid = encode.canonical_hashes(jnp, codes, masks, k)
        L = codes.shape[-1]
        j = jnp.arange(L, dtype=jnp.int32)
        vwin = valid & (j[None, :] <= (lengths[:, None] - k))
        valid = vwin & accept[:, None]
        s, contrib = count.capped_batch_delta_multi(
            hashes.reshape(hashes.shape[0], -1), valid, cap)
        return s.sum(), contrib.sum()

    @partial(jax.jit, static_argnames=("k", "cap"), donate_argnums=(0,))
    def full(tables, codes, lengths, accept, masks, k, cap):
        return count.count_reads_step(tables, codes, lengths, accept, masks,
                                      k, cap, clip=False)

    t_h = timed(just_hash, cj, masks_j, k=k)
    t_hs = timed(hash_sort, cj, lj, aj, masks_j, k=k, cap=3)
    # full step donates tables; re-make per reps via closure trick
    full(tables, cj, lj, aj, masks_j, k=k, cap=3)  # compile

    def run_full():
        t = tuple(count.make_table(k) for _ in range(C))
        jax.block_until_ready(t)
        t0 = time.perf_counter()
        out = full(t, cj, lj, aj, masks_j, k=k, cap=3)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    run_full()
    t_full = min(run_full() for _ in range(3))
    n_kmers = B * (150 - k + 1) * C
    print(f"count batch: B={B} L={L} C={C} kmers={n_kmers/1e6:.1f}M")
    print(f"  hash only        : {t_h*1e3:8.1f} ms")
    print(f"  hash+sort+cap    : {t_hs*1e3:8.1f} ms  (sort ~= {(t_hs-t_h)*1e3:.1f} ms)")
    print(f"  full (w/ scatter): {t_full*1e3:8.1f} ms  (scatter ~= {(t_full-t_hs)*1e3:.1f} ms)")
    print(f"  kmers/s full     : {n_kmers/t_full/1e9:.2f} G")


def profile_sw():
    from localhgt_tpu.ops import pallas_sw

    rng = np.random.default_rng(0)
    # production shapes: align extension (192-bp reads, W=L+2*pad=256) and
    # an accbkp window-scan shape. The lax.scan baseline is omitted — its
    # compile alone runs many minutes at these shapes (the reason it was
    # replaced); the recorded r3 number is 0.07 GCUPS end-to-end.
    for B, M, N in ((8192, 192, 256), (8192, 160, 160)):
        q = rng.integers(0, 4, (B, M)).astype(np.uint8)
        r = rng.integers(0, 4, (B, N)).astype(np.uint8)
        qj, rj = jnp.asarray(q), jnp.asarray(r)
        cells = B * M * N

        t_pal = timed(pallas_sw.sw_align_pallas, qj, rj)
        t_pal_sc = timed(pallas_sw.sw_score_pallas, qj, rj)
        print(f"SW B={B} M={M} N={N}: cells={cells/1e6:.0f}M")
        print(f"  pallas align   : {t_pal*1e3:8.1f} ms  {cells/t_pal/1e9:6.2f} GCUPS")
        print(f"  pallas score   : {t_pal_sc*1e3:8.1f} ms  {cells/t_pal_sc/1e9:6.2f} GCUPS")


def profile_vote():
    """Vote-pass lookup cost: rank-map candidates vs pallas greedy."""
    from localhgt_tpu.ops import encode, pallas_vote
    from localhgt_tpu.pipeline import peaks as pm

    k = 32
    B, L, C = 1 << 15, 192, 3
    rng = np.random.default_rng(0)
    h = rng.integers(0, 1 << 32, (C, B, L), dtype=np.uint64).astype(np.uint32)
    v = np.ones((B, L), bool)
    # ~3M stored keys
    keys = rng.integers(0, 1 << 32, 3_000_000, dtype=np.uint64).astype(np.uint32)
    pids = rng.integers(1, 1 << 20, 3_000_000).astype(np.int32)
    rmap = pm.build_rankmap_host(keys, pids, k)
    wp, pd = jnp.asarray(rmap.wp), jnp.asarray(rmap.pids)
    hj, vj = jnp.asarray(h), jnp.asarray(v)

    @jax.jit
    def lookup(h, v, wp, pd):
        return pm._candidates_from_h(h, v, jnp.zeros(0, jnp.uint32),
                                     jnp.zeros(0, jnp.int32), False,
                                     wp, pd, True)

    t_lk = timed(lookup, hj, vj, wp, pd)
    pk = np.asarray(lookup(hj, vj, wp, pd))
    genome = (pk % 97).astype(np.int32)
    pk2 = jnp.concatenate([jnp.asarray(pk), jnp.asarray(pk)], axis=2)
    gn2 = jnp.concatenate([jnp.asarray(genome), jnp.asarray(genome)], axis=2)
    t_vote = timed(lambda g, p: pallas_vote.vote_state(g, p)[0], gn2, pk2)
    nq = C * B * L
    print(f"vote: B={B} L={L} C={C} queries={nq/1e6:.1f}M stored=3.0M")
    print(f"  rank lookup : {t_lk*1e3:8.1f} ms  {nq/t_lk/1e6:6.0f} Mq/s")
    print(f"  pallas vote : {t_vote*1e3:8.1f} ms (2x positions)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("platform:", jax.devices()[0].platform)
    if which in ("count", "all"):
        profile_count()
    if which in ("sw", "all"):
        profile_sw()
    if which in ("vote", "all"):
        profile_vote()
