#!/usr/bin/env python3
"""Microbenchmark of the stage-C vote step pieces on the live chip.

Usage: python tools/micro_vote.py [n_peak_kmers]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lht_jax_cache")

import numpy as np


def t(fn, *a, n=3, **kw):
    import jax

    out = fn(*a, **kw)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    import jax
    import jax.numpy as jnp

    from functools import partial

    from localhgt_tpu.ops import encode, pallas_vote
    from localhgt_tpu.pipeline import peaks as pm

    k = 32
    B, L, kw_crop = 1 << 16, 192, 128
    n_kmers = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    rng = np.random.default_rng(0)
    codes1 = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    codes2 = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    len1 = jnp.asarray(np.full(B, 150, np.int32))
    accept = jnp.asarray(np.ones(B, bool))
    masks, _ = encode.hasher_for(k, 3, 1)
    masks_j = jnp.asarray(masks)

    # synthetic rank map of n_kmers stored hashes (big fixture: ~40M)
    hs = np.unique(rng.integers(1, 0xFFFFFFF0, size=int(n_kmers * 1.04),
                                dtype=np.uint64).astype(np.uint32))[:n_kmers]
    ps = rng.integers(1, 1_900_000, size=len(hs)).astype(np.int32)
    rm = pm.build_rankmap_host(hs, ps, k)
    wp = jnp.asarray(rm.wp)
    pids = jnp.asarray(rm.pids)
    pc = jnp.asarray(rng.integers(1, 101, size=1_900_001).astype(np.int32))
    pf = jnp.zeros(1_900_001, jnp.int32)

    @partial(jax.jit, static_argnames=("k", "kw"))
    def hash_batch(codes, lengths, masks, k, kw):
        h, v = encode.canonical_hashes(jnp, codes, masks, k)
        h = h[:, :, :kw]
        v = v[:, :kw]
        inwin = jnp.arange(kw, dtype=jnp.int32)[None, :] <= (lengths[:, None] - k)
        return h, v & inwin

    dt, (h, v) = t(hash_batch, codes1, len1, masks_j, k, kw_crop)
    print(f"hash [{B},{kw_crop}]x3: {dt*1e3:.0f} ms", flush=True)

    @jax.jit
    def lookup(h, v, wp, pids):
        return jnp.where(v[None, :, :] & (h != 0),
                         pm.rank_lookup(wp, pids, h), 0)

    dt, pk = t(lookup, h, v, wp, pids)
    print(f"rank_lookup [{3*B*kw_crop/1e6:.0f}M queries]: {dt*1e3:.0f} ms",
          flush=True)

    # variant: variable shifts instead of the 32-entry LUT gathers
    @jax.jit
    def lookup_shift(h, v, wp, pids):
        wi = (h >> jnp.uint32(5)).astype(jnp.int32)
        word = wp[2 * wi].astype(jnp.uint32)
        pref = wp[2 * wi + 1]
        bit = h & jnp.uint32(31)
        present = ((word >> bit) & jnp.uint32(1)) != 0
        below = jax.lax.population_count(
            word & ((jnp.uint32(1) << bit) - jnp.uint32(1)))
        rank = jnp.where(present, pref + below.astype(jnp.int32), 0)
        out = jnp.where(present,
                        pids[jnp.minimum(rank, pids.shape[0] - 1)], 0)
        return jnp.where(v[None, :, :] & (h != 0), out, 0)

    dt, _ = t(lookup_shift, h, v, wp, pids)
    print(f"rank_lookup_shift: {dt*1e3:.0f} ms", flush=True)

    @jax.jit
    def votekern(pk1, pk2):
        genome = pc[jnp.concatenate([pk1, pk2], axis=2)]
        pkc = jnp.concatenate([pk1, pk2], axis=2)
        return pallas_vote.vote_state(genome, pkc, n_slots=8)

    dt, st = t(votekern, pk, pk)
    print(f"pallas vote [3,{B},{2*kw_crop}]: {dt*1e3:.0f} ms", flush=True)

    dt, _ = t(lambda *a: pm._vote_tail(pf, *a, accept, 6), *st)
    print(f"vote_tail: {dt*1e3:.0f} ms", flush=True)

    # full step as production calls it
    dt, _ = t(pm.split_vote_batch, pf, codes1, len1, codes2, len1, accept,
              masks_j, jnp.zeros(0, jnp.uint32), jnp.zeros(0, jnp.int32), pc,
              k=k, min_base_num=6, use_map=False, rank_wp=wp, rank_pids=pids,
              use_rank=True, kw=kw_crop)
    print(f"split_vote_batch full: {dt*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
