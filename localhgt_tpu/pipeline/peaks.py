"""Candidate-peak bookkeeping and the k-mer split-read vote.

Port of the Peaks/Split_reads machinery
(src/extract_ref_normal_peak.cpp:91-548): peaks found by the reference scan
get ids; the k-mers at each peak position (with table count > 0) map
hash -> peak id; a second pass over the read pairs votes, per pair, on which
genomes its peak k-mers support; a pair whose top-2 supported genomes both
have >= MIN_BASE_NUM voting bases bumps those genomes' first-seen peaks
(check_split, cpp:161-202). Peaks with >= MIN_READS votes become the final
extraction intervals.

The reference's 2^32-entry peak_kmer array (16 GB) is replaced by either
  * a **direct-address device map** int32[2^k] when it fits HBM (k <= 30:
    4 GB next to the 3 x 1 GB count tables on a 16 GB v5e) — one HBM gather
    per query, or
  * a sorted (hash, peak) table + binary search (k = 32 fallback) — the
    searchsorted costs log2(K) dependent gathers per query, which profiling
    shows dominates the whole vote pass, hence the direct map default.
Both are built **on device** in one dispatch per <=2^31-bp reference chunk:
hash every reference position (bit-sliced, same kernel as the scan), gather
the member positions, filter by count-table hits, and dedupe duplicate
hashes with a stable device sort keeping the last writer (the reference
overwrites peak_kmer[hash] in scan order, add_peak cpp:239-286).
The sequential per-pair greedy genome selection (judge_base, cpp:118-159) runs
as a lax.scan over read positions with a fixed G-slot genome register,
vectorized over the pair batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import numpy as np

from localhgt_tpu.ops import encode


@dataclass
class PeakSet:
    """Peak ids are 1-based; index 0 of every array is a sentinel."""

    contig: np.ndarray       # int32 [P+1] contig id of each peak
    pos: np.ndarray          # int64 [P+1] representative position
    sorted_hash: np.ndarray  # uint32 [K] peak k-mer hashes (sorted)
    sorted_peak: np.ndarray  # int32 [K] peak id per hash
    direct_map: object = None  # device int32 [2^k] hash -> peak id, or None
    # two-choice bucket hash table, FUSED rows int32 [Bk, 2S] (cols 0..S-1 =
    # keys bitcast, S..2S-1 = peak ids) for k > 30 where the 2^k direct map
    # exceeds HBM: one 32-byte row gather per choice returns keys AND values
    # (2 gathers/query total vs log2(K) dependent binary-search probes)
    bucket: np.ndarray | None = None

    @property
    def n(self) -> int:
        return len(self.contig) - 1


def build_peakset(per_contig, contig_codes_fn, count_lookup, masks, k) -> PeakSet:
    """Collect peaks + their k-mers.

    Args:
        per_contig: list of (contig_id, positions, members, group_ids) from
            scan.peaks_in_intervals, in contig order.
        contig_codes_fn: contig_id -> uint8 code array.
        count_lookup: (hash_fn_index, uint32 hashes) -> counts; typically a
            device gather so the multi-GB tables never leave HBM.
        masks: hash masks.

    The hash->peak map keeps the *last* writer for duplicate hashes, matching
    the reference's overwrite of peak_kmer[hash] in scan order (add_peak,
    cpp:239-286).
    """
    contigs = [0]
    positions = [0]
    all_hashes = []
    all_peaks = []
    pid_base = 0
    coder_num = masks.shape[0]
    for cid, pos, memb, gid in per_contig:
        if not len(pos):
            continue
        codes = contig_codes_fn(cid)
        contigs.extend([cid] * len(pos))
        positions.extend(int(p) for p in pos)
        # k-mers only exist for positions <= len-k (add_peak bounds check,
        # cpp:247,262: near_pos <= ref_len-k+1)
        sel = memb <= len(codes) - k
        mem = memb[sel]
        pids = gid[sel].astype(np.int32) + np.int32(pid_base + 1)
        pid_base += len(pos)
        if len(mem) == 0:
            continue
        win = codes[mem[:, None] + np.arange(k)[None, :]]
        h, v = encode.canonical_hashes(np, win, masks, k)  # [C, n, k] pos 0
        for i in range(coder_num):
            hv = h[i, :, 0]
            ok = v[:, 0] & (hv != 0)
            cnt = np.asarray(count_lookup(i, hv[ok]))
            keep = cnt > 0
            all_hashes.append(hv[ok][keep].astype(np.uint32))
            all_peaks.append(pids[ok][keep])
    if all_hashes:
        hs = np.concatenate(all_hashes)
        ps = np.concatenate(all_peaks)
        # keep last writer per hash (stable sort by hash; last index wins)
        order = np.argsort(hs, kind="stable")
        hs, ps = hs[order], ps[order]
        last = np.ones(len(hs), bool)
        last[:-1] = hs[1:] != hs[:-1]
        hs, ps = hs[last], ps[last]
    else:
        hs = np.zeros(0, np.uint32)
        ps = np.zeros(0, np.int32)
    return PeakSet(
        contig=np.asarray(contigs, np.int32),
        pos=np.asarray(positions, np.int64),
        sorted_hash=hs,
        sorted_peak=ps,
        bucket=(fuse_bucket(*build_bucket_table(hs, ps)[:2])
                if len(hs) else None),
    )


MAX_DIRECT_MAP_BYTES = 4 << 30  # int32 [2^k] fits beside the count tables

# --- two-choice bucketized hash table (the k > 30 vote-lookup path) ---
BUCKET_SLOTS = 4                # 4 x uint32 keys = one 16-byte row; smaller
#                                 rows halve the widened gather temporaries
#                                 (measured faster than 8-slot rows)
_MIX_SEEDS = (0x9E3779B1, 0x85EBCA6B)   # per-choice xor seeds


def _mix_np(h: np.ndarray, seed: int, lg: int) -> np.ndarray:
    """murmur3 fmix32 of (h ^ seed), truncated to lg bits.

    Canonical hashes are min(fwd, rc) — biased low — so a single-multiply
    Fibonacci mix clumps them and two-choice placement kept overflowing;
    the full finalizer avalanches every input bit."""
    x = h.astype(np.uint32) ^ np.uint32(seed)
    x ^= x >> np.uint32(16)
    x = (x.astype(np.uint64) * np.uint64(0x85EBCA6B)).astype(np.uint32)
    x ^= x >> np.uint32(13)
    x = (x.astype(np.uint64) * np.uint64(0xC2B2AE35)).astype(np.uint32)
    x ^= x >> np.uint32(16)
    return (x & np.uint32((1 << lg) - 1)).astype(np.int64)


def _mix_jnp(h, seed: int, lg: int):
    """jnp mirror of _mix_np (uint32 wrap-around multiply is native)."""
    import jax.numpy as jnp

    x = h ^ jnp.uint32(seed)
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> jnp.uint32(16))
    return (x & jnp.uint32((1 << lg) - 1)).astype(jnp.int32)


def fuse_bucket(keys: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Interleave (keys, vals) into one int32 [Bk, 2S] row array so a
    single row gather returns both."""
    return np.concatenate(
        [keys.view(np.int32), vals.astype(np.int32)], axis=1)


def build_bucket_table(hs: np.ndarray, ps: np.ndarray,
                       slots: int = BUCKET_SLOTS):
    """Host build of the two-choice bucket table for K (hash, peak) pairs.

    Each key lives in bucket mix1(h) or mix2(h); the vectorized greedy
    places all but a Poisson tail, which sequential cuckoo evictions finish
    (lookups stay exactly two bucket probes); the table doubles + retries
    only on pathological failure. Returns (keys uint32 [Bk, slots],
    vals int32 [Bk, slots], lg_bk) — callers pass fuse_bucket(keys, vals)
    to the lookup. Empty slots hold 0xFFFFFFFF, which no valid canonical
    hash query reaches (it is the invalid-kmer sentinel)."""
    K = len(hs)
    # load factor 0.5: two-choice greedy placement (no evictions) with the
    # avalanche mix succeeds on the first attempt w.h.p.
    lg = max(6, int(np.ceil(np.log2(max(K, 1) * 2 / slots + 1))))
    hs = hs.astype(np.uint32)
    ps = ps.astype(np.int32)
    while True:
        Bk = 1 << lg
        keys = np.full((Bk, slots), 0xFFFFFFFF, np.uint32)
        vals = np.zeros((Bk, slots), np.int32)
        fill = np.zeros(Bk, np.int64)
        remaining = np.arange(K, dtype=np.int64)
        for const in _MIX_SEEDS:
            if len(remaining) == 0:
                break
            b = _mix_np(hs[remaining], const, lg)
            order = np.argsort(b, kind="stable")
            bs = b[order]
            pos_in = np.arange(len(bs), dtype=np.int64)
            run_start = np.maximum.accumulate(
                np.where(np.r_[True, bs[1:] != bs[:-1]], pos_in, 0))
            rank = pos_in - run_start + fill[bs]
            place = rank < slots
            rows, cols = bs[place], rank[place]
            src = remaining[order[place]]
            keys[rows, cols] = hs[src]
            vals[rows, cols] = ps[src]
            fill += np.bincount(rows, minlength=Bk)
            remaining = remaining[order[~place]]
        # the vectorized greedy always leaves a small tail whose both
        # buckets are full (Poisson: ~1e-4 of keys at load 0.5); place it
        # with sequential random-walk cuckoo evictions, which keeps lookups
        # at exactly two bucket probes
        if len(remaining) and _cuckoo_tail(keys, vals, hs, ps, remaining,
                                           lg, slots):
            return keys, vals, lg
        if len(remaining) == 0:
            return keys, vals, lg
        lg += 1  # pathological overflow: double and rebuild


def _cuckoo_tail(keys, vals, hs, ps, remaining, lg: int, slots: int,
                 max_steps: int = 500) -> bool:
    rng = np.random.default_rng(0xC0FFEE)
    for ridx in remaining:
        cur_h, cur_p = int(hs[ridx]), int(ps[ridx])
        placed = False
        for step in range(max_steps):
            for const in _MIX_SEEDS:
                b = int(_mix_np(np.array([cur_h], np.uint32), const, lg)[0])
                empty = np.flatnonzero(keys[b] == 0xFFFFFFFF)
                if len(empty):
                    keys[b, empty[0]] = cur_h
                    vals[b, empty[0]] = cur_p
                    placed = True
                    break
            if placed:
                break
            # both buckets full: evict a random occupant and walk on
            const = _MIX_SEEDS[step % 2]
            b = int(_mix_np(np.array([cur_h], np.uint32), const, lg)[0])
            s = int(rng.integers(0, slots))
            ev_h, ev_p = int(keys[b, s]), int(vals[b, s])
            keys[b, s] = np.uint32(cur_h)
            vals[b, s] = np.int32(cur_p)
            cur_h, cur_p = ev_h, ev_p
        if not placed:
            return False
    return True


BUCKET_LOAD = 0.45  # target load: 2-round greedy leaves only a tiny tail


@partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4),
         static_argnames=("seed", "lg", "slots"))
def _bucket_greedy_round(keys_f, vals_f, fill, h, p, seed: int, lg: int,
                         slots: int):
    """One vectorized placement round: keys sort by bucket, rank within the
    run (offset by current fill), rank < slots places into the flat table.
    Unplaced keys survive for the next round (other seed) — the device form
    of the host build's greedy pass."""
    import jax.numpy as jnp

    SEN = jnp.uint32(0xFFFFFFFF)
    Bk = jnp.int32(1 << lg)
    alive = h != SEN
    b = jnp.where(alive, _mix_jnp(h, seed, lg), Bk)
    bs, hs_s, ps_s = jax.lax.sort((b, h, p), num_keys=1, is_stable=True)
    n = bs.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones(1, bool), bs[1:] != bs[:-1]])
    run_start = jax.lax.cummax(jnp.where(is_start, pos, 0))
    rank = pos - run_start + fill[jnp.minimum(bs, Bk)]
    place = (rank < slots) & (bs < Bk)
    oob = jnp.int32(keys_f.shape[0])
    flat = jnp.where(place, bs * slots + rank, oob)
    keys_f = keys_f.at[flat].set(hs_s, mode="drop")
    vals_f = vals_f.at[flat].set(ps_s, mode="drop")
    fill = fill.at[jnp.where(place, bs, Bk)].add(1, mode="drop")
    h_new = jnp.where(place, SEN, hs_s)
    p_new = jnp.where(place, 0, ps_s)
    return keys_f, vals_f, fill, h_new, p_new


@partial(jax.jit, donate_argnums=(0, 1),
         static_argnames=("lg", "slots"))
def _bucket_evict_round(keys_f, vals_f, th, tp, seed, salt,
                        lg: int, slots: int):
    """One vectorized cuckoo round for the tail: per live key, probe the
    seed's bucket; place into an empty slot if any, else evict a
    hash-derived slot's occupant (which joins the tail). One winner per
    bucket per round (first after sort); the rest defer."""
    import jax.numpy as jnp

    SEN = jnp.uint32(0xFFFFFFFF)
    Bk = jnp.int32(1 << lg)
    alive = th != SEN
    b = jnp.where(alive, _mix_jnp(th, seed, lg), Bk)
    bs, hs_s, ps_s = jax.lax.sort((b, th, tp), num_keys=1, is_stable=True)
    first = jnp.concatenate([jnp.ones(1, bool), bs[1:] != bs[:-1]])
    win = first & (bs < Bk)
    base = jnp.minimum(bs, Bk - 1) * slots
    rowk = keys_f[base[:, None] + jnp.arange(slots)[None, :]]  # [T, slots]
    empty = rowk == SEN
    has_empty = jnp.any(empty, axis=1)
    eslot = jnp.argmax(empty, axis=1).astype(jnp.int32)
    rslot = (_mix_jnp(hs_s, salt, 30) & jnp.int32(slots - 1))
    slot = jnp.where(has_empty, eslot, rslot)
    oob = jnp.int32(keys_f.shape[0])
    flat = jnp.where(win, base + slot, oob)
    ev_k = jnp.where(win & ~has_empty,
                     keys_f.at[jnp.minimum(flat, oob - 1)].get(), SEN)
    ev_v = jnp.where(win & ~has_empty,
                     vals_f.at[jnp.minimum(flat, oob - 1)].get(), 0)
    keys_f = keys_f.at[flat].set(hs_s, mode="drop")
    vals_f = vals_f.at[flat].set(ps_s, mode="drop")
    th_new = jnp.where(win, ev_k, hs_s)
    tp_new = jnp.where(win, ev_v, ps_s)
    return keys_f, vals_f, th_new, tp_new


@partial(jax.jit, donate_argnums=(0, 1), static_argnames=("slots",))
def _fuse_bucket_dev(keys_f, vals_f, slots: int):
    import jax.numpy as jnp

    Bk = keys_f.shape[0] // slots
    keys = jax.lax.bitcast_convert_type(keys_f.reshape(Bk, slots), jnp.int32)
    return jnp.concatenate([keys, vals_f.reshape(Bk, slots)], axis=1)


@partial(jax.jit, donate_argnums=(0, 1))
def _dedupe_chunk(h, p):
    """Sort one stream chunk by key (stable, so stream order survives within
    equal-key runs) and sentinel-mask every non-last duplicate. The last
    writer carries the largest peak id (pids are assigned position-major),
    which is exactly what the max-probing lookup needs — so dropping the
    earlier duplicates changes nothing semantically and saves slots."""
    import jax.numpy as jnp

    SEN = jnp.uint32(0xFFFFFFFF)
    hs, ps = jax.lax.sort((h, p), num_keys=1, is_stable=True)
    last = jnp.concatenate([hs[1:] != hs[:-1], jnp.ones(1, bool)])
    return jnp.where(last, hs, SEN), jnp.where(last, ps, 0)


@partial(jax.jit, donate_argnums=(0, 1))
def _compact_tail(h, p):
    """Sort live keys to the front (sentinels sort last as 0xFFFFFFFF)."""
    import jax.numpy as jnp

    return jax.lax.sort((h, p), num_keys=1, is_stable=True)


def build_bucket_device(keys_dev, vals_dev, n_live: int,
                        slots: int = BUCKET_SLOTS):
    """Two-choice bucket table built ON DEVICE from a device-resident
    (hash, pid) pair stream (sentinel rows allowed): two greedy placement
    rounds (one per seed), then vectorized cuckoo rounds on the compacted
    tail. Returns the fused [Bk, 2*slots] int32 device table (the same
    layout `fuse_bucket` produces on host).

    The member stream at UHGG scale is hundreds of MB — building on device
    avoids shipping it over the host link twice (out for the build, back
    for the table)."""
    import jax.numpy as jnp

    lg = max(6, int(np.ceil(np.log2(max(n_live, 1) / slots / BUCKET_LOAD))))
    while True:
        nflat = (1 << lg) * slots
        keys_f = jnp.full(nflat, 0xFFFFFFFF, jnp.uint32)
        vals_f = jnp.zeros(nflat, jnp.int32)
        fill = jnp.zeros((1 << lg) + 1, jnp.int32)
        h, p = keys_dev, vals_dev
        for seed in _MIX_SEEDS:
            keys_f, vals_f, fill, h, p = _bucket_greedy_round(
                keys_f, vals_f, fill, h, p, seed=seed, lg=lg, slots=slots)
        remaining = int(jnp.sum(h != jnp.uint32(0xFFFFFFFF)))
        if remaining:
            # compact the tail into a small fixed buffer, then cuckoo
            h, p = _compact_tail(h, p)
            cap = max(1024, 1 << (remaining - 1).bit_length())
            th, tp = h[: min(cap, h.shape[0])], p[: min(cap, p.shape[0])]
            ok = False
            for rnd in range(200):
                th, tp = _compact_tail(th, tp)
                left = int(jnp.sum(th != jnp.uint32(0xFFFFFFFF)))
                if left == 0:
                    ok = True
                    break
                keys_f, vals_f, th, tp = _bucket_evict_round(
                    keys_f, vals_f, th, tp,
                    jnp.uint32(_MIX_SEEDS[rnd % 2]),
                    jnp.uint32(0xABCD01 + rnd), lg=lg, slots=slots)
            if not ok:
                lg += 1  # pathological overflow: double and rebuild
                continue
        return _fuse_bucket_dev(keys_f, vals_f, slots)


def _flatten_members(per_contig, contigs, k):
    """Host: peak table (contig, pos) + flat member positions (global
    coordinates in the concatenated code array) with their peak ids.

    Vectorized over the (pos, mem, gid) arrays that scan.peaks_in_intervals
    emits — a UHGG-scale sample has millions of peaks / tens of millions of
    members, so no per-peak Python loops."""
    pcontig = [np.zeros(1, np.int32)]
    ppos = [np.zeros(1, np.int64)]
    gpos_all = []
    pid_all = []
    pid_base = 0
    for cid, pos, mem, gid in per_contig:
        ln = contigs.length_of(cid)
        off = int(contigs.offsets[cid - 1])
        pcontig.append(np.full(len(pos), cid, np.int32))
        ppos.append(np.asarray(pos, np.int64))
        # k-mers only exist for positions <= len-k (add_peak bounds check,
        # cpp:247,262)
        sel = mem <= ln - k
        gpos_all.append(mem[sel] + off)
        pid_all.append(gid[sel].astype(np.int32) + np.int32(pid_base + 1))
        pid_base += len(pos)
    gpos = np.concatenate(gpos_all) if gpos_all else np.zeros(0, np.int64)
    pids = np.concatenate(pid_all) if pid_all else np.zeros(0, np.int32)
    return (np.concatenate(pcontig), np.concatenate(ppos), gpos, pids)


@partial(jax.jit, static_argnames=("k",), donate_argnums=(0,))
def _build_map_chunk(direct_map, tables, codes_flat, gpos, pids, masks,
                     k: int):
    """One device dispatch: hash every reference position of this chunk,
    gather the peak-member hashes, keep those present in the count tables
    (count > 0, build_kmer_table cpp:246-270), dedupe duplicate hashes
    keeping the last writer, scatter into the direct map.

    Padding rows carry pid 0 and are masked out; valid pids are >= 1."""
    import jax.numpy as jnp

    from localhgt_tpu.ops import count as count_mod

    h, v = encode.canonical_hashes(jnp, codes_flat[None, :], masks, k)
    h = h[:, 0, :]                    # [C, Lc]
    v = v[0, :]                       # [Lc]
    hm = h[:, gpos]                   # [C, n]
    ok = v[gpos][None, :] & (hm != 0) & (pids != 0)[None, :]
    for i, t in enumerate(tables):
        cnt = count_mod.table_lookup(t, hm[i])
        ok = ok.at[i].set(ok[i] & (cnt > 0))
    C, n = hm.shape
    SEN = jnp.uint32(0xFFFFFFFF)
    # position-major / coder-inner flatten = the reference's peak_kmer
    # overwrite order (add_peak cpp:239-286); keeps dedupe winners identical
    # across build_direct_map / build_hash_peakset / the sharded build
    keys = jnp.where(ok, hm, SEN).T.reshape(-1)
    vals = jnp.broadcast_to(pids[:, None], (n, C)).reshape(-1)
    keys, vals = jax.lax.sort((keys, vals), num_keys=1, is_stable=True)
    run_last = jnp.concatenate(
        [keys[1:] != keys[:-1], jnp.ones(1, bool)]
    ) & (keys != SEN)
    # valid hashes < 2^k <= 2^30 fit int32; masked rows go to a positive
    # out-of-bounds slot (negative indices hit a slow TPU scatter path)
    idx = jnp.where(run_last, keys.astype(jnp.int32), jnp.int32(1 << k))
    return direct_map.at[idx].set(vals, mode="drop")


MAP_BUILD_CHUNK = 1 << 22  # positions hashed per dispatch ([C, chunk] int32)


def build_direct_map(per_contig, contigs, tables, masks, k: int):
    """Device build of the hash -> peak-id map; returns a PeakSet whose
    `direct_map` is a device int32[2^k]. Reference chunks without any peak
    members are skipped, so the dispatch count tracks the peak intervals,
    not the reference length."""
    import jax.numpy as jnp

    pcontig, ppos, gpos, pids = _flatten_members(per_contig, contigs, k)
    direct_map = jnp.zeros(1 << k, jnp.int32)
    total = len(contigs.codes)
    masks_j = jnp.asarray(masks)
    for base in range(0, max(total, 1), MAP_BUILD_CHUNK):
        m = (gpos >= base) & (gpos < base + MAP_BUILD_CHUNK)
        if not m.any():
            continue
        gp = (gpos[m] - base).astype(np.int32)
        pd = pids[m]
        ncap = max(256, 1 << (len(gp) - 1).bit_length())
        gp_p = np.zeros(ncap, np.int32)
        gp_p[: len(gp)] = gp
        pd_p = np.zeros(ncap, np.int32)
        pd_p[: len(gp)] = pd
        codes_chunk = np.full(MAP_BUILD_CHUNK + k, 4, np.uint8)
        avail = contigs.codes[base : base + MAP_BUILD_CHUNK + k]
        codes_chunk[: len(avail)] = avail
        direct_map = _build_map_chunk(
            direct_map, tables, jnp.asarray(codes_chunk),
            jnp.asarray(gp_p), jnp.asarray(pd_p), masks_j, k=k,
        )
    return PeakSet(
        contig=pcontig, pos=ppos,
        sorted_hash=np.zeros(0, np.uint32), sorted_peak=np.zeros(0, np.int32),
        direct_map=direct_map,
    )


@partial(jax.jit, static_argnames=("k",))
def _hash_ref_chunk(codes_flat, masks, k: int):
    """Hash one reference chunk (bit-sliced, same kernel as the scan);
    returns (h uint32 [C, Lc], v bool [Lc]) device-resident for member
    gathering."""
    import jax.numpy as jnp

    h, v = encode.canonical_hashes(jnp, codes_flat[None, :], masks, k)
    return h[:, 0, :], v[0, :]


@jax.jit
def _member_batch(h, v, tables, gpos, pids):
    """Gather one fixed-size member sub-batch from a hashed chunk, filter by
    count-table presence (build_kmer_table cpp:246-270); returns (keys,
    vals) [n*C] with dropped rows as the SENTINEL key, flattened
    position-major / coder-inner — the reference's peak_kmer overwrite
    order (add_peak cpp:239-286). Fixed shape: one compile for the whole
    build regardless of per-chunk member counts."""
    import jax.numpy as jnp

    from localhgt_tpu.ops import count as count_mod

    hm = h[:, gpos]                   # [C, n]
    ok = v[gpos][None, :] & (hm != 0) & (pids != 0)[None, :]
    for i, t in enumerate(tables):
        cnt = count_mod.table_lookup(t, hm[i])
        ok = ok.at[i].set(ok[i] & (cnt > 0))
    SEN = jnp.uint32(0xFFFFFFFF)
    keys = jnp.where(ok, hm, SEN).T.reshape(-1)           # [n*C]
    vals = jnp.broadcast_to(pids[:, None], hm.T.shape).reshape(-1)
    vals = jnp.where(keys == SEN, 0, vals)
    return keys, vals


MEMBER_SUB = 1 << 20  # member positions gathered per fixed-shape dispatch


def _collect_member_pairs(per_contig, contigs, tables, masks, k: int):
    """Device-resident (hash, peak-id) pair stream for all peak members:
    hash each reference chunk once, gather members in fixed-shape
    sub-batches. Returns (keys_dev uint32 [T], vals_dev int32 [T], n_live)
    with SENTINEL rows interleaved (pair order = position-major).

    No global dedupe: duplicate hashes keep every (hash, pid) entry, and
    lookups take the MAX pid among matches — identical to the reference's
    last-writer overwrite (add_peak cpp:239-286) because pids are assigned
    in position-major order, so the last writer is exactly the largest pid."""
    import jax.numpy as jnp

    pcontig, ppos, gpos, pids = _flatten_members(per_contig, contigs, k)
    total = len(contigs.codes)
    masks_j = jnp.asarray(masks)
    keys_parts, vals_parts = [], []
    # gpos ascending (contigs in order, members ascending): slice by range
    for base in range(0, max(total, 1), MAP_BUILD_CHUNK):
        lo = int(np.searchsorted(gpos, base))
        hi = int(np.searchsorted(gpos, base + MAP_BUILD_CHUNK))
        if hi == lo:
            continue
        codes_chunk = np.full(MAP_BUILD_CHUNK + k, 4, np.uint8)
        avail = contigs.codes[base : base + MAP_BUILD_CHUNK + k]
        codes_chunk[: len(avail)] = avail
        h, v = _hash_ref_chunk(jnp.asarray(codes_chunk), masks_j, k=k)
        for s in range(lo, hi, MEMBER_SUB):
            e = min(hi, s + MEMBER_SUB)
            gp_p = np.zeros(MEMBER_SUB, np.int32)
            gp_p[: e - s] = gpos[s:e] - base
            pd_p = np.zeros(MEMBER_SUB, np.int32)
            pd_p[: e - s] = pids[s:e]
            kk, vv = _member_batch(h, v, tables, jnp.asarray(gp_p),
                                   jnp.asarray(pd_p))
            keys_parts.append(kk)
            vals_parts.append(vv)
    if not keys_parts:
        return pcontig, ppos, None, None, 0
    keys_dev = jnp.concatenate(keys_parts)
    vals_dev = jnp.concatenate(vals_parts)
    n_live = int(jnp.sum(keys_dev != jnp.uint32(0xFFFFFFFF)))
    return pcontig, ppos, keys_dev, vals_dev, n_live


def build_hash_peakset(per_contig, contigs, tables, masks, k: int):
    """Device-first peakset build for k > 30 (where the 2^k direct map does
    not fit HBM): member hashing, count filtering AND the two-choice bucket
    build all run on device — the member stream (hundreds of MB at
    reference scale) never crosses the tunnel, and the finished bucket
    table is already HBM-resident for the vote."""
    pcontig, ppos, keys_dev, vals_dev, n_live = _collect_member_pairs(
        per_contig, contigs, tables, masks, k)
    bucket = None
    if n_live:
        bucket = build_bucket_device(keys_dev, vals_dev, n_live)
    return PeakSet(
        contig=pcontig, pos=ppos,
        sorted_hash=np.zeros(0, np.uint32), sorted_peak=np.zeros(0, np.int32),
        bucket=bucket,
    )


@partial(jax.jit, static_argnames=("k",))
def build_peak_bitmap(sorted_hash, k: int):
    """One-bit-per-hash presence filter (uint8[2^(k-3)], 512 MB at k=32)
    for the binary-search vote fallback: ~99.6% of queries miss, and a
    single bitmap gather resolves them with far better HBM locality than
    log2(K) dependent binary-search probes. Built on device with 8
    scatter-max passes (one per bit position — indices unique per pass)."""
    import jax.numpy as jnp

    bm = jnp.zeros(1 << max(k - 3, 3), jnp.uint8)
    byte_idx = (sorted_hash >> jnp.uint32(3)).astype(jnp.int32)
    bit = (sorted_hash & jnp.uint32(7)).astype(jnp.uint8)
    oob = jnp.int32(bm.shape[0])
    for b in range(8):
        m = bit == b
        idx = jnp.where(m, byte_idx, oob)
        bm = bm.at[idx].max(
            jnp.where(m, jnp.uint8(1 << b), jnp.uint8(0)), mode="drop")
    return bm


@partial(jax.jit,
         static_argnames=("k", "min_base_num", "n_slots", "use_map",
                          "use_bitmap", "use_bucket"))
def split_vote_batch(
    peak_filter,
    codes1, len1, codes2, len2, accept,
    masks, sorted_hash, sorted_peak, peak_contig,
    k: int, min_base_num: int = 6, n_slots: int = 8, use_map: bool = False,
    bitmap=None, use_bitmap: bool = False,
    bucket_tab=None, use_bucket: bool = False,
):
    """One device step of the split-read vote (slide_reads, cpp:313-506).

    Args:
        peak_filter: int32 [P+1] vote counts (index 0 = sentinel).
        codes1/codes2: uint8 [B, L] mate code batches.
        accept: bool [B] down-sampling mask (same stream as counting).
    Returns updated peak_filter.
    """
    import jax.numpy as jnp

    B = codes1.shape[0]
    K = sorted_hash.shape[0]

    def candidates(codes, lengths):
        h, v = encode.canonical_hashes(jnp, codes, masks, k)  # [C,B,L]
        L = codes.shape[-1]
        inwin = jnp.arange(L, dtype=jnp.int32)[None, :] <= (lengths[:, None] - k)
        return _candidates_from_h(h, v & inwin, sorted_hash, sorted_peak,
                                  bitmap, use_map, use_bitmap,
                                  bucket_tab, use_bucket)

    pk1 = candidates(codes1, len1)
    pk2 = candidates(codes2, len2)
    return _vote_core(peak_filter, pk1, pk2, peak_contig, accept,
                      min_base_num, n_slots)


def _candidates_from_h(h, v, sorted_hash, sorted_peak, bitmap,
                       use_map: bool, use_bitmap: bool,
                       bucket_tab=None, use_bucket: bool = False):
    """Peak-candidate lookup from canonical hashes — direct map (k <= 30),
    two-choice bucket table (k > 30 default), bitmap-prefiltered binary
    search, or plain binary search.

    Hash 0 is excluded on every path (the degenerate all-zeros k-mer code;
    the direct-map build drops it, so the search paths must too for the two
    lookup modes to agree — read_index cpp:936-941 treats it as unusable)."""
    import jax.numpy as jnp

    if use_map:
        pk = sorted_hash[h.astype(jnp.int32)]
        return jnp.where(v[None, :, :] & (h != 0), pk, 0)
    K = sorted_hash.shape[0]
    ok0 = v[None, :, :] & (h != 0)
    if use_bucket and bucket_tab is not None:
        lg = int(bucket_tab.shape[0]).bit_length() - 1
        S = bucket_tab.shape[1] // 2
        pk = jnp.zeros(h.shape, jnp.int32)
        # per-coder rows keep the [.., 2S]-widened gather temporaries small
        for c in range(h.shape[0]):
            hc = h[c]
            hi = hc.astype(jnp.int32)  # bitcast view for key equality
            found = jnp.zeros(hc.shape, jnp.int32)
            for const in _MIX_SEEDS:
                row = bucket_tab[_mix_jnp(hc, const, lg)]  # one 32B gather
                m = row[..., :S] == hi[..., None]
                found = jnp.maximum(found, jnp.max(
                    jnp.where(m, row[..., S:], 0), axis=-1))
            pk = pk.at[c].set(found)
        return jnp.where(ok0, pk, 0)
    if use_bitmap and K:
        byte = bitmap[(h >> jnp.uint32(3)).astype(jnp.int32)]
        maybe = ((byte >> (h & jnp.uint32(7)).astype(jnp.uint8))
                 & jnp.uint8(1)) == 1
        hq = jnp.where(maybe, h, sorted_hash[0])
        idx = jnp.clip(jnp.searchsorted(sorted_hash, hq), 0, K - 1)
        found = (sorted_hash[idx] == hq) & maybe
        return jnp.where(found & ok0, sorted_peak[idx], 0)
    idx = jnp.clip(jnp.searchsorted(sorted_hash, h), 0, max(K - 1, 0))
    found = (sorted_hash[idx] == h) if K else jnp.zeros_like(h, bool)
    pk = sorted_peak[idx] if K else jnp.zeros(h.shape, jnp.int32)
    return jnp.where(found & ok0, pk, 0)


@partial(jax.jit,
         static_argnames=("k", "min_base_num", "n_slots", "use_map",
                          "use_bitmap", "use_bucket"))
def split_vote_from_hashes(
    peak_filter, h1, v1, h2, v2, accept, sorted_hash, sorted_peak,
    peak_contig,
    k: int, min_base_num: int = 6, n_slots: int = 8, use_map: bool = True,
    bitmap=None, use_bitmap: bool = False,
    bucket_tab=None, use_bucket: bool = False,
):
    """split_vote_batch fed with cached canonical hashes from the counting
    pass (stage A) — skips the second FASTQ read, host->device transfer and
    re-hash entirely. h: uint32 [C, B, L]; v: bool [B, L] (validity & k-mer
    window mask, before the down-sampling accept gate). With use_map,
    `sorted_hash` is the direct map."""
    c1 = _candidates_from_h(h1, v1, sorted_hash, sorted_peak, bitmap,
                            use_map, use_bitmap,
                            bucket_tab, use_bucket)
    c2 = _candidates_from_h(h2, v2, sorted_hash, sorted_peak, bitmap,
                            use_map, use_bitmap,
                            bucket_tab, use_bucket)
    return _vote_core(peak_filter, c1, c2, peak_contig, accept,
                      min_base_num, n_slots)


def _vote_core(peak_filter, pk1, pk2, peak_contig, accept,
               min_base_num: int, n_slots: int):
    import jax.numpy as jnp

    B = pk1.shape[1]
    pk = jnp.concatenate([pk1, pk2], axis=2)          # [C, B, P]
    genome = peak_contig[pk]                           # [C, B, P] (0 sentinel)
    if jax.default_backend() == "tpu":
        # the whole sequential greedy runs inside one Pallas kernel (state
        # resident in VMEM); the lax.scan below is the portable fallback
        from localhgt_tpu.ops import pallas_vote

        slots_g, slots_c, slots_p, hits = pallas_vote.vote_state(
            genome, pk, n_slots=n_slots)
        return _vote_tail(peak_filter, slots_g, slots_c, slots_p, hits,
                          accept, min_base_num)
    # pad position axis to a multiple of UNROLL, then scan over position
    # blocks with the sequential greedy unrolled inside the step body — the
    # per-position work is tiny, so fewer+fatter scan steps cut dispatch
    # latency ~8x on a remote device
    UNROLL = 8
    P = pk.shape[-1]
    pad = (-P) % UNROLL
    if pad:
        z = jnp.zeros(pk.shape[:2] + (pad,), pk.dtype)
        pk = jnp.concatenate([pk, z], axis=2)
        genome = jnp.concatenate([genome, z], axis=2)
    nblk = pk.shape[-1] // UNROLL
    # [nblk, UNROLL, B, C]
    pk = jnp.transpose(pk, (2, 1, 0)).reshape(nblk, UNROLL, B, -1)
    genome = jnp.transpose(genome, (2, 1, 0)).reshape(nblk, UNROLL, B, -1)

    G = n_slots
    C = pk.shape[-1]

    def one_position(state, cg, cp):
        slots_g, slots_c, slots_p, hits = state
        sel_g = jnp.zeros(B, jnp.int32)
        sel_cnt = jnp.zeros(B, jnp.int32)
        sel_p = jnp.zeros(B, jnp.int32)
        for c in range(C):
            g = cg[:, c]
            p = cp[:, c]
            is_cand = p != 0
            match = slots_g == g[:, None]              # [B, G]
            seen = jnp.any(match & (slots_g != 0), axis=1)
            cnt = jnp.max(jnp.where(match, slots_c, 0), axis=1)
            take_seen = is_cand & seen & (cnt >= sel_cnt)
            take_new = is_cand & ~seen & (sel_p == 0)
            take = take_seen | take_new
            sel_g = jnp.where(take, g, sel_g)
            sel_cnt = jnp.where(take_seen, cnt, jnp.where(take_new, 0, sel_cnt))
            sel_p = jnp.where(take, p, sel_p)
        do = sel_p != 0
        match = slots_g == sel_g[:, None]
        have = jnp.any(match & (slots_g != 0), axis=1)
        inc = match & (slots_g != 0) & do[:, None]
        slots_c = slots_c + inc.astype(jnp.int32)
        empty = slots_g == 0
        first_empty = empty & (jnp.cumsum(empty.astype(jnp.int32), axis=1) == 1)
        ins = first_empty & (do & ~have)[:, None]
        slots_g = jnp.where(ins, sel_g[:, None], slots_g)
        slots_c = jnp.where(ins, 1, slots_c)
        slots_p = jnp.where(ins, sel_p[:, None], slots_p)
        hits = hits + do.astype(jnp.int32)
        return (slots_g, slots_c, slots_p, hits)

    def step(state, inp):
        cg_blk, cp_blk = inp  # [UNROLL, B, C]
        for u in range(UNROLL):
            state = one_position(state, cg_blk[u], cp_blk[u])
        return state, None

    init = (
        jnp.zeros((B, G), jnp.int32),
        jnp.zeros((B, G), jnp.int32),
        jnp.zeros((B, G), jnp.int32),
        jnp.zeros(B, jnp.int32),
    )
    (slots_g, slots_c, slots_p, hits), _ = jax.lax.scan(step, init, (genome, pk))
    return _vote_tail(peak_filter, slots_g, slots_c, slots_p, hits, accept,
                      min_base_num)


def _vote_tail(peak_filter, slots_g, slots_c, slots_p, hits, accept,
               min_base_num: int):
    """check_split's top-2-genome gate + the peak_filter bump
    (cpp:161-202,498-505), from the final register state [B, G]."""
    import jax.numpy as jnp

    qual = (slots_c >= min_base_num) & (slots_g != 0)
    nq = jnp.sum(qual, axis=1)
    gate = accept & (hits >= min_base_num) & (nq >= 2)
    counts = jnp.where(qual, slots_c, 0)
    largest = jnp.max(counts, axis=1)
    n_largest = jnp.sum(counts == largest[:, None], axis=1)
    second_cand = jnp.max(jnp.where(counts == largest[:, None], 0, counts), axis=1)
    second = jnp.where(n_largest > 1, largest, second_cand)
    vote = qual & ((counts == largest[:, None]) | (counts == second[:, None])) \
        & gate[:, None]
    ids = jnp.where(vote, slots_p, 0).reshape(-1)
    return peak_filter.at[ids].add(1)
