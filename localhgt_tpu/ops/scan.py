"""Reference divergence scan: good-window detection + peak stencil.

Re-derivation of slide_window (src/extract_ref_normal_peak.cpp:550-725) as
gather-free prefix-sum stencils so the whole contig scans as a handful of
vector ops instead of a sequential rolling loop.

Definitions (S = inclusive prefix sum of single-coder hits, S[x<0] = 0):

* single[j] = any coder's count == least_depth at j, trio[j] = all coders
  (cpp:573-595).
* one_cnt[j] = S[j] - S[j-window]  (the C++ rolling update, cpp:597-608,
  including the warm-up j < window where the sum is cumulative).
* good[j] = one_cnt >= one_min and three_cnt >= three_min, where the minima
  use the C++'s float32 arithmetic `int(window * ratio_f32)` (cpp:559-560).
* Peak stencil (cpp:640-671): for j > 2k+2w (w = PEAK_W = 5),
      right[j]   = S[j] - S[j-w]
      left(j,m)  = S[j-w] - S[j-2w] - S[j-k-w] + S[j-m-w]
                   + S[j-k-2w] - S[j-m-2w]        for m in [k, 2k)
  `left(j,m)` is the closed form of the reference's telescoped rolling update
  (which, note, does NOT equal a clean w-window at distance m — we reproduce
  the shipped arithmetic, bug-for-bug, because it defines which candidate
  peaks exist).
      diff <= -DIFF marks peak at j;  diff >= DIFF marks peak at j-m-w.

The m loop (k..2k-1) unrolls to 32 shifted comparisons, OR-accumulated.
"""

from __future__ import annotations

import numpy as np

from localhgt_tpu.config import ScanConfig


def _shifted(xp, spad, pad: int, off: int, L: int):
    """Return S[j+off] for j in [0, L) given spad = concat(zeros(pad), S)."""
    lo = pad + off
    return spad[..., lo : lo + L]


def truncated_min(window: int, ratio: float) -> int:
    """int(window * float32(ratio)) — the C++ float truncation (cpp:559-560)."""
    return int(np.float32(window) * np.float32(ratio))


def scan_hits(xp, hc, k: int, cfg: ScanConfig, least_depth: int = 3,
              true_len=None):
    """Good-window and peak masks for one contig (or a batch of chunks).

    Args:
        xp: numpy or jax.numpy.
        hc: int8/int32 [..., coder_num, L] per-position table counts (0 where
            the k-mer was invalid or index 0 — read_index, cpp:933-945).
            Leading batch dims scan independent contig chunks in one call.
        k: k-mer length.
        true_len: optional dynamic contig length when hc is padded beyond the
            contig end; peak conditions are only evaluated for j < true_len
            (the C++ loop bound, cpp:573). Scalar or [...] per batch row.

    Returns:
        good: bool [..., L], peak: bool [..., L].
    """
    L = hc.shape[-1]
    w = cfg.peak_w
    window = cfg.window
    hit = hc == least_depth
    single = xp.any(hit, axis=-2)
    trio = xp.all(hit, axis=-2)

    s1 = xp.cumsum(single.astype(xp.int32), axis=-1)
    s3 = xp.cumsum(trio.astype(xp.int32), axis=-1)
    pad = window + 2 * k + 4 * w + 8  # covers every negative S offset used
    zpad = xp.zeros(s1.shape[:-1] + (pad,), dtype=xp.int32)
    s1p = xp.concatenate([zpad, s1], axis=-1)
    s3p = xp.concatenate([zpad, s3], axis=-1)

    one_cnt = s1 - _shifted(xp, s1p, pad, -window, L)
    three_cnt = s3 - _shifted(xp, s3p, pad, -window, L)
    one_min = truncated_min(window, cfg.hit_ratio)
    three_min = truncated_min(window, cfg.match_ratio)
    good = (one_cnt >= one_min) & (three_cnt >= three_min)

    # peak stencil
    j = xp.arange(L, dtype=xp.int32)
    in_range = j > (2 * k + 2 * w)  # strict, cpp:644
    if true_len is not None:
        tl = xp.asarray(true_len)
        if tl.ndim:
            tl = tl[..., None]          # per-row length -> broadcast over L
        in_range = in_range & (j < tl)
    right = s1 - _shifted(xp, s1p, pad, -w, L)
    base_left = (
        _shifted(xp, s1p, pad, -w, L)
        - _shifted(xp, s1p, pad, -2 * w, L)
        - _shifted(xp, s1p, pad, -k - w, L)
        + _shifted(xp, s1p, pad, -k - 2 * w, L)
    )
    peak = xp.zeros(good.shape, dtype=bool)
    for m in range(k, 2 * k, cfg.skip_a):
        left = (
            base_left
            + _shifted(xp, s1p, pad, -m - w, L)
            - _shifted(xp, s1p, pad, -m - 2 * w, L)
        )
        diff = left - right
        neg = in_range & (diff <= -cfg.peak_diff)        # marks position j
        pos = in_range & (diff >= cfg.peak_diff)         # marks position j-m-w
        # shift `pos` down by m+w: out[p] = pos[p+m+w]
        sh = m + w
        shifted_pos = xp.concatenate(
            [pos[..., sh:], xp.zeros(pos.shape[:-1] + (sh,), dtype=bool)],
            axis=-1,
        )
        peak = peak | neg | shifted_pos
    return good, peak


def good_intervals(good: np.ndarray, window: int, pad: int | None = None):
    """Reproduce the conti_flag state machine (cpp:617-686) on a host mask.

    Returns list of (start, end) 0/1-clamped intervals (C++ convention:
    start = rise - 2*window clamped to >= 1, end = fall + 2*window clamped to
    <= L; a run still open at the end closes with end = L; a new interval
    whose start is < window past the previous end merely extends it).
    """
    good = np.asarray(good, dtype=bool)
    L = len(good)
    pad = 2 * window if pad is None else pad
    g = good.astype(np.int8)
    rising = np.flatnonzero(np.diff(np.concatenate([[0], g])) == 1)
    falling = np.flatnonzero(np.diff(np.concatenate([g, [0]])) == -1)
    out: list[list[int]] = []
    for r, f in zip(rising, falling):
        start = max(r - pad, 1)
        if f == L - 1:  # run touches contig end
            end = L
        else:
            end = min(f + 1 + pad, L)
        if out and start - out[-1][1] < window:
            out[-1][1] = end
        else:
            out.append([start, end])
    return [(a, b) for a, b in out]


def peaks_in_intervals(peak: np.ndarray, intervals, merge_bin: int):
    """Peak positions inside good intervals, dedup-merged by 50-bp bin.

    Mirrors the add_peak/merge_peak bookkeeping (cpp:239-301): scanning
    positions in order, a peak falling in the same `merge_bin` bin as the
    previously added peak merges into it (keeping the first position); the
    merged positions still contribute their k-mers to that peak id.

    Fully vectorized (a UHGG-scale sample emits millions of peaks, so no
    per-peak Python). Merging compares `p // merge_bin` against the current
    representative's bin; since every member of a group shares the
    representative's bin, group boundaries are exactly where consecutive
    member bins differ — including across interval boundaries, as in the
    C++ (merge_peak does not reset between good windows).

    Returns (positions, members, group_ids):
        positions int32 [P]: representative (first) position of each peak
            (contig-relative; callers widen to int64 global coords);
        members   int32 [M]: all member positions, ascending (contig-
            relative; a contig is < 2^31 bp, and int32 halves the
            dominant host allocation at reference scale — scale1g held
            ~500M members);
        group_ids int32 [M]: 0-based peak index of each member.
    """
    peak = np.asarray(peak, dtype=bool)
    mems = [np.flatnonzero(peak[a:b]).astype(np.int32) + np.int32(a)
            for a, b in intervals]
    mem = (np.concatenate(mems) if mems else np.zeros(0, np.int32))
    if len(mem) == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int32),
                np.zeros(0, np.int32))
    bins = mem // merge_bin
    first = np.ones(len(mem), bool)
    first[1:] = bins[1:] != bins[:-1]
    gid = np.cumsum(first, dtype=np.int32) - np.int32(1)
    return mem[first], mem, gid


def final_intervals(contig_peaks, ref_near: int, ref_gap: int, contig_lens=None):
    """count_filtered_peak (cpp:515-548): kept peaks -> merged +-ref_near
    intervals per contig. `contig_peaks` is an iterable of (ref_index, pos)
    sorted by (ref_index, pos)."""
    out: list[tuple[int, int, int]] = []
    for ref_index, pos in contig_peaks:
        start = pos - ref_near
        end = pos + ref_near
        if out and out[-1][0] == ref_index and start - out[-1][2] < ref_gap:
            out[-1] = (ref_index, out[-1][1], end)
        else:
            out.append((ref_index, max(start, 1), end))
    if contig_lens is not None:
        out = [
            (r, s, min(e, contig_lens[r])) for r, s, e in out
        ]
    return out
