"""Tests for the prefix-sum scan stencil against a direct transcription of the
reference's rolling-loop semantics (slide_window, extract_ref_normal_peak.cpp:
550-725)."""

import numpy as np
import pytest

from localhgt_tpu.config import ScanConfig
from localhgt_tpu.ops import scan


def slide_window_direct(hc, k, cfg: ScanConfig, least_depth=3):
    """Sequential re-enactment of the C++ rolling loops (for tests only)."""
    coder_num, L = hc.shape
    single = np.zeros(L, np.int32)
    trio = np.zeros(L, np.int32)
    good = np.zeros(L, bool)
    peak = np.zeros(L, bool)
    w = cfg.peak_w
    window = cfg.window
    one_min = scan.truncated_min(window, cfg.hit_ratio)
    three_min = scan.truncated_min(window, cfg.match_ratio)
    one = 0
    three = 0
    for j in range(L):
        hits = int(np.sum(hc[:, j] == least_depth))
        trio[j] = 1 if hits == coder_num else 0
        single[j] = 1 if hits > 0 else 0
        if j < window:
            one += hits > 0
            three += hits == coder_num
        else:
            one = one - single[j - window] + single[j]
            three = three - trio[j - window] + trio[j]
        good[j] = one >= one_min and three >= three_min

        if j > 2 * k + 2 * w:
            right = sum(single[j - n] for n in range(w))
            left = 0
            for m in range(k, 2 * k, cfg.skip_a):
                if m == k:
                    left = sum(single[j - w - n] for n in range(w))
                else:
                    left = left - single[j - m - w + 1] + single[j - 2 * w + 1 - m]
                diff = left - right
                if diff >= cfg.peak_diff:
                    peak[j - m - w] = True
                if diff <= -cfg.peak_diff:
                    peak[j] = True
    return good, peak


def make_hits(rng, L, coder_num=3):
    """Synthetic per-position count profile with a coverage edge."""
    hc = np.zeros((coder_num, L), dtype=np.int8)
    # covered region with occasional dropouts, then divergence after L//2
    cov = rng.random(L) < 0.9
    cov[L // 2 :] = rng.random(L - L // 2) < 0.15
    for c in range(coder_num):
        noise = rng.random(L) < 0.05
        hc[c] = np.where(cov ^ noise, 3, rng.integers(0, 3, L))
    return hc


@pytest.mark.parametrize("k", [16, 32])
def test_scan_matches_direct_port(k):
    rng = np.random.default_rng(3)
    cfg = ScanConfig()
    L = 3000
    hc = make_hits(rng, L)
    good_d, peak_d = slide_window_direct(hc, k, cfg)
    good_v, peak_v = scan.scan_hits(np, hc, k, cfg)
    np.testing.assert_array_equal(good_v, good_d)
    np.testing.assert_array_equal(peak_v, peak_d)


def test_scan_jax_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    cfg = ScanConfig()
    hc = make_hits(rng, 2000)
    good_np, peak_np = scan.scan_hits(np, hc, 32, cfg)
    good_jx, peak_jx = scan.scan_hits(jnp, jnp.asarray(hc), 32, cfg)
    np.testing.assert_array_equal(np.asarray(good_jx), good_np)
    np.testing.assert_array_equal(np.asarray(peak_jx), peak_np)


def test_truncated_min_float32_semantics():
    # int(window * float32(ratio)) as in the C++ (cpp:559-560); 0.08f*500
    # rounds back to exactly 40.0f, so both defaults are the round values
    assert scan.truncated_min(500, 0.08) == 40
    assert scan.truncated_min(500, 0.1) == 50


def test_good_intervals_state_machine():
    window = 10
    good = np.zeros(200, bool)
    good[50:60] = True      # rise at 50, fall at 59
    good[75:80] = True      # within merge distance after padding
    good[150:200] = True    # open at the end
    ivs = scan.good_intervals(good, window, pad=2 * window)
    # run [50,60): start=50-20=30, end=(fall idx 60)+20=80; run [75,80):
    # start=55 < 80+window -> merges, end extends to 80+20=100
    assert ivs[0] == (30, 100)
    assert ivs[-1] == (130, 200)


def test_final_intervals_merge():
    peaks = [(1, 600), (1, 1500), (1, 2100), (2, 700)]
    ivs = scan.final_intervals(peaks, ref_near=500, ref_gap=500)
    # 1500-500=1000 vs end 1100 -> gap 100 < 500 merges; 2100-500=1600 vs 2000 merges
    assert ivs == [(1, 100, 2600), (2, 200, 1200)]
