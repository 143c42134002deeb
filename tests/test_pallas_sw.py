"""Pallas SW score kernel vs the lax.scan formulation (interpret mode on CPU,
compiled on real TPU)."""

import numpy as np
import pytest

from localhgt_tpu.ops import sw


def test_pallas_sw_score_matches_scan():
    import jax
    import jax.numpy as jnp

    from localhgt_tpu.ops import pallas_sw

    rng = np.random.default_rng(0)
    B, M, N = 256, 64, 128
    q = rng.integers(0, 4, (B, M)).astype(np.uint8)
    r = rng.integers(0, 4, (B, N)).astype(np.uint8)
    # plant signal
    for b in range(0, B, 7):
        r[b, 20:20 + M] = q[b][: min(M, N - 20)]
    q[3, 10:20] = 4  # Ns

    interpret = jax.devices()[0].platform != "tpu"
    got = np.asarray(
        pallas_sw.sw_score_pallas(jnp.asarray(q), jnp.asarray(r),
                                  tile=128, interpret=interpret)
    )
    exp = np.asarray(sw.sw_score(jnp.asarray(q), jnp.asarray(r)))
    np.testing.assert_array_equal(got, exp)


def test_pallas_sw_align_matches_scan():
    """The full-span Pallas kernel (the wired production path on TPU,
    ops/sw.py sw_align_tiled) must reproduce the lax.scan formulation's
    score AND all four span coordinates, including its flat-argmax
    (first-maximum) tie-breaking."""
    import jax
    import jax.numpy as jnp

    from localhgt_tpu.ops import pallas_sw

    rng = np.random.default_rng(1)
    B, M, N = 128, 48, 128
    q = rng.integers(0, 4, (B, M)).astype(np.uint8)
    r = rng.integers(0, 4, (B, N)).astype(np.uint8)
    # plant exact hits (span recovery), reverse matches, N runs, and
    # duplicate maxima (tie-break coverage: two identical plants)
    for b in range(0, B, 5):
        r[b, 30:30 + M] = q[b][: min(M, N - 30)]
    for b in range(0, B, 11):
        r[b, 4:4 + 16] = q[b][8:24]
        r[b, 60:60 + 16] = q[b][8:24]
    q[2, 5:25] = 4
    r[7, :] = 4  # unalignable: zero-score row

    interpret = jax.devices()[0].platform != "tpu"
    got = np.asarray(
        pallas_sw.sw_align_pallas(jnp.asarray(q), jnp.asarray(r),
                                  tile=128, interpret=interpret)
    )
    exp = sw.sw_align(jnp.asarray(q), jnp.asarray(r))
    for i, f in enumerate(sw._FIELDS):
        np.testing.assert_array_equal(got[:, i], np.asarray(exp[f]), err_msg=f)


def test_pallas_sw_align_gap_costs():
    """Affine-gap parameters thread through the kernel (non-default
    match/mismatch/open/ext), checked against the numpy oracle."""
    import jax
    import jax.numpy as jnp

    from localhgt_tpu.ops import pallas_sw

    rng = np.random.default_rng(2)
    M, N = 32, 64
    interpret = jax.devices()[0].platform != "tpu"
    q = rng.integers(0, 4, (256, M)).astype(np.uint8)
    r = rng.integers(0, 4, (256, N)).astype(np.uint8)
    # queries with a deletion relative to ref: force gap handling
    for b in range(256):
        seg = rng.integers(0, 4, 40).astype(np.uint8)
        r[b, 10:50] = seg
        q[b, :30] = np.concatenate([seg[:12], seg[18:36]])
    kw = dict(match=2, mismatch=-3, gap_open=-5, gap_ext=-2)
    got = np.asarray(pallas_sw.sw_align_pallas(
        jnp.asarray(q), jnp.asarray(r), tile=256, interpret=interpret, **kw))
    for b in range(0, 256, 37):
        s, qs, qe, rs, re_ = sw.sw_align_np(
            q[b], r[b], match=2, mismatch=-3, gap_open=-5, gap_ext=-2)
        assert got[b, 0] == s, b
        if s > 0:
            assert (got[b, 1], got[b, 2], got[b, 3], got[b, 4]) == \
                (qs, qe, rs, re_), b
