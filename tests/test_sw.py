"""Smith-Waterman kernel tests: the scan/prefix-max formulation must equal a
plain O(MN) DP on random sequences, including span recovery."""

import numpy as np
import pytest

from localhgt_tpu.ops import sw


def _rand_pair(rng, m, n, mutate=True):
    q = rng.integers(0, 4, m).astype(np.uint8)
    r = rng.integers(0, 4, n).astype(np.uint8)
    if mutate and n >= m:
        # embed a mutated copy of q so there's real signal
        start = int(rng.integers(0, n - m + 1))
        copy = q.copy()
        flips = rng.random(m) < 0.1
        copy[flips] = (copy[flips] + rng.integers(1, 4)) % 4
        r[start : start + m] = copy
    return q, r


def test_sw_score_matches_naive():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    qs, rs = [], []
    for _ in range(8):
        q, r = _rand_pair(rng, 24, 48)
        qs.append(q)
        rs.append(r)
    q = np.stack(qs)
    r = np.stack(rs)
    got = np.asarray(sw.sw_score(jnp.asarray(q), jnp.asarray(r),
                                 match=1, mismatch=-4, gap_open=-6, gap_ext=-1))
    for b in range(8):
        exp = sw.sw_align_np(q[b], r[b])[0]
        assert got[b] == exp, b


def test_sw_align_full_span():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    B, M, N = 6, 20, 40
    q = np.stack([_rand_pair(rng, M, N)[0] for _ in range(B)])
    r = np.stack([_rand_pair(rng, M, N)[1] for _ in range(B)])
    # make pair 0 a clean containment for exact span check
    q[0] = rng.integers(0, 4, M)
    r[0][:] = (q[0][5] + 1) % 4  # constant background
    r[0][7:27] = q[0]

    out = sw.sw_align(jnp.asarray(q), jnp.asarray(r))
    out = {k: np.asarray(v) for k, v in out.items()}

    for b in range(B):
        score, qs_, qe, rs_, re = sw.sw_align_np(q[b], r[b])
        assert out["score"][b] == score, b
        if score == 0:
            continue
        # the reported span must contain an alignment of the same score
        sub_score = sw.sw_align_np(
            q[b][out["qstart"][b] : out["qend"][b] + 1],
            r[b][out["rstart"][b] : out["rend"][b] + 1],
        )[0]
        assert sub_score == score, b

    assert out["qstart"][0] == 0 and out["qend"][0] == M - 1
    assert out["rstart"][0] == 7 and out["rend"][0] == 26


def test_sw_gap_costs():
    import jax.numpy as jnp

    # query = ref with a 3-base deletion in the middle
    rng = np.random.default_rng(2)
    ref = rng.integers(0, 4, 40).astype(np.uint8)
    query = np.concatenate([ref[:20], ref[23:]]).astype(np.uint8)
    out = sw.sw_align(jnp.asarray(query[None]), jnp.asarray(ref[None]))
    # 37 matches - (6 + 3*1) gap = 28
    assert int(out["score"][0]) == 37 - 9


def test_sw_no_match():
    import jax.numpy as jnp

    q = np.zeros((1, 8), np.uint8)          # AAAA...
    r = np.full((1, 16), 3, np.uint8)       # TTTT...
    out = sw.sw_align(jnp.asarray(q), jnp.asarray(r))
    assert int(out["score"][0]) == 1 * 0 or int(out["score"][0]) == 0
