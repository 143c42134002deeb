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
