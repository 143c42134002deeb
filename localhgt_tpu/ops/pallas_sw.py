"""Pallas TPU kernel for batched local alignment scoring.

The alignment extension stage is the pipeline's FLOP-heavy inner loop at
production scale (hot loops 4/5 of the reference — bwa-mem extension and the
accurate_bkp SSW scans). The lax.scan formulation in localhgt_tpu.ops.sw
round-trips its carries through XLA's scheduling; this kernel pins the whole
DP state (H row, gap run-max, best) in VMEM scratch and runs the row loop
in-core, one grid step per batch tile.

Recurrence identical to ops.sw.sw_score (exact affine SW via prefix-max):
    H1 = max(0, Hdiag + sub, F)        F from a cross-row running max
    E  = prefmax_j(H1 - j*ext) + open + j*ext   (log2 N shift-max steps)
    H  = max(H1, E)

Shifts along the lane axis use pltpu.roll + iota masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 28)  # python int: jnp module constants become captured consts in pallas


def _shift_right_lanes(x, s, fill):
    """y[:, j] = x[:, j-s] for j >= s else fill (lane axis shift)."""
    rolled = pltpu.roll(x, s, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    return jnp.where(lane >= s, rolled, jnp.int32(fill))


def _sw_score_kernel(q_ref, r_ref, out_ref, *, M, N, match, mismatch,
                     gap_open, gap_ext):
    TB = q_ref.shape[0]
    o = jnp.int32(gap_open)
    e = jnp.int32(gap_ext)
    r = r_ref[:]                                   # [TB, N] int32
    r_valid = r < 4
    jpos = jax.lax.broadcasted_iota(jnp.int32, (TB, N), dimension=1)

    def body(i, carry):
        H_prev, Mf, best = carry
        q_i = q_ref[:, i][:, None]                 # dynamic row of the query
        sub = jnp.where((r == q_i) & r_valid & (q_i < 4),
                        jnp.int32(match), jnp.int32(mismatch))
        Hd = _shift_right_lanes(H_prev, 1, 0)
        F = Mf + o + i * e
        H1 = jnp.maximum(jnp.maximum(Hd + sub, 0), F)
        # E via log-step prefix max of T = H1 - j*ext over j' < j
        T = H1 - jpos * e
        s = 1
        while s < N:
            T = jnp.maximum(T, _shift_right_lanes(T, s, NEG))
            s *= 2
        Tm = _shift_right_lanes(T, 1, NEG)
        H = jnp.maximum(H1, Tm + o + jpos * e)
        Mf = jnp.maximum(Mf, H - i * e)
        best = jnp.maximum(best, jnp.max(H, axis=1, keepdims=True))
        return H, Mf, best

    H0 = jnp.zeros((TB, N), jnp.int32)
    Mf0 = jnp.full((TB, N), NEG)
    best0 = jnp.zeros((TB, 1), jnp.int32)
    _, _, best = jax.lax.fori_loop(0, M, body, (H0, Mf0, best0))
    out_ref[:] = jnp.broadcast_to(best, out_ref.shape)


@functools.partial(
    jax.jit,
    static_argnames=("match", "mismatch", "gap_open", "gap_ext", "tile",
                     "interpret"),
)
def sw_score_pallas(query, ref, match=1, mismatch=-2, gap_open=-3,
                    gap_ext=-1, tile=256, interpret=False):
    """Batched SW scores via the Pallas kernel.

    query: uint8 [B, M]; ref: uint8 [B, N]; B must be a multiple of `tile`
    (callers pad). Returns int32 [B].
    """
    B, M = query.shape
    N = ref.shape[1]
    assert B % tile == 0, (B, tile)
    kernel = functools.partial(
        _sw_score_kernel, M=M, N=N, match=match, mismatch=mismatch,
        gap_open=gap_open, gap_ext=gap_ext,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((tile, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        interpret=interpret,
    )(query.astype(jnp.int32), ref.astype(jnp.int32))
    return out[:, 0]
