"""Pallas TPU kernels for batched local alignment (affine-gap SW).

The alignment extension stage is the pipeline's FLOP-heavy inner loop at
production scale (hot loops 4/5 of the reference — bwa-mem extension at
pipeline.sh:48 and the accurate_bkp SSW scans, accurate_bkp.py:29-37).
The lax.scan formulation in localhgt_tpu.ops.sw round-trips its carries
through XLA's scheduling and (for span recovery) materializes [M, B, N]
H/origin tensors in HBM; these kernels pin the whole DP state in VMEM and
run the row loop in-core, one grid step per batch tile.

Layout: **sequence on sublanes, batch on lanes** — q is passed [M, B] and
r is [N, B]; DP state is [N, TB] tiles. This orientation is load-bearing:
the per-row query fetch is then a dynamic SUBLANE slice (q_ref[pl.ds(i,1)]),
which Mosaic supports, whereas a dynamic LANE index (q_ref[:, i]) fails to
compile ("index in dimension 1 must be a multiple of 128"). Lane-axis
prefix scans become sublane shifts, done with static concatenates (the
same pattern as ops.pallas_vote).

Recurrence identical to ops.sw (exact affine SW via prefix-max):
    H1 = max(0, Hdiag + sub, F)        F from a cross-row running max
    E  = prefmax_j(H1 - j*ext) + open + j*ext   (log2 N shift-max steps)
    H  = max(H1, E)
The align kernel additionally threads a packed origin register through
every max decision (same origin scheme as ops.sw.sw_align) so one forward
pass yields score, query span and ref span with no traceback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 28)  # python int: jnp module constants become captured consts in pallas


def _shift_down_sub(x, s, fill):
    """y[j, :] = x[j-s, :] for j >= s else fill (sublane-axis shift, static s)."""
    TB = x.shape[1]
    return jnp.concatenate(
        [jnp.full((s, TB), fill, x.dtype), x[:-s]], axis=0)


def _sw_score_kernel(q_ref, r_ref, out_ref, *, M, N, match, mismatch,
                     gap_open, gap_ext):
    TB = q_ref.shape[1]
    o = jnp.int32(gap_open)
    e = jnp.int32(gap_ext)
    r = r_ref[:]                                   # [N, TB] int32
    r_valid = r < 4
    jpos = jax.lax.broadcasted_iota(jnp.int32, (N, TB), dimension=0)

    def body(i, carry):
        H_prev, Mf, best = carry
        q_i = q_ref[pl.ds(i, 1), :]                # [1, TB] dynamic sublane
        sub = jnp.where((r == q_i) & r_valid & (q_i < 4),
                        jnp.int32(match), jnp.int32(mismatch))
        Hd = _shift_down_sub(H_prev, 1, 0)
        F = Mf + o + i * e
        H1 = jnp.maximum(jnp.maximum(Hd + sub, 0), F)
        # E via log-step prefix max of T = H1 - j*ext over j' < j
        T = H1 - jpos * e
        s = 1
        while s < N:
            T = jnp.maximum(T, _shift_down_sub(T, s, NEG))
            s *= 2
        Tm = _shift_down_sub(T, 1, NEG)
        H = jnp.maximum(H1, Tm + o + jpos * e)
        Mf = jnp.maximum(Mf, H - i * e)
        best = jnp.maximum(best, jnp.max(H, axis=0, keepdims=True))
        return H, Mf, best

    H0 = jnp.zeros((N, TB), jnp.int32)
    Mf0 = jnp.full((N, TB), NEG)
    best0 = jnp.zeros((1, TB), jnp.int32)
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
            pl.BlockSpec((M, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.int32),
        interpret=interpret,
    )(query.astype(jnp.int32).T, ref.astype(jnp.int32).T)
    return out[0, :]


def _sw_align_kernel(q_ref, r_ref, out_ref, *, M, N, match, mismatch,
                     gap_open, gap_ext):
    """Full-span SW: the score recurrence with a packed origin register
    propagated through every max decision, entirely in VMEM. One forward
    pass yields score, query span and ref span; nothing M x N ever touches
    HBM (the lax.scan formulation materialized [M, B, N] H and O tensors
    and argmaxed them on HBM — the round-3 0.07 GCUPS production path).
    Origin pack = i*(N+1) + j of the cell that STARTED the alignment."""
    TB = q_ref.shape[1]
    o = jnp.int32(gap_open)
    e = jnp.int32(gap_ext)
    r = r_ref[:]                                   # [N, TB] int32
    r_valid = r < 4
    jpos = jax.lax.broadcasted_iota(jnp.int32, (N, TB), dimension=0)
    Np1 = jnp.int32(N + 1)

    def maxpair(av, ao, bv, bo):
        take_b = bv > av                       # ties keep a (earlier origin)
        return jnp.where(take_b, bv, av), jnp.where(take_b, bo, ao)

    def body(i, carry):
        H_prev, O_prev, Mf, MfO, bH, bPack, bO, bI = carry
        q_i = q_ref[pl.ds(i, 1), :]
        sub = jnp.where((r == q_i) & r_valid & (q_i < 4),
                        jnp.int32(match), jnp.int32(mismatch))
        Hd = _shift_down_sub(H_prev, 1, 0)
        Od = _shift_down_sub(O_prev, 1, 0)
        start_O = i * Np1 + jpos               # fresh start at (i, j)
        diag = Hd + sub
        diagO = jnp.where(Hd > 0, Od, start_O)
        F = Mf + o + i * e
        H1, O1 = maxpair(jnp.maximum(diag, 0), diagO, F, MfO)
        T = H1 - jpos * e
        TO = O1
        s = 1
        while s < N:
            Ts = _shift_down_sub(T, s, NEG)
            TOs = _shift_down_sub(TO, s, 0)
            T, TO = maxpair(T, TO, Ts, TOs)
            s *= 2
        Tm = _shift_down_sub(T, 1, NEG)
        TmO = _shift_down_sub(TO, 1, 0)
        H, O = maxpair(H1, O1, Tm + o + jpos * e, TmO)
        H = jnp.maximum(H, 0)
        Mf, MfO = maxpair(Mf, MfO, H - i * e, O)
        # row best: pack = H*N + (N-1-j) maximizes H then minimizes j;
        # strict > on H keeps the earliest row — together the flat-argmax
        # (first maximum in row-major order) of the lax.scan formulation
        pack = H * jnp.int32(N) + (jnp.int32(N - 1) - jpos)
        rowPack = jnp.max(pack, axis=0, keepdims=True)
        rowH = jnp.max(H, axis=0, keepdims=True)
        rowO = jnp.max(jnp.where(pack == rowPack, O, -1), axis=0,
                       keepdims=True)
        better = rowH > bH
        bPack = jnp.where(better, rowPack, bPack)
        bO = jnp.where(better, rowO, bO)
        bI = jnp.where(better, i, bI)
        bH = jnp.where(better, rowH, bH)
        return H, O, Mf, MfO, bH, bPack, bO, bI

    zN = jnp.zeros((N, TB), jnp.int32)
    z1 = jnp.zeros((1, TB), jnp.int32)
    _, _, _, _, bH, bPack, bO, bI = jax.lax.fori_loop(
        0, M, body, (zN, zN, jnp.full((N, TB), NEG), zN, z1, z1, z1, z1))
    score = jnp.maximum(bH, 0)
    rend = jnp.int32(N - 1) - (bPack - bH * jnp.int32(N))
    qstart = bO // Np1
    rstart = bO - qstart * Np1
    zero = score <= 0
    z = jnp.zeros((1, TB), jnp.int32)

    def field(x):
        return jnp.where(zero, z, x)

    row = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, dimension=0)
    out = jnp.where(row == 0, score, 0)
    out = jnp.where(row == 1, field(qstart), out)
    out = jnp.where(row == 2, field(bI), out)
    out = jnp.where(row == 3, field(rstart), out)
    out = jnp.where(row == 4, field(rend), out)
    out_ref[:] = out


@functools.partial(
    jax.jit,
    static_argnames=("match", "mismatch", "gap_open", "gap_ext", "tile",
                     "interpret"),
)
def sw_align_pallas(query, ref, match=1, mismatch=-4, gap_open=-6,
                    gap_ext=-1, tile=256, interpret=False):
    """Batched SW with full span recovery via the Pallas kernel.

    query: uint8 [B, M]; ref: uint8 [B, N]; B must be a multiple of `tile`
    (callers pad). Returns int32 [B, 5]: score, qstart, qend, rstart, rend
    (same field order as ops.sw._FIELDS)."""
    B, M = query.shape
    N = ref.shape[1]
    assert B % tile == 0, (B, tile)
    kernel = functools.partial(
        _sw_align_kernel, M=M, N=N, match=match, mismatch=mismatch,
        gap_open=gap_open, gap_ext=gap_ext,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((M, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.int32),
        interpret=interpret,
    )(query.astype(jnp.int32).T, ref.astype(jnp.int32).T)
    return out[:5, :].T
