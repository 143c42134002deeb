"""Read QC — the `--refine_fq` stage (fastp with default settings).

The reference shells out to `fastp -i fq1 -I fq2 -o ... -O ...`
(infer_HGT_breakpoint.py:99-109). fastp's defaults do two things:

1. **PE adapter trimming by overlap analysis**: find the relative offset at
   which read1 and revcomp(read2) agree (overlap >= 30 bases, mismatches
   <= min(5, 20% of the overlap)); when the implied insert size is shorter
   than a read, the bases beyond the insert are adapter and are cut.
2. **Read filtering**: drop a pair when either mate (after trimming) has
   > 40% bases under Q15, > 5 N bases, or length < 15.

Here the O(L^2) overlap scan runs on device as a lax.scan over candidate
offsets, batched over pairs (one dispatch per batch); among offsets meeting
fastp's criteria the largest overlap wins (fastp walks offsets outward from
zero and takes the first hit — equivalent except on pathological ties).
Trimming + filtering + rewriting are host-side streaming.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import numpy as np

from localhgt_tpu.ops.coder import _ASCII_TO_CODE

OVERLAP_REQUIRE = 30      # fastp overlap_len_require
OVERLAP_DIFF_LIMIT = 5    # fastp overlap_diff_limit
OVERLAP_DIFF_PCT = 0.2    # fastp overlap_diff_percent_limit
QUALIFIED_PHRED = 15      # fastp qualified_quality_phred
UNQUALIFIED_PCT = 0.4     # fastp unqualified_percent_limit (40%)
N_BASE_LIMIT = 5          # fastp n_base_limit
LENGTH_REQUIRED = 15      # fastp length_required


@dataclass
class QCStats:
    pairs_in: int = 0
    pairs_out: int = 0
    adapter_trimmed: int = 0
    bases_in: int = 0
    bases_out: int = 0


@partial(jax.jit, static_argnames=("max_len",))
def _overlap_insert(codes1, len1, codes2, len2, max_len: int):
    """Per-pair insert-size estimate from read1 x revcomp(read2) overlap.

    Returns int32 [B]: the implied insert length, or 0 when no acceptable
    overlap exists. codes are uint8 [B, L] (4 = N/pad)."""
    import jax
    import jax.numpy as jnp

    B, L = codes1.shape
    # revcomp read2, left-aligned
    j = jnp.arange(L, dtype=jnp.int32)
    idx = len2[:, None] - 1 - j[None, :]
    rc2 = jnp.where(
        idx >= 0,
        jnp.take_along_axis(codes2, jnp.clip(idx, 0, L - 1), axis=1), 4)
    rc2 = jnp.where(rc2 < 4, 3 - rc2, 4)

    valid1 = j[None, :] < len1[:, None]

    def eval_offset(carry, d):
        best_ov, best_ins = carry
        # rc2 shifted right by d (d may be negative): rc2 index = j - d
        sh = jnp.clip(j[None, :] - d, 0, L - 1)
        r2d = jnp.take_along_axis(rc2, jnp.broadcast_to(sh, (B, L)), axis=1)
        r2_ok = ((j[None, :] - d) >= 0) & ((j[None, :] - d) < len2[:, None])
        both = valid1 & r2_ok
        mism = jnp.sum(both & (codes1 != r2d), axis=1)
        ov = jnp.sum(both, axis=1)
        lim = jnp.minimum(
            jnp.int32(OVERLAP_DIFF_LIMIT),
            (ov.astype(jnp.float32) * OVERLAP_DIFF_PCT).astype(jnp.int32))
        ok = (ov >= OVERLAP_REQUIRE) & (mism <= lim)
        take = ok & (ov > best_ov)
        ins = d + len2
        best_ins = jnp.where(take, ins, best_ins)
        best_ov = jnp.where(take, ov, best_ov)
        return (best_ov, best_ins), None

    offsets = jnp.arange(-(max_len - OVERLAP_REQUIRE),
                         max_len - OVERLAP_REQUIRE + 1, dtype=jnp.int32)
    (ov, ins), _ = jax.lax.scan(
        eval_offset,
        (jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32)), offsets)
    return jnp.where(ov >= OVERLAP_REQUIRE, ins, 0)


def _read_batches(path1, path2, batch: int = 1 << 14):
    """Yield aligned raw record batches from both files:
    lists of (name, seq, plus, qual) byte tuples, strictly in record order.

    Records are buffered across blob boundaries so R1/R2 stay paired even
    when the two files' record byte sizes differ (different name or read
    lengths would otherwise desynchronize blob-aligned batches)."""

    def reader(path):
        """Yield lists of complete records per 64MB blob."""
        carry = b""
        with open(path, "rb") as f:
            while True:
                blob = f.read(1 << 26)
                if not blob and not carry:
                    return
                data = carry + blob
                buf = np.frombuffer(data, dtype=np.uint8)
                nl = np.flatnonzero(buf == 10)
                nrec = len(nl) // 4
                if nrec == 0:
                    if not blob:
                        return  # trailing partial record dropped
                    carry = data
                    continue
                consumed = int(nl[nrec * 4 - 1]) + 1
                carry = data[consumed:] if blob and consumed < len(data) else b""
                starts = np.concatenate([[0], nl[:-1] + 1])
                recs = []
                for r in range(nrec):
                    b0 = r * 4
                    recs.append((
                        bytes(buf[starts[b0]: nl[b0]]),
                        bytes(buf[starts[b0 + 1]: nl[b0 + 1]]),
                        bytes(buf[starts[b0 + 2]: nl[b0 + 2]]),
                        bytes(buf[starts[b0 + 3]: nl[b0 + 3]]),
                    ))
                yield recs
                if not blob:
                    return

    it1, it2 = reader(path1), reader(path2)
    b1, b2 = [], []
    done1 = done2 = False
    while True:
        while len(b1) < batch and not done1:
            chunk = next(it1, None)
            if chunk is None:
                done1 = True
            else:
                b1.extend(chunk)
        while len(b2) < batch and not done2:
            chunk = next(it2, None)
            if chunk is None:
                done2 = True
            else:
                b2.extend(chunk)
        n = min(len(b1), len(b2), batch)
        if n == 0:
            return  # either file exhausted; any unpaired tail is dropped
        yield b1[:n], b2[:n]
        b1, b2 = b1[n:], b2[n:]


def _codes_matrix(seqs, width):
    B = len(seqs)
    codes = np.full((B, width), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(seqs):
        arr = _ASCII_TO_CODE[np.frombuffer(s, np.uint8)[:width]]
        codes[i, : len(arr)] = arr
        lens[i] = len(arr)
    return codes, lens


def refine_fastq(fq1: str, fq2: str, out1: str, out2: str,
                 use_device: bool = True, batch: int = 1 << 13) -> QCStats:
    """fastp-default QC: adapter-trim by PE overlap + pair filtering.

    Returns QCStats; writes the refined pair files (the paths the reference
    derives as `<sample>_refined_{1,2}.fq`, infer_HGT_breakpoint.py:100-101).
    """
    import jax.numpy as jnp

    st = QCStats()
    with open(out1, "wb") as f1, open(out2, "wb") as f2:
        for r1, r2 in _read_batches(fq1, fq2, batch):
            B = len(r1)
            st.pairs_in += B
            width = max(
                max((len(s) for _, s, _, _ in r1), default=1),
                max((len(s) for _, s, _, _ in r2), default=1), 1)
            width = -(-width // 32) * 32
            c1, l1 = _codes_matrix([s for _, s, _, _ in r1], width)
            c2, l2 = _codes_matrix([s for _, s, _, _ in r2], width)
            st.bases_in += int(l1.sum() + l2.sum())
            if use_device:
                ins = np.asarray(_overlap_insert(
                    jnp.asarray(c1), jnp.asarray(l1),
                    jnp.asarray(c2), jnp.asarray(l2), max_len=width))
            else:
                ins = _overlap_insert_np(c1, l1, c2, l2)
            for i in range(B):
                n1, s1, p1, q1 = r1[i]
                n2, s2, p2, q2 = r2[i]
                I = int(ins[i])
                if I > 0:
                    if I < len(s1):
                        s1, q1 = s1[:I], q1[:I]
                        st.adapter_trimmed += 1
                    if I < len(s2):
                        s2, q2 = s2[:I], q2[:I]
                        st.adapter_trimmed += 1
                if not (_passes(s1, q1) and _passes(s2, q2)):
                    continue
                st.pairs_out += 1
                st.bases_out += len(s1) + len(s2)
                f1.write(n1 + b"\n" + s1 + b"\n" + p1 + b"\n" + q1 + b"\n")
                f2.write(n2 + b"\n" + s2 + b"\n" + p2 + b"\n" + q2 + b"\n")
    return st


def _passes(seq: bytes, qual: bytes) -> bool:
    """fastp default read filter (quality/N/length)."""
    if len(seq) < LENGTH_REQUIRED:
        return False
    q = np.frombuffer(qual, np.uint8).astype(np.int32) - 33
    if len(q) and float((q < QUALIFIED_PHRED).mean()) > UNQUALIFIED_PCT:
        return False
    s = np.frombuffer(seq, np.uint8)
    if int(((s == ord("N")) | (s == ord("n"))).sum()) > N_BASE_LIMIT:
        return False
    return True


def _overlap_insert_np(c1, l1, c2, l2):
    """Numpy oracle of _overlap_insert, for tests."""
    B, L = c1.shape
    out = np.zeros(B, np.int32)
    for i in range(B):
        a = c1[i, : l1[i]]
        b = c2[i, : l2[i]][::-1]
        b = np.where(b < 4, 3 - b, 4)
        best_ov, best_ins = 0, 0
        for d in range(-(L - OVERLAP_REQUIRE), L - OVERLAP_REQUIRE + 1):
            lo = max(0, d)
            hi = min(len(a), len(b) + d)
            ov = hi - lo
            if ov < OVERLAP_REQUIRE:
                continue
            mism = int((a[lo:hi] != b[lo - d: hi - d]).sum())
            lim = min(OVERLAP_DIFF_LIMIT, int(ov * OVERLAP_DIFF_PCT))
            if mism <= lim and ov > best_ov:
                best_ov, best_ins = ov, d + len(b)
        out[i] = best_ins if best_ov >= OVERLAP_REQUIRE else 0
    return out
