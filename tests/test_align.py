"""Seed-and-extend aligner unit tests: placement, strand, split detection."""

import numpy as np
import pytest

from localhgt_tpu.config import AlignConfig
from localhgt_tpu.io import fasta
from localhgt_tpu.ops.coder import COMPLEMENT
from localhgt_tpu.pipeline import align


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(0)
    contigs = fasta.Contigs(
        names=["c1_1", "c2_1"],
        lengths=np.array([5000, 5000]),
        offsets=np.array([0, 5000]),
        codes=rng.integers(0, 4, 10000).astype(np.uint8),
    ).finalize()
    intervals = [(1, 1, 5000), (2, 1, 5000)]
    subref = align.build_subref(contigs, intervals)
    index = align.SeedIndex.build(subref, 19)
    return contigs, subref, index


def _aln(subref, index, reads, cfg=None):
    cfg = cfg or AlignConfig()
    L = max(len(r) for r in reads)
    codes = np.full((len(reads), L), 4, np.uint8)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = r
    lengths = np.array([len(r) for r in reads], np.int32)
    ids = np.arange(len(reads))
    return align.align_batch(subref, index, codes, lengths, ids, 0, cfg)


def test_exact_placement_and_strand(world):
    contigs, subref, index = world
    c1 = contigs.contig_codes(1)
    r_fwd = c1[1000:1150].copy()
    r_rev = COMPLEMENT[c1[2000:2150]][::-1].copy()
    t = _aln(subref, index, [r_fwd, r_rev])
    assert t.contig[0] == 1 and abs(t.pos[0] - 1000) <= 1
    assert t.strand[0] == 0 and t.mapq[0] >= 20
    assert t.contig[1] == 1 and abs(t.pos[1] - 2000) <= 1
    assert t.strand[1] == 1
    assert t.contig2[0] == -1  # no split


def test_split_read_across_contigs(world):
    contigs, subref, index = world
    c1 = contigs.contig_codes(1)
    c2 = contigs.contig_codes(2)
    chimera = np.concatenate([c1[3000:3070], c2[1200:1280]])
    t = _aln(subref, index, [chimera])
    got = {int(t.contig[0]), int(t.contig2[0])}
    assert got == {1, 2}, (t.contig, t.contig2, t.pos, t.pos2)
    # the two parts cover disjoint read halves
    assert t.score[0] >= 60 and t.score2[0] >= 60


def test_split_read_reverse_second_half(world):
    """Junction into a reverse-complemented segment (the reversed-HGT case)."""
    contigs, subref, index = world
    c1 = contigs.contig_codes(1)
    c2 = contigs.contig_codes(2)
    part2 = COMPLEMENT[c2[600:680]][::-1]
    chimera = np.concatenate([c1[4000:4070], part2])
    t = _aln(subref, index, [chimera])
    got = {int(t.contig[0]), int(t.contig2[0])}
    assert got == {1, 2}, (t.contig, t.contig2)
    strands = {int(t.strand[0]), int(t.strand2[0])}
    assert strands == {0, 1}


def test_unmapped_garbage(world):
    contigs, subref, index = world
    rng = np.random.default_rng(9)
    junk = rng.integers(0, 4, 150).astype(np.uint8)
    t = _aln(subref, index, [junk])
    assert t.contig[0] == -1 or t.mapq[0] == 0


def test_mapq_drops_for_repeats(world):
    contigs, subref, index = world
    c1 = contigs.contig_codes(1).copy()
    # duplicate a region so the read maps to two places
    dup = fasta.Contigs(
        names=["d1_1"],
        lengths=np.array([4000]),
        offsets=np.array([0]),
        codes=np.concatenate([c1[:2000], c1[:2000]]),
    ).finalize()
    sub2 = align.build_subref(dup, [(1, 1, 4000)])
    idx2 = align.SeedIndex.build(sub2, 19)
    read = c1[500:650].copy()
    t = _aln(sub2, idx2, [read])
    assert t.mapq[0] < 20


def test_native_seed_hits_matches_numpy():
    """C++ seed_hits must reproduce the numpy seeding path exactly (same
    hits per strand in the same order)."""
    from localhgt_tpu.io import native
    from localhgt_tpu.pipeline import align as A

    if not native.available():
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(11)
    ref_codes = rng.integers(0, 4, 5000).astype(np.uint8)
    contigs = fasta.Contigs(
        names=["c1"], lengths=np.array([5000]), offsets=np.array([0]),
        codes=ref_codes).finalize()
    subref = A.build_subref(contigs, [(1, 1, 5000)])
    index = A.SeedIndex.build(subref, 19)

    B, L = 32, 128
    codes = np.full((B, L), 4, np.uint8)
    lengths = rng.integers(60, L, B).astype(np.int32)
    for i in range(B):
        ln = lengths[i]
        src = int(rng.integers(0, 5000 - ln))
        seg = ref_codes[src: src + ln].copy()
        if i % 3 == 0:  # reverse-complement some reads
            seg = np.array([3 - c for c in seg[::-1]], np.uint8)
        codes[i, :ln] = seg
    codes[5, 30] = 4  # an N breaks seeds spanning it

    hr, ho, hp, hs = native.seed_hits(
        codes, lengths, index.sorted_hash, index.sorted_pos, 19, 5, 32)

    # numpy reference
    rc = A._revcomp_batch(codes, lengths)
    for strand, arr in ((0, codes), (1, rc)):
        n_starts = L - 19 + 1
        stride_idx = np.arange(0, n_starts, 5)
        h, valid = A._pack_seeds_at(arr, 19, stride_idx)
        # numpy path hashes padded tails too; restrict to in-read seeds
        inread = stride_idx[None, :] + 19 <= lengths[:, None]
        valid = valid & inread
        qh = h.reshape(-1)[valid.reshape(-1)]
        qread = np.broadcast_to(np.arange(B)[:, None], h.shape).reshape(-1)[
            valid.reshape(-1)]
        qoff = np.broadcast_to(stride_idx[None, :], h.shape).reshape(-1)[
            valid.reshape(-1)]
        hit_q, hit_pos = index.lookup(qh, max_occ=32)
        m = hs == strand
        np.testing.assert_array_equal(hr[m], qread[hit_q])
        np.testing.assert_array_equal(ho[m], qoff[hit_q])
        np.testing.assert_array_equal(hp[m], hit_pos)
