"""IO layer tests: FASTQ/FASTA parsing, native reader parity, down-sampling."""

import numpy as np
import pytest

from localhgt_tpu.io import fasta, fastq, native
from localhgt_tpu.ops import coder


@pytest.fixture()
def small_fastq(tmp_path):
    rng = np.random.default_rng(0)
    lut = "ACGT"
    path = tmp_path / "x.fq"
    reads = []
    with open(path, "w") as f:
        for i in range(1000):
            ln = int(rng.integers(80, 151))
            seq = "".join(lut[int(b)] for b in rng.integers(0, 4, ln))
            if i % 97 == 0:
                seq = seq[:10] + "N" + seq[11:]
            reads.append(seq)
            f.write(f"@r{i}/1 extra\n{seq}\n+\n{'I' * ln}\n")
    return str(path), reads


def test_fastq_batches_roundtrip(small_fastq):
    path, reads = small_fastq
    got = []
    for b in fastq.iter_fastq_batches(path, batch_reads=128):
        for i in range(b.n):
            got.append(coder.codes_to_seq(b.codes[i, : b.lengths[i]]))
    assert len(got) == len(reads)
    for g, r in zip(got, reads):
        assert g == r.upper().replace("N", "N")


def test_count_bases(small_fastq):
    path, reads = small_fastq
    total, n, first = fastq.count_bases(path)
    assert n == len(reads)
    assert total == sum(len(r) for r in reads)
    assert first == len(reads[0])


def test_native_reader_parity(small_fastq):
    if not native.available():
        pytest.skip("no C++ toolchain")
    path, reads = small_fastq
    tot, n = native.count_bases(path)
    assert (tot, n) == (sum(len(r) for r in reads), len(reads))
    rows = []
    for codes, lengths, start in native.iter_fastq_blocks(
        path, max_reads=256, width=160
    ):
        for i in range(len(lengths)):
            rows.append(coder.codes_to_seq(codes[i, : lengths[i]]))
    assert rows == [r[:160] for r in reads]


def test_accept_mask_deterministic():
    a = fastq.accept_mask(1000, 500, 0.3, seed=1)
    b = fastq.accept_mask(1000, 500, 0.3, seed=1)
    np.testing.assert_array_equal(a, b)
    c = fastq.accept_mask(1000, 500, 0.3, seed=2)
    assert not np.array_equal(a, c)
    # ordinal-keyed: overlapping ranges agree
    d = fastq.accept_mask(1200, 300, 0.3, seed=1)
    np.testing.assert_array_equal(a[200:], d)
    # rate roughly matches
    assert 0.2 < a.mean() < 0.4


def test_accept_mask_strict_glibc():
    if not native.available():
        pytest.skip("no C++ toolchain")
    from localhgt_tpu.ops.coder import GlibcRand

    m = fastq.accept_mask(0, 50, 0.5, seed=1, strict=True)
    g = GlibcRand(1)
    exp = np.array([(g.rand() % 100000) / 1000.0 < 50.0 for _ in range(50)])
    np.testing.assert_array_equal(m, exp)


def test_fasta_roundtrip(tmp_path):
    path = str(tmp_path / "r.fa")
    fasta.write_fasta(path, [("c1 desc", "ACGTNNACGT" * 10),
                             ("c2", "TTTTGGGG")])
    c = fasta.read_fasta(path)
    assert c.names == ["c1", "c2"]
    assert c.length_of(1) == 100
    assert coder.codes_to_seq(c.contig_codes(2)) == "TTTTGGGG"
    assert coder.codes_to_seq(c.slice_codes(1, 4, 8)) == "NNAC"


def test_reference_index_roundtrip(tmp_path):
    from localhgt_tpu.index import reference

    path = str(tmp_path / "r.fa")
    fasta.write_fasta(path, [("a_1", "ACGTACGTNNGGCC" * 20), ("b_1", "ACAC" * 30)])
    c1 = reference.build(path)
    c2 = reference.load(path)
    assert c1.names == c2.names
    np.testing.assert_array_equal(c1.codes, c2.codes)
    lens = open(path + ".genome.len.txt").read().splitlines()
    assert lens[0].split("\t")[:3] == ["a_1", "1", str(c1.length_of(1))]
