"""Read-QC (`--refine_fq`, fastp-default equivalent) tests."""

import numpy as np
import pytest

from localhgt_tpu.io import qc
from localhgt_tpu.ops.coder import _ASCII_TO_CODE

BASES = "ACGT"
COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def _rc(s):
    return "".join(COMP[c] for c in reversed(s))


def _codes(seqs, width):
    B = len(seqs)
    c = np.full((B, width), 4, np.uint8)
    ln = np.zeros(B, np.int32)
    for i, s in enumerate(seqs):
        a = _ASCII_TO_CODE[np.frombuffer(s.encode(), np.uint8)]
        c[i, : len(a)] = a
        ln[i] = len(a)
    return c, ln


def _rand_seq(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def test_overlap_insert_detects_short_insert():
    rng = np.random.default_rng(0)
    insert = _rand_seq(rng, 80)
    adapter1 = _rand_seq(rng, 40)
    adapter2 = _rand_seq(rng, 40)
    r1 = (insert + adapter1)[:120]          # reads longer than the insert
    r2 = (_rc(insert) + adapter2)[:120]     # -> adapter read-through
    c1, l1 = _codes([r1], 128)
    c2, l2 = _codes([r2], 128)
    ins_d = np.asarray(qc._overlap_insert(c1, l1, c2, l2, max_len=128))
    ins_n = qc._overlap_insert_np(c1, l1, c2, l2)
    assert ins_d[0] == 80, ins_d
    assert ins_n[0] == 80, ins_n


def test_overlap_insert_long_insert_no_trim():
    rng = np.random.default_rng(1)
    insert = _rand_seq(rng, 200)
    r1 = insert[:120]
    r2 = _rc(insert)[:120]  # overlap = 40 at insert length 200
    c1, l1 = _codes([r1], 128)
    c2, l2 = _codes([r2], 128)
    ins = np.asarray(qc._overlap_insert(c1, l1, c2, l2, max_len=128))
    assert ins[0] == 200  # insert detected but >= read length: no trimming


def test_overlap_insert_unrelated_reads():
    rng = np.random.default_rng(2)
    c1, l1 = _codes([_rand_seq(rng, 120)], 128)
    c2, l2 = _codes([_rand_seq(rng, 120)], 128)
    ins = np.asarray(qc._overlap_insert(c1, l1, c2, l2, max_len=128))
    assert ins[0] == 0


def test_device_matches_oracle_batch():
    rng = np.random.default_rng(3)
    seqs1, seqs2 = [], []
    for i in range(8):
        insert = _rand_seq(rng, int(rng.integers(60, 150)))
        r1 = (insert + _rand_seq(rng, 50))[:100]
        r2 = (_rc(insert) + _rand_seq(rng, 50))[:100]
        seqs1.append(r1)
        seqs2.append(r2)
    c1, l1 = _codes(seqs1, 128)
    c2, l2 = _codes(seqs2, 128)
    ins_d = np.asarray(qc._overlap_insert(c1, l1, c2, l2, max_len=128))
    ins_n = qc._overlap_insert_np(c1, l1, c2, l2)
    np.testing.assert_array_equal(ins_d, ins_n)


def test_passes_filters():
    good = b"ACGT" * 10
    assert qc._passes(good, b"I" * 40)               # Q40
    assert not qc._passes(b"ACGTACGTACGTA", b"I" * 13)   # too short (13 < 15)
    assert not qc._passes(good, b"#" * 40)           # Q2 everywhere
    many_n = b"N" * 6 + b"ACGT" * 10
    assert not qc._passes(many_n, b"I" * len(many_n))


def test_refine_fastq_end_to_end(tmp_path):
    rng = np.random.default_rng(4)
    pairs = []
    # pair 0: short insert (adapter) -> trimmed to 80
    ins0 = _rand_seq(rng, 80)
    pairs.append(((ins0 + _rand_seq(rng, 40))[:110],
                  (_rc(ins0) + _rand_seq(rng, 40))[:110]))
    # pair 1: clean long insert
    ins1 = _rand_seq(rng, 400)
    pairs.append((ins1[:100], _rc(ins1)[:100]))
    # pair 2: garbage quality -> dropped
    pairs.append((_rand_seq(rng, 100), _rand_seq(rng, 100)))

    fq1, fq2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    with open(fq1, "w") as f1, open(fq2, "w") as f2:
        for i, (s1, s2) in enumerate(pairs):
            q = "#" if i == 2 else "I"
            f1.write(f"@p{i}/1\n{s1}\n+\n{q * len(s1)}\n")
            f2.write(f"@p{i}/2\n{s2}\n+\n{q * len(s2)}\n")
    o1, o2 = tmp_path / "o1.fq", tmp_path / "o2.fq"
    st = qc.refine_fastq(str(fq1), str(fq2), str(o1), str(o2))
    assert st.pairs_in == 3 and st.pairs_out == 2
    assert st.adapter_trimmed == 2  # both mates of pair 0
    lines = o1.read_text().splitlines()
    assert lines[0] == "@p0/1"
    assert len(lines[1]) == 80 and len(lines[3]) == 80
    assert lines[4] == "@p1/1" and len(lines[5]) == 100


def test_read_batches_stay_paired_across_blob_boundaries(tmp_path, monkeypatch):
    """R1/R2 with different record byte sizes must not desynchronize when
    blob boundaries split the two files at different record counts
    (regression: blob-aligned batches zipped with min-length truncation)."""
    n = 50
    fq1, fq2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    with open(fq1, "w") as f1, open(fq2, "w") as f2:
        for i in range(n):
            # R1 records are much longer than R2 records
            f1.write(f"@read{i}/1\n{'A' * 90}\n+\n{'I' * 90}\n")
            f2.write(f"@read{i}/2\n{'C' * 30}\n+\n{'I' * 30}\n")

    # shrink the blob size so boundaries land mid-file at different record
    # counts for the two files
    import builtins

    real_open = builtins.open

    class SmallBlobFile:
        def __init__(self, f):
            self._f = f

        def read(self, size=-1):
            return self._f.read(min(size, 256) if size > 0 else size)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            self._f.close()

    def tiny_open(path, mode="r", *a, **kw):
        f = real_open(path, mode, *a, **kw)
        if "b" in mode and str(path).endswith(".fq"):
            return SmallBlobFile(f)
        return f

    monkeypatch.setattr(builtins, "open", tiny_open)
    batches = list(qc._read_batches(str(fq1), str(fq2), batch=7))
    got = [(r1[0], r2[0]) for b1, b2 in batches for r1, r2 in zip(b1, b2)]
    assert len(got) == n
    for i, (n1, n2) in enumerate(got):
        assert n1 == f"@read{i}/1".encode()
        assert n2 == f"@read{i}/2".encode()
