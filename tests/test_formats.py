"""acc.csv round-trip + dedup semantics."""

import numpy as np

from localhgt_tpu.io import fasta
from localhgt_tpu.pipeline.accbkp import AccBkp
from localhgt_tpu.utils import formats


def _contigs():
    return fasta.Contigs(
        names=["GA_1", "GB_1"],
        lengths=np.array([1000, 1000]),
        offsets=np.array([0, 1000]),
        codes=np.zeros(2000, np.uint8),
    ).finalize()


def _acc(r1=1, p1=100, r2=2, p2=200):
    return AccBkp(r1, p1, "head", "+", r2, p2, "tail", "-", False,
                  "ACGT", "ACGT", 0.95, 3, 4, 2, 7)


def test_acc_csv_roundtrip(tmp_path):
    path = str(tmp_path / "s.acc.csv")
    formats.write_acc_csv(path, [_acc()], _contigs(), reads_num=1234,
                          insert_size=456)
    rows, reads_num, insert = formats.read_acc_csv(path)
    assert reads_num == 1234 and insert == 456
    assert len(rows) == 1
    r = rows[0]
    assert r["from_ref"] == "GA_1" and r["to_ref"] == "GB_1"
    assert int(r["cross_split_reads"]) == 2
    assert int(r["pair_end"]) == 7
    # header comment wording must match what downstream parsers expect
    first = open(path).readline()
    assert first.startswith("# the number of reads in the sample is: 1234;")


def test_dedup_rows():
    a = _acc(p1=100, p2=200)
    b = _acc(p1=120, p2=230)          # within 50 of a -> dropped
    c = _acc(p1=400, p2=200)          # far on one side -> kept
    d = _acc(r1=2, p1=210, r2=1, p2=110)  # reversed orientation of a -> dropped
    kept = formats.dedup_rows([a, b, c, d], cutoff=50)
    assert kept == [a, c]
