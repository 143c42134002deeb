"""Input validation (check_input equivalent, infer_HGT_breakpoint.py:123-166)."""

import gzip

import pytest

from localhgt_tpu.utils import validate


def test_missing_files(tmp_path):
    with pytest.raises(validate.InputError, match="not found"):
        validate.check_fastq(str(tmp_path / "no.fq"), "--fq1")
    with pytest.raises(validate.InputError, match="not found"):
        validate.check_fasta(str(tmp_path / "no.fa"))


def test_compressed_fastq_rejected(tmp_path):
    p = tmp_path / "r.fq.gz"
    with gzip.open(p, "wb") as f:
        f.write(b"@r1\nACGT\n+\nIIII\n")
    with pytest.raises(validate.InputError, match="compressed"):
        validate.check_fastq(str(p), "--fq1")


def test_garbled_inputs_rejected(tmp_path):
    p = tmp_path / "r.fq"
    p.write_text("not a fastq\n")
    with pytest.raises(validate.InputError, match="FASTQ"):
        validate.check_fastq(str(p), "--fq1")
    q = tmp_path / "r.fa"
    q.write_text("ACGT no header\n")
    with pytest.raises(validate.InputError, match="FASTA"):
        validate.check_fasta(str(q))
    e = tmp_path / "empty.fq"
    e.write_text("")
    with pytest.raises(validate.InputError, match="empty"):
        validate.check_fastq(str(e), "--fq2")


def test_same_file_rejected(tmp_path):
    fq = tmp_path / "r.fq"
    fq.write_text("@r1\nACGT\n+\nIIII\n")
    fa = tmp_path / "ref.fa"
    fa.write_text(">c1\nACGT\n")
    with pytest.raises(validate.InputError, match="same file"):
        validate.check_bkp_inputs(str(fa), str(fq), str(fq), str(tmp_path / "o"))


def test_good_inputs_pass(tmp_path):
    fq1 = tmp_path / "r1.fq"
    fq1.write_text("@r1\nACGT\n+\nIIII\n")
    fq2 = tmp_path / "r2.fq"
    fq2.write_text("@r1\nTTTT\n+\nIIII\n")
    fa = tmp_path / "ref.fa"
    fa.write_text(">c1\nACGT\n")
    validate.check_bkp_inputs(str(fa), str(fq1), str(fq2), str(tmp_path / "o"))


def test_event_inputs(tmp_path):
    fa = tmp_path / "ref.fa"
    fa.write_text(">c1\nACGT\n")
    with pytest.raises(validate.InputError, match="folder not found"):
        validate.check_event_inputs(str(fa), str(tmp_path / "nope"))
    d = tmp_path / "res"
    d.mkdir()
    with pytest.raises(validate.InputError, match="acc.csv"):
        validate.check_event_inputs(str(fa), str(d))
    (d / "s1.acc.csv").write_text("# header\n")
    validate.check_event_inputs(str(fa), str(d))


def test_cli_friendly_error(tmp_path, capsys):
    from localhgt_tpu import cli

    rc = cli.main(["bkp", "-r", str(tmp_path / "no.fa"),
                   "--fq1", str(tmp_path / "a.fq"),
                   "--fq2", str(tmp_path / "b.fq")])
    assert rc == 2
    assert "error:" in capsys.readouterr().err
