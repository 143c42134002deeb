"""use_kmer=0 (direct alignment against the full reference) — the reference's
ground-truth mode (infer_HGT_breakpoint.py:36-97) used to validate the
extraction stage. Must find the same breakpoints without any k-mer stage."""

import numpy as np
import pytest

from localhgt_tpu.config import Config, KmerConfig
from localhgt_tpu.sim import evaluate
from localhgt_tpu.sim.simulate import SimParams, read_truth, simulate_sample


def test_direct_mode_finds_breakpoints(tmp_path):
    from localhgt_tpu.pipeline.bkp import detect_breakpoint
    from localhgt_tpu.utils import formats

    out = str(tmp_path)
    pa = SimParams(n_genomes=4, genome_len=30_000, hgt_num=1, depth=8, seed=7)
    ref, fq1, fq2, truth_path = simulate_sample(out, "d1", pa)
    truth = read_truth(truth_path)

    acc = detect_breakpoint(
        ref, fq1, fq2, "d1", out, cfg=Config().replace(kmer=KmerConfig(k=20)),
        use_kmer=False,
    )
    rows, _, _ = formats.read_acc_csv(acc)
    called = [
        (r["from_ref"], int(r["from_pos"]), r["to_ref"], int(r["to_pos"]))
        for r in rows
    ]
    score = evaluate.score_bkps(evaluate.truth_to_bkps(truth), called)
    print("direct-mode score:", score)
    # tightened after the bwa-model mapq landed (r2 ask #6): the fixture
    # scores 1.0/0.0 exactly; leave minimal slack for future fixture drift
    assert score.recall >= 0.99
    assert score.fdr <= 0.05


def test_mapq_calibration_properties(tmp_path):
    """The bwa-model mapq must pass ~all unique-region reads at the
    mapq >= 20 gate and fail ~all reads from an exactly-duplicated region
    (bwa's sub == score -> mapq 0 case). Full report:
    reports/mapq_calibration.json (tools/mapq_calibration.py)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import mapq_calibration

    rep = mapq_calibration.run(str(tmp_path))
    assert rep["n_repeat"] > 50
    assert rep["unique_pass_rate"] >= 0.99, rep
    assert rep["repeat_pass_rate"] <= 0.05, rep
