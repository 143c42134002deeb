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
    assert score.recall >= 0.9
    assert score.fdr <= 0.25
