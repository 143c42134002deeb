"""Scenario sweeps: the paper harness's evaluation grids on this framework.

Port of the batch-runner + evaluator roles
(paper_results/generate_run_scripts.py + evaluation.py __main__): sweep SNP
rate / depth / read length grids (simulation.py:339-817 scenario functions),
run the bkp pipeline on each sample, and score recall/FDR/F1 at the +-50bp
tolerance. Emits one CSV row per run.

    python -m localhgt_tpu.sim.grid --out /tmp/grid --scenario snp
"""

from __future__ import annotations

import argparse
import csv
import dataclasses
import os
import time

from localhgt_tpu.config import Config, KmerConfig
from localhgt_tpu.sim import evaluate
from localhgt_tpu.sim.simulate import SimParams, read_truth, simulate_sample

# grids follow simulation.py Parameters (:819-891)
SCENARIOS = {
    "snp": [dict(snp_rate=r) for r in (0.01, 0.02, 0.03, 0.04, 0.05)],
    "depth": [dict(depth=d) for d in (10, 30, 50)],
    "readlen": [dict(read_len=l) for l in (75, 100, 150)],
    "quick": [dict(snp_rate=0.01), dict(snp_rate=0.03)],
}


def run_one(outdir: str, name: str, sim_kw: dict, cfg: Config):
    from localhgt_tpu.pipeline.bkp import detect_breakpoint
    from localhgt_tpu.utils import formats

    pa = SimParams(
        n_genomes=20, genome_len=120_000, hgt_num=10, seed=hash(name) % 2**31,
        **sim_kw,
    )
    ref, fq1, fq2, truth_path = simulate_sample(outdir, name, pa)
    truth = read_truth(truth_path)
    t0 = time.time()
    acc = detect_breakpoint(ref, fq1, fq2, name, outdir, cfg=cfg)
    wall = time.time() - t0
    rows, _, _ = formats.read_acc_csv(acc)
    called = [
        (r["from_ref"], int(r["from_pos"]), r["to_ref"], int(r["to_pos"]))
        for r in rows
    ]
    score = evaluate.score_bkps(evaluate.truth_to_bkps(truth), called)
    return dict(
        sample=name, **sim_kw, recall=score.recall, fdr=score.fdr,
        f1=score.f1, n_called=score.n_called, wall_s=round(wall, 1),
    )


def run_grid(outdir: str, scenario: str, cfg: Config | None = None):
    cfg = cfg or Config().replace(kmer=KmerConfig(k=24))
    os.makedirs(outdir, exist_ok=True)
    results = []
    for i, kw in enumerate(SCENARIOS[scenario]):
        name = f"{scenario}{i}"
        results.append(run_one(outdir, name, kw, cfg))
        print(results[-1], flush=True)
    out_csv = os.path.join(outdir, f"grid_{scenario}.csv")
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(results[0]))
        w.writeheader()
        w.writerows(results)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--scenario", choices=list(SCENARIOS), default="quick")
    ap.add_argument("-k", type=int, default=24)
    a = ap.parse_args(argv)
    cfg = Config().replace(kmer=KmerConfig(k=a.k))
    run_grid(a.out, a.scenario, cfg)


if __name__ == "__main__":
    main()
