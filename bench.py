#!/usr/bin/env python3
"""Benchmark: end-to-end HGT breakpoint detection throughput on one chip.

Regenerates a species20-style fixture (the reference's bundled smoke data is
absent — SURVEY.md section 4), runs the full `bkp` pipeline on the real
device, validates accuracy vs truth at the +-50bp tolerance, and prints ONE
JSON line:

    {"metric": "bkp_pairs_per_sec", "value": N, "unit": "pairs/s",
     "vs_baseline": R, ...}

Baseline anchor: the reference processes a human-gut sample (~13M read pairs
at the 2 Gbp down-sample) in ~2 h on 10 CPU threads (README.md:6) ==
~1800 pairs/s end-to-end. vs_baseline = ours / 1800.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PAIRS_PER_SEC = 13_000_000 / (2 * 3600.0)


def main():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/lht_jax_cache"
    )
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    import numpy as np

    from localhgt_tpu.config import Config, KmerConfig
    from localhgt_tpu.sim import evaluate
    from localhgt_tpu.sim.simulate import SimParams, read_truth, simulate_sample
    from localhgt_tpu.utils import formats

    dev = jax.devices()[0]
    platform = dev.platform

    out = "/tmp/lht_bench"
    pa = SimParams(
        n_genomes=20, genome_len=150_000, hgt_num=10, depth=10,
        snp_rate=0.01, seed=42,
    )
    ref, fq1, fq2, truth_path = simulate_sample(out, "bench", pa)
    truth = read_truth(truth_path)
    n_pairs = sum(1 for _ in open(fq1)) // 4

    # k sets both k-mer length and table bits (reference couples them); small
    # k collides heavily (the count_diff_kmer study's point), inflating the
    # extraction stage. k=30 -> 3x1GB int8 tables on-chip; k=32 (12GB) needs
    # the per-hash sequential mode.
    k = int(os.environ.get("LHT_BENCH_K", "30"))
    cfg = Config().replace(kmer=KmerConfig(k=k))

    from localhgt_tpu.pipeline.bkp import detect_breakpoint

    # Run twice: the first pass absorbs one-time costs that are not
    # pipeline work (XLA compiles on a cold cache, and the tunneled device
    # terminal's multi-second reclamation of previous clients' GB-scale
    # buffers, which lands on the first big allocation); the second pass is
    # the steady-state throughput. Both walls are reported.
    t0 = time.time()
    acc = detect_breakpoint(ref, fq1, fq2, "bench", out, cfg=cfg)
    wall_cold = time.time() - t0
    t0 = time.time()
    acc = detect_breakpoint(ref, fq1, fq2, "bench", out, cfg=cfg)
    wall = time.time() - t0

    rows, _, _ = formats.read_acc_csv(acc)
    called = [
        (r["from_ref"], int(r["from_pos"]), r["to_ref"], int(r["to_pos"]))
        for r in rows
    ]
    score = evaluate.score_bkps(evaluate.truth_to_bkps(truth), called)

    pairs_per_sec = n_pairs / wall
    print(json.dumps({
        "metric": "bkp_pairs_per_sec",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
        "wall_s": round(wall, 1),
        "wall_cold_s": round(wall_cold, 1),
        "n_pairs": n_pairs,
        "recall": score.recall,
        "fdr": score.fdr,
        "f1": score.f1,
        "k": k,
        "platform": platform,
    }))


if __name__ == "__main__":
    main()
