#!/usr/bin/env python3
"""Benchmark: end-to-end HGT breakpoint detection throughput on one chip.

Default workload (LHT_BENCH_SCALE=big): 100 genomes / ~100 Mbp reference /
~1.7M read pairs at the reference's default k=32 — a size where one-time
costs (compile, cache warmup, tunnel buffer reclamation) are <10% of wall,
approximating the reference's headline workload shape (a human-gut sample
vs a large reference, README.md:6). LHT_BENCH_SCALE=species20 keeps the
small smoke fixture for quick iteration.

Prints ONE JSON line:

    {"metric": "bkp_pairs_per_sec", "value": N, "unit": "pairs/s",
     "vs_baseline": R, "stage_walls": {...}, "hbm_peak_gb": ..., ...}

Baseline anchor: the reference processes a human-gut sample (~13M read
pairs at the 2 Gbp down-sample) in ~2 h on 10 CPU threads (README.md:6) ==
~1800 pairs/s end-to-end. vs_baseline = ours / 1800.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PAIRS_PER_SEC = 13_000_000 / (2 * 3600.0)

SCALES = {
    # name: (n_genomes, genome_len, hgt_num, depth, two-pass?)
    "species20": (20, 150_000, 10, 10, True),
    "big": (100, 1_000_000, 50, 5, False),
    # scale proof (r2 VERDICT ask #3): >= 1 Gbp reference / >= 10M pairs —
    # the headline workload's shape (multi-Gbp UHGG, 13M pairs at the 2 Gbp
    # down-sample). One-pass; run as LHT_BENCH_SCALE=scale1g python bench.py,
    # recorded in reports/SCALE_r3.json
    "scale1g": (205, 5_000_000, 100, 3, False),
}


def _fixture(out, scale, pa_cls, simulate_sample):
    """Simulate (or reuse) the fixture; big fixtures are cached on disk."""
    name = f"bench_{scale}"
    ref = os.path.join(out, f"{name}.ref.fa")
    fq1 = os.path.join(out, f"{name}.1.fq")
    fq2 = os.path.join(out, f"{name}.2.fq")
    truth = os.path.join(out, f"{name}.true.sv.txt")
    n_genomes, genome_len, hgt, depth, _ = SCALES[scale]
    if (not os.environ.get("LHT_BENCH_REGEN")
            and all(os.path.isfile(p) for p in (ref, fq1, fq2, truth))):
        return ref, fq1, fq2, truth
    pa = pa_cls(n_genomes=n_genomes, genome_len=genome_len, hgt_num=hgt,
                depth=depth, snp_rate=0.01, seed=42)
    return simulate_sample(out, name, pa)


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

    from localhgt_tpu.config import Config, KmerConfig
    from localhgt_tpu.sim import evaluate
    from localhgt_tpu.sim.simulate import SimParams, read_truth, simulate_sample
    from localhgt_tpu.utils import formats, metrics

    dev = jax.devices()[0]
    platform = dev.platform

    scale = os.environ.get("LHT_BENCH_SCALE", "big")
    two_pass = SCALES[scale][4]
    out = "/tmp/lht_bench"
    os.makedirs(out, exist_ok=True)
    t_sim = time.time()
    ref, fq1, fq2, truth_path = _fixture(out, scale, SimParams,
                                         simulate_sample)
    sim_wall = time.time() - t_sim
    truth = read_truth(truth_path)
    n_pairs = sum(1 for _ in open(fq1)) // 4

    # k=32 is the reference default (scripts/localhgt.py:56): 3 packed
    # int32-word tables (3 x 2 GB) + the two-choice bucket vote path.
    k = int(os.environ.get("LHT_BENCH_K", "32"))
    cfg = Config().replace(kmer=KmerConfig(k=k))

    from localhgt_tpu.pipeline.bkp import detect_breakpoint

    # First pass absorbs one-time costs (XLA compile on a cold cache; the
    # tunneled device's reclamation of previous clients' buffers). On the
    # big fixture those are <10% of wall, so a single timed pass suffices;
    # the small fixture keeps the two-pass cold/steady split.
    t0 = time.time()
    acc = detect_breakpoint(ref, fq1, fq2, "bench", out, cfg=cfg)
    wall_cold = time.time() - t0
    if two_pass:
        metrics.reset()
        t0 = time.time()
        acc = detect_breakpoint(ref, fq1, fq2, "bench", out, cfg=cfg)
        wall = time.time() - t0
    else:
        wall = wall_cold

    rows, _, _ = formats.read_acc_csv(acc)
    called = [
        (r["from_ref"], int(r["from_pos"]), r["to_ref"], int(r["to_pos"]))
        for r in rows
    ]
    score = evaluate.score_bkps(evaluate.truth_to_bkps(truth), called)

    pairs_per_sec = n_pairs / wall
    rec = {
        "metric": "bkp_pairs_per_sec",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
        "wall_s": round(wall, 1),
        "wall_cold_s": round(wall_cold, 1),
        "sim_wall_s": round(sim_wall, 1),
        "n_pairs": n_pairs,
        "recall": score.recall,
        "fdr": score.fdr,
        "f1": score.f1,
        "k": k,
        "scale": scale,
        "platform": platform,
        "stage_walls": metrics.stage_walls(),
    }
    rec.update(metrics.device_memory_stats())
    rec.update(evaluate.resource_usage())  # host CPU time + max RSS
    rec.update(metrics.derived(n_pairs, 150, cfg.kmer.coder_num))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
