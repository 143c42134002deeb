#!/usr/bin/env python3
"""Benchmark: end-to-end HGT breakpoint detection throughput on one chip.

Default workload (LHT_BENCH_SCALE=big): 100 genomes / ~100 Mbp reference /
~1.7M read pairs at the reference's default k=32, two-pass (pass 1 absorbs
the one-time server-side compile/executable-load costs, which measured
70-400 s per process through the axon tunnel — NOT <10% of wall; see
SCALES), approximating the reference's headline workload shape (a
human-gut sample vs a large reference, README.md:6). The JSON records the
pass mode (`two_pass`) so rounds are methodologically comparable.
LHT_BENCH_SCALE=species20 keeps the small smoke fixture for quick
iteration; LHT_BENCH_SCALE=scale1g is the >=1 Gbp / >=10M-pair scale
proof (recorded to reports/SCALE_r5.json).

Prints ONE JSON line:

    {"metric": "bkp_pairs_per_sec", "value": N, "unit": "pairs/s",
     "vs_baseline": R, "stage_walls": {...}, "hbm_peak_gb": ..., ...}

Baseline anchor: the reference processes a human-gut sample (~13M read
pairs at the 2 Gbp down-sample) in ~2 h on 10 CPU threads (README.md:6) ==
~1800 pairs/s end-to-end. vs_baseline = ours / 1800.

Run hygiene (the round-3 capture was silently contended by a stray
scale1g job sharing the chip AND the output paths):
  * an exclusive flock on /tmp/lht_bench/.bench.lock serializes benches —
    a held lock fails loudly after LHT_BENCH_LOCK_TIMEOUT (default 120 s)
    instead of timing a contended run;
  * a preflight scans /proc for OTHER live TPU-attached processes and
    aborts with an error JSON naming them (override: LHT_BENCH_FORCE=1);
  * every scale writes into its own outdir (/tmp/lht_bench/run_<scale>)
    with a per-scale sample name, so concurrent scales cannot clobber
    each other's artifacts;
  * per-batch count dispatch walls are recorded in the JSON
    (count_batch_dispatch_s), so a 20x dispatch anomaly is diagnosable
    from the artifact alone.

--profile writes a jax profiler trace per stage under
/tmp/lht_bench/run_<scale>/trace and links it from the JSON.
"""

import fcntl
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PAIRS_PER_SEC = 13_000_000 / (2 * 3600.0)
FIXTURE_DIR = "/tmp/lht_bench"   # fixtures are shared and immutable
LOCK_PATH = os.path.join(FIXTURE_DIR, ".bench.lock")

SCALES = {
    # name: (n_genomes, genome_len, hgt_num, depth, two-pass?)
    # two-pass: pass 1 absorbs one-time costs (server-side XLA compile /
    # executable load through the axon tunnel — measured 70-400 s PER
    # PROCESS for the heavy programs even on a persistent-cache HIT, round-4
    # forensics in tools/micro_count.py), pass 2 is the steady-state number.
    # Both walls are reported (wall_s / wall_cold_s, vs_baseline /
    # vs_baseline_cold); the reference anchor (~1800 pairs/s over a 2 h run,
    # README.md:6) is itself a steady-state figure, and the one-time cost
    # amortizes over the 8x-larger headline sample.
    "species20": (20, 150_000, 10, 10, True),
    "big": (100, 1_000_000, 50, 5, True),
    # scale proof (r2 VERDICT ask #3): >= 1 Gbp reference / >= 10M pairs —
    # the headline workload's shape (multi-Gbp UHGG, 13M pairs at the 2 Gbp
    # down-sample). One-pass; run as LHT_BENCH_SCALE=scale1g python bench.py,
    # recorded in reports/SCALE_r5.json
    "scale1g": (205, 5_000_000, 100, 3, False),
}


def _fail(reason: str, **extra):
    rec = {"metric": "bkp_pairs_per_sec", "value": 0.0, "unit": "pairs/s",
           "vs_baseline": 0.0, "error": reason}
    rec.update(extra)
    print(json.dumps(rec))
    sys.exit(1)


def _other_tpu_processes():
    """PIDs (not us or our ancestors) that look attached to the TPU chip:
    their environ selects the axon platform, or they are another bench.py.
    A concurrent chip user invalidates any timing this process records."""
    me = os.getpid()
    ancestors = set()
    pid = me
    for _ in range(16):
        try:
            with open(f"/proc/{pid}/stat") as f:
                pid = int(f.read().split()[3])
        except (OSError, ValueError, IndexError):
            break
        if pid <= 1:
            break
        ancestors.add(pid)
    found = []
    for ent in os.listdir("/proc"):
        if not ent.isdigit():
            continue
        pid = int(ent)
        if pid == me or pid in ancestors:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(errors="replace").strip()
            with open(f"/proc/{pid}/environ", "rb") as f:
                env = f.read().decode(errors="replace")
        except OSError:
            continue
        if not cmd:
            continue
        # the axon tunnel daemon (.tpu_init.py) inherits JAX_PLATFORMS=axon
        # but IS the tunnel, not a chip client — never a contender
        if ".tpu_init" in cmd:
            continue
        tpuish = ("JAX_PLATFORMS=axon" in env and "python" in cmd) or \
            ("bench.py" in cmd)
        if tpuish:
            found.append({"pid": pid, "cmd": cmd[:160]})
    return found


def _acquire_lock(timeout_s: float):
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    fd = os.open(LOCK_PATH, os.O_CREAT | os.O_RDWR, 0o644)
    deadline = time.time() + timeout_s
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            os.ftruncate(fd, 0)
            os.write(fd, f"{os.getpid()}\n".encode())
            return fd
        except BlockingIOError:
            if time.time() >= deadline:
                try:
                    with open(LOCK_PATH) as f:
                        holder = f.read().strip()
                except OSError:
                    holder = "?"
                _fail("another bench holds the lock", lock_holder_pid=holder)
            time.sleep(2.0)


def _fixture(scale, pa_cls, simulate_sample):
    """Simulate (or reuse) the fixture; big fixtures are cached on disk."""
    name = f"bench_{scale}"
    ref = os.path.join(FIXTURE_DIR, f"{name}.ref.fa")
    fq1 = os.path.join(FIXTURE_DIR, f"{name}.1.fq")
    fq2 = os.path.join(FIXTURE_DIR, f"{name}.2.fq")
    truth = os.path.join(FIXTURE_DIR, f"{name}.true.sv.txt")
    n_genomes, genome_len, hgt, depth, _ = SCALES[scale]
    if (not os.environ.get("LHT_BENCH_REGEN")
            and all(os.path.isfile(p) for p in (ref, fq1, fq2, truth))):
        return ref, fq1, fq2, truth
    pa = pa_cls(n_genomes=n_genomes, genome_len=genome_len, hgt_num=hgt,
                depth=depth, snp_rate=0.01, seed=42)
    return simulate_sample(FIXTURE_DIR, name, pa)


def main():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/lht_jax_cache"
    )
    scale = os.environ.get("LHT_BENCH_SCALE", "big")
    two_pass = SCALES[scale][4]
    # unique outdir + sample name per scale: concurrent scales can never
    # clobber each other's artifacts (round-3 weak #1b)
    out = os.path.join(FIXTURE_DIR, f"run_{scale}")
    os.makedirs(out, exist_ok=True)
    sample = f"bench_{scale}"

    lock_timeout = float(os.environ.get("LHT_BENCH_LOCK_TIMEOUT", "120"))
    lock_fd = _acquire_lock(lock_timeout)

    others = _other_tpu_processes()
    if others and not os.environ.get("LHT_BENCH_FORCE"):
        _fail("concurrent TPU-attached process(es) detected; timing would "
              "be contended (set LHT_BENCH_FORCE=1 to override)",
              contention=others)

    profile = "--profile" in sys.argv[1:]
    trace_dir = None
    if profile:
        trace_dir = os.path.join(out, "trace")
        os.makedirs(trace_dir, exist_ok=True)
        os.environ["LHT_PROFILE"] = trace_dir

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

    t_sim = time.time()
    ref, fq1, fq2, truth_path = _fixture(scale, SimParams, simulate_sample)
    sim_wall = time.time() - t_sim
    truth = read_truth(truth_path)
    n_pairs = sum(1 for _ in open(fq1)) // 4

    # k=32 is the reference default (scripts/localhgt.py:56): 3 packed
    # int32-word tables (3 x 2 GB) + the two-choice bucket vote path.
    k = int(os.environ.get("LHT_BENCH_K", "32"))
    cfg = Config().replace(kmer=KmerConfig(k=k))

    from localhgt_tpu.pipeline.bkp import detect_breakpoint

    # Pass 1 absorbs one-time costs (server-side XLA compile / executable
    # load through the axon tunnel, 70-400 s per process even on a cache
    # hit — see SCALES); pass 2 is the steady-state number. Both walls are
    # reported (wall_s / wall_cold_s), and `two_pass` in the JSON records
    # which methodology produced the headline value.
    t0 = time.time()
    acc = detect_breakpoint(ref, fq1, fq2, sample, out, cfg=cfg)
    wall_cold = time.time() - t0
    if two_pass:
        metrics.reset()
        t0 = time.time()
        acc = detect_breakpoint(ref, fq1, fq2, sample, out, cfg=cfg)
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
        "vs_baseline_cold": round(
            n_pairs / wall_cold / BASELINE_PAIRS_PER_SEC, 3),
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
        "two_pass": bool(two_pass),
        "stage_walls": metrics.stage_walls(),
        "stage_rss_gb": metrics.stage_rss(),
    }
    series = metrics.series_stats()
    if series:
        rec["batch_series"] = series
    cnt = metrics.counters()
    if cnt:
        rec["counters"] = {k: round(v, 1) for k, v in cnt.items()}
    if trace_dir:
        rec["trace_dir"] = trace_dir
    rec.update(metrics.device_memory_stats())
    rec.update(evaluate.resource_usage())  # host CPU time + max RSS
    rec.update(metrics.derived(n_pairs, 150, cfg.kmer.coder_num))
    print(json.dumps(rec))

    # trend + scale-proof artifacts (repo-relative, committed by the build)
    repo = os.path.dirname(os.path.abspath(__file__))
    reports = os.path.join(repo, "reports")
    try:
        os.makedirs(reports, exist_ok=True)
        with open(os.path.join(reports, "perf_trend.jsonl"), "a") as f:
            f.write(json.dumps({"round": 5, **rec}) + "\n")
        if scale == "scale1g":
            with open(os.path.join(reports, "SCALE_r5.json"), "w") as f:
                json.dump(rec, f, indent=1)
    except OSError:
        pass
    os.close(lock_fd)


if __name__ == "__main__":
    main()
