#!/usr/bin/env python3
"""Pre-snapshot TPU smoke (r2 VERDICT ask #2b): never ship a red bench.

Runs the full bkp pipeline ON THE REAL CHIP at the small fixture but with
the PRODUCTION k=32 configuration — which allocates the production-size
resident structures (3 x 2 GB packed count tables, the 2^28-int rank-map
wp) regardless of fixture size, so tiling/HBM blowups of the k>30 path
reproduce here in ~a minute instead of at the driver's bench. Exits 0 iff
the bench JSON line parses, recall == 1.0, and HBM peak stays under the
chip budget.

Usage:  python tools/tpu_smoke.py      (honors LHT_BENCH_K, default 32)
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    env = dict(os.environ)
    env.setdefault("LHT_BENCH_SCALE", "species20")
    env.setdefault("LHT_BENCH_K", "32")
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, env=env, timeout=3600)
    line = (p.stdout.strip().splitlines() or [""])[-1]
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-4000:] + "\nSMOKE FAILED: bench rc != 0\n")
        return 1
    try:
        rec = json.loads(line)
    except json.JSONDecodeError:
        sys.stderr.write(f"SMOKE FAILED: no JSON line: {line!r}\n")
        return 1
    ok = True
    if rec.get("recall", 0) < 1.0:
        sys.stderr.write(f"SMOKE FAILED: recall {rec.get('recall')}\n")
        ok = False
    hbm = rec.get("hbm_peak_gb")
    if hbm is not None and hbm > 15.0:
        sys.stderr.write(f"SMOKE FAILED: hbm_peak_gb {hbm}\n")
        ok = False
    print(json.dumps(rec))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
