"""k-mer table occupancy analyzer (port of component N7).

Re-implements the offline study tool src/count_diff_kmer.cpp +
paper_results/count_table_empty_with_k.py: for a given FASTQ sample, k range
and down-sampling ratios, report the empty rate and the "weak" rate (entries
below the saturation depth) of the 2^k canonical-hash count table — the
evidence behind the reference's choice of k=32 (cal_tab_empty_rate,
src/count_diff_kmer.cpp:26-50).

    python -m localhgt_tpu.tools.kmer_stats --fq1 s.1.fq --fq2 s.2.fq \
        --kmin 16 --kmax 24
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def table_stats(fq1: str, fq2: str | None, k: int, ratio: float = 1.0,
                seed: int = 1, coder_num: int = 3, least_depth: int = 3):
    import jax.numpy as jnp

    from localhgt_tpu.io import fastq
    from localhgt_tpu.ops import count, encode

    masks, _ = encode.hasher_for(k, coder_num, seed)
    masks_j = jnp.asarray(masks)
    tables = tuple(count.make_table(k) for _ in range(coder_num))
    paths = [p for p in (fq1, fq2) if p]
    for path in paths:
        for b in fastq.iter_fastq_batches(path):
            acc = fastq.accept_mask(b.start_ordinal, b.n, ratio, seed)
            tables = count.count_reads_step(
                tables, jnp.asarray(b.codes), jnp.asarray(b.lengths),
                jnp.asarray(acc), masks_j, k, least_depth,
            )
    out = []
    size = 1 << k
    for i, t in enumerate(tables):
        t = np.asarray(t)
        if count.is_packed(t):  # k > 30: eight 4-bit fields per int32 word
            t = np.stack([(t >> (4 * f)) & 15 for f in range(8)],
                         -1).reshape(-1).astype(np.int8)
        empty = int((t == 0).sum())
        weak = int((t != least_depth).sum())
        out.append({
            "k": k, "hash": i, "ratio": ratio, "table_size": size,
            "empty_rate": empty / size, "weak_rate": weak / size,
        })
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fq1", required=True)
    ap.add_argument("--fq2", default=None)
    ap.add_argument("--kmin", type=int, default=16)
    ap.add_argument("--kmax", type=int, default=26)
    ap.add_argument("--ratios", type=float, nargs="*", default=[1.0])
    ap.add_argument("--seed", type=int, default=1)
    a = ap.parse_args(argv)
    for k in range(a.kmin, a.kmax + 1, 2):
        for r in a.ratios:
            for row in table_stats(a.fq1, a.fq2, k, r, a.seed):
                print(json.dumps(row))


if __name__ == "__main__":
    main()
