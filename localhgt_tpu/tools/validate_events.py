"""Long-read / assembly validation of called HGT events.

Port of the paper harness's validation idea (paper_results/
validate_bkp_match.py docstring :3-9): reconstruct the predicted recipient
sequence — donor segment [delete_start, delete_end) inserted at insert_locus
(reverse-complemented when reverse_flag) — and check that long reads (or
assembled contigs) from the sample align contiguously ACROSS both junctions,
which only happens if the event is real.

Alignment uses the framework's own SW kernel instead of minimap2: for each
event and each candidate long read, score the read against the reconstructed
junction windows; a validation passes when a read covers a junction with
>= min_span bases on both sides at >= min_identity.

    python -m localhgt_tpu.tools.validate_events \
        -r ref.fa -e events.csv --long-reads lr.fq -o validated.csv
"""

from __future__ import annotations

import argparse
import csv

import numpy as np

from localhgt_tpu.io import fasta, fastq
from localhgt_tpu.ops import coder


def reconstruct_junctions(contigs: fasta.Contigs, receptor: str, locus: int,
                          donor: str, ds: int, de: int, reverse: bool,
                          flank: int = 500):
    """Return the two junction sequences (codes) of the predicted insertion:
    [receptor_left + seg_start_side] and [seg_end_side + receptor_right]."""
    rid = contigs.contig_id(receptor)
    did = contigs.contig_id(donor)
    seg = contigs.slice_codes(did, ds, de)
    if reverse:
        seg = coder.COMPLEMENT[seg][::-1]
    left = contigs.slice_codes(rid, max(0, locus - flank), locus)
    right = contigs.slice_codes(rid, locus, locus + flank)
    j1 = np.concatenate([left, seg[:flank]])
    j2 = np.concatenate([seg[-flank:], right])
    return j1, j2


def validate(ref_path: str, events_csv: str, long_reads_fq: str,
             min_span: int = 200, min_identity: float = 0.85,
             flank: int = 500, max_reads: int = 20000):
    import jax.numpy as jnp

    from localhgt_tpu.ops import sw

    contigs = fasta.read_fasta(ref_path)
    events = []
    with open(events_csv) as f:
        for row in csv.DictReader(f):
            events.append(row)

    reads = []
    for b in fastq.iter_fastq_batches(long_reads_fq, batch_reads=4096,
                                      max_len=4096):
        for i in range(b.n):
            reads.append(b.codes[i, : b.lengths[i]])
            if len(reads) >= max_reads:
                break
        if len(reads) >= max_reads:
            break

    results = []
    for ev in events:
        j1, j2 = reconstruct_junctions(
            contigs, ev["receptor"], int(ev["insert_locus"]), ev["donor"],
            int(ev["delete_start"]), int(ev["delete_end"]),
            ev["reverse_flag"] in ("True", "true", "1"), flank,
        )
        support = [0, 0]
        for jidx, junction in enumerate((j1, j2)):
            jlen = len(junction)
            mid = jlen // 2
            # score each long read (and its revcomp) against the junction
            for rd in reads:
                if len(rd) < 2 * min_span:
                    continue
                for q in (rd, coder.COMPLEMENT[rd][::-1]):
                    W = min(len(q), jlen)
                    out = sw.sw_align_tiled(
                        q[None, :W], junction[None, :jlen]
                    )
                    span_l = mid - out["rstart"][0]
                    span_r = out["rend"][0] - mid
                    ident = out["score"][0] / max(
                        out["rend"][0] - out["rstart"][0] + 1, 1
                    )
                    if span_l >= min_span and span_r >= min_span and \
                       ident >= min_identity:
                        support[jidx] += 1
                        break
        results.append({**ev, "junction1_reads": support[0],
                        "junction2_reads": support[1],
                        "validated": support[0] > 0 and support[1] > 0})
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-r", required=True, help="reference FASTA")
    ap.add_argument("-e", required=True, help="events CSV from `event`")
    ap.add_argument("--long-reads", required=True, help="long-read FASTQ")
    ap.add_argument("-o", default="validated_events.csv")
    ap.add_argument("--min-span", type=int, default=200)
    ap.add_argument("--min-identity", type=float, default=0.85)
    a = ap.parse_args(argv)
    rows = validate(a.r, a.e, a.long_reads, a.min_span, a.min_identity)
    if rows:
        with open(a.o, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
    print(f"{sum(r['validated'] for r in rows)}/{len(rows)} events validated")


if __name__ == "__main__":
    main()
