"""Command-line interface — drop-in equivalent of the reference `localhgt`
CLI (scripts/localhgt.py:37-96): `bkp` and `event` subcommands with the same
flags and defaults.

    python -m localhgt_tpu.cli bkp -r ref.fa --fq1 s.1.fq --fq2 s.2.fq \
        -s sample -o outdir
    python -m localhgt_tpu.cli event -r ref.fa -b outdir -f events.csv
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lht_jax_cache")

from localhgt_tpu.config import Config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="localhgt",
        description="TPU-native LocalHGT: ultrafast HGT detection from "
        "large microbial communities",
    )
    sub = p.add_subparsers(dest="command")

    b = sub.add_parser("bkp", help="Detect HGT breakpoints from metagenomic "
                       "sequencing data.")
    b.add_argument("-r", required=True, help="reference FASTA")
    b.add_argument("--fq1", required=True)
    b.add_argument("--fq2", required=True)
    b.add_argument("-s", default="sample", help="sample name")
    b.add_argument("-o", default="./", help="output folder")
    b.add_argument("-k", type=int, default=32, help="kmer length")
    b.add_argument("-t", type=int, default=10, help="host threads")
    b.add_argument("-e", type=int, default=3, help="number of hash functions")
    b.add_argument("-a", type=int, default=1, help="retain multi-hit reads")
    b.add_argument("-q", type=int, default=20, help="min mapping quality")
    b.add_argument("--seed", type=int, default=1)
    b.add_argument("--use_kmer", type=int, default=1)
    b.add_argument("--hit_ratio", type=float, default=0.1)
    b.add_argument("--match_ratio", type=float, default=0.08)
    b.add_argument("--max_peak", type=int, default=300000000)
    b.add_argument("--sample", dest="sample_bp", type=float, default=2e9)
    b.add_argument("--read_info", type=int, default=1)
    b.add_argument("--refine_fq", type=int, default=0,
                   help="run fastp-equivalent read QC before detection")

    e = sub.add_parser("event", help="Infer complete HGT events from "
                       "detected breakpoints.")
    e.add_argument("-r", required=True, help="reference FASTA")
    e.add_argument("-b", required=True, help="folder with *.acc.csv files")
    e.add_argument("-f", default="complete_HGT_event.csv", help="output CSV")
    e.add_argument("-n", type=int, default=2, help="min split reads")
    e.add_argument("-m", type=int, default=500, help="min transfer length")
    return p


def config_from_args(a) -> Config:
    cfg = Config()
    kmer = dataclasses.replace(
        cfg.kmer, k=a.k, coder_num=a.e, seed=a.seed, sample=a.sample_bp
    )
    scan = dataclasses.replace(
        cfg.scan, hit_ratio=a.hit_ratio, match_ratio=a.match_ratio,
        max_peak=a.max_peak,
    )
    align = dataclasses.replace(cfg.align, min_mapq=a.q)
    bkp = dataclasses.replace(cfg.bkp, mapq_min=a.q, keep_xa=a.a)
    return cfg.replace(kmer=kmer, scan=scan, align=align, bkp=bkp, threads=a.t)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.command == "bkp":
        from localhgt_tpu.pipeline.bkp import detect_breakpoint

        detect_breakpoint(
            args.r, args.fq1, args.fq2, args.s, args.o,
            cfg=config_from_args(args),
            use_kmer=bool(args.use_kmer),
            read_info=bool(args.read_info),
            refine_fq=bool(args.refine_fq),
        )
        return 0
    if args.command == "event":
        import dataclasses as dc

        from localhgt_tpu.config import EventConfig
        from localhgt_tpu.pipeline.event import detect_event

        cfg = dc.replace(EventConfig(), min_split_reads=args.n,
                         min_hgt_len=args.m)
        detect_event(args.r, args.b, args.f, cfg)
        return 0
    build_parser().print_help()
    return 1


if __name__ == "__main__":
    sys.exit(main())
