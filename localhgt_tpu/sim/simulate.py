"""HGT truth-sample simulator.

Re-implements the recipe of the reference's paper harness
(paper_results/simulation.py): pick contig pairs from different species,
transplant a random 500-55,000 bp donor segment into the recipient (50%
reverse-complemented, donor optionally retained with the segment deleted),
add SNPs and indels, then synthesize paired-end reads at a target depth.
Truth is written in the same `<sample>.true.sv.txt` format
(simulation.py:201-270: recipient, insert_locus, donor, seg_start, seg_end,
reverse_flag) so the evaluator is interchangeable.

Reads are generated with a simple uniform-coverage Illumina-like model
(art_illumina is not available in this environment; simulation.py:280-306
shells out to it). Base quality is constant; a per-base error rate is applied.
Genomes can be synthetic random sequences (for unit fixtures) or loaded from a
FASTA.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from localhgt_tpu.io import fasta
from localhgt_tpu.ops import coder


def revcomp(seq: str) -> str:
    return seq[::-1].translate(str.maketrans("ACGTacgt", "TGCAtgca"))


@dataclass
class SimParams:
    """Defaults follow the species20 smoke fixture (README.md:57-63,
    simulation.py Parameters:819-891): 20 genomes, 20 HGT events, snp 0.01,
    depth 5-30, 150 bp reads, 350 bp fragments."""

    n_genomes: int = 20
    genome_len: int = 120_000
    hgt_num: int = 10
    snp_rate: float = 0.01
    indel_rate: float = 0.001   # snp/10 (simulation.py Parameters)
    depth: float = 10.0
    read_len: int = 150
    mean_frag: int = 350
    frag_sd: int = 10
    seq_error: float = 0.002
    min_hgt_len: int = 500
    max_hgt_len: int = 55_000
    donor_in: bool = True       # donor genome retained in the sample
    reverse_prob: float = 0.5
    seed: int = 0


@dataclass
class TruthEvent:
    receptor: str
    insert_locus: int
    donor: str
    seg_start: int
    seg_end: int
    reverse: bool


def random_genomes(pa: SimParams, rng) -> dict[str, str]:
    """Synthetic species: 'G<i>_1' so genome-of-contig = name minus last '_'
    field (infer_HGT_event.py:38-39 convention)."""
    out = {}
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    for i in range(pa.n_genomes):
        ln = int(pa.genome_len * (0.8 + 0.4 * rng.random()))
        seq = lut[rng.integers(0, 4, ln)].tobytes().decode()
        out[f"G{i:03d}_1"] = seq
    return out


def implant_hgts(genomes: dict[str, str], pa: SimParams, rng):
    """Returns (edited genomes, truth list). Mirrors random_HGT
    (simulation.py:201-270): one HGT per involved contig, segment bounds at
    least 500 from the ends."""
    new = dict(genomes)
    names = list(genomes)
    used: set[str] = set()
    truth: list[TruthEvent] = []
    tries = 0
    while len(truth) < pa.hgt_num and tries < 10_000:
        tries += 1
        a, b = rng.choice(len(names), 2, replace=False)
        rec, don = names[a], names[b]
        if rec in used or don in used:
            continue
        rec_seq, don_seq = new[rec], new[don]
        max_len = min(pa.max_hgt_len, len(don_seq) - 1200)
        if max_len <= pa.min_hgt_len + 1:
            continue
        seg_len = int(rng.integers(pa.min_hgt_len + 100, max_len))
        s = int(rng.integers(500, len(don_seq) - seg_len - 500))
        e = s + seg_len
        locus = int(rng.integers(500, len(rec_seq) - 500))
        seg = don_seq[s:e]
        rev = bool(rng.random() < pa.reverse_prob)
        if rev:
            seg = revcomp(seg)
        new[rec] = rec_seq[:locus] + seg + rec_seq[locus:]
        if pa.donor_in:
            new[don] = don_seq[:s] + don_seq[e:]
        else:
            del new[don]
        used.update((rec, don))
        truth.append(TruthEvent(rec, locus, don, s, e, rev))
    return new, truth


def mutate(seq: str, pa: SimParams, rng) -> str:
    """SNPs then indels at the configured rates (simulation.py:29-73)."""
    arr = np.frombuffer(seq.encode(), dtype=np.uint8).copy()
    n_snp = int(len(arr) * pa.snp_rate)
    if n_snp:
        pos = rng.choice(len(arr), n_snp, replace=False)
        shift = rng.integers(1, 4, n_snp).astype(np.uint8)
        lut = np.frombuffer(b"ACGT", dtype=np.uint8)
        inv = np.zeros(256, np.uint8)
        inv[lut] = np.arange(4)
        arr[pos] = lut[(inv[arr[pos]] + shift) % 4]
    n_ind = int(len(arr) * pa.indel_rate)
    if n_ind:
        s = arr.tobytes().decode()
        pieces = []
        last = 0
        luts = "ACGT"
        for p in sorted(rng.choice(len(s) - 1, n_ind, replace=False).tolist()):
            pieces.append(s[last:p])
            if rng.random() < 0.5:
                last = p + 1  # deletion
            else:
                pieces.append(luts[int(rng.integers(0, 4))])  # insertion
                last = p
        pieces.append(s[last:])
        return "".join(pieces)
    return arr.tobytes().decode()


def synthesize_reads(genomes: dict[str, str], pa: SimParams, rng):
    """Uniform-coverage paired-end reads. Returns (reads1, reads2) as lists of
    (name, seq) with mate1/mate2 orientation FR like Illumina."""
    r1, r2 = [], []
    lut = "ACGT"
    for chrom, seq in genomes.items():
        n_pairs = int(len(seq) * pa.depth / (2 * pa.read_len))
        if n_pairs == 0 or len(seq) < pa.mean_frag + 20:
            continue
        frags = rng.normal(pa.mean_frag, pa.frag_sd, n_pairs).astype(int)
        np.clip(frags, pa.read_len + 2, min(len(seq) - 1, 2 * pa.mean_frag), out=frags)
        starts = rng.integers(0, len(seq) - frags, n_pairs)
        for i in range(n_pairs):
            f = int(frags[i])
            s = int(starts[i])
            frag = seq[s : s + f]
            fwd = frag[: pa.read_len]
            rev = revcomp(frag)[: pa.read_len]
            if rng.random() < 0.5:
                m1, m2 = fwd, rev
            else:
                m1, m2 = rev, fwd
            m1 = _apply_errors(m1, pa, rng, lut)
            m2 = _apply_errors(m2, pa, rng, lut)
            name = f"{chrom}-{s}-{i}"
            r1.append((name, m1))
            r2.append((name, m2))
    return r1, r2


def _apply_errors(seq: str, pa: SimParams, rng, lut: str) -> str:
    if pa.seq_error <= 0:
        return seq
    arr = list(seq)
    n_err = rng.binomial(len(arr), pa.seq_error)
    for p in rng.choice(len(arr), n_err, replace=False):
        arr[p] = lut[int(rng.integers(0, 4))]
    return "".join(arr)


def write_fastq(path: str, reads, qual_char: str = "I"):
    with open(path, "w") as f:
        for name, seq in reads:
            f.write(f"@{name}\n{seq}\n+\n{qual_char * len(seq)}\n")


def write_truth(path: str, truth: list[TruthEvent]):
    """Same column layout as <sample>.true.sv.txt (simulation.py:253-254)."""
    with open(path, "w") as f:
        for t in truth:
            f.write(
                f"{t.receptor} {t.insert_locus} {t.donor} {t.seg_start} "
                f"{t.seg_end} {t.reverse}\n"
            )


def read_truth(path: str) -> list[TruthEvent]:
    out = []
    for line in open(path):
        a = line.split()
        if len(a) >= 6:
            out.append(
                TruthEvent(a[0], int(a[1]), a[2], int(a[3]), int(a[4]),
                           a[5] in ("True", "true", "1"))
            )
    return out


def simulate_sample(outdir: str, sample: str, pa: SimParams,
                    ref_genomes: dict[str, str] | None = None):
    """Full fixture: reference FASTA + truth + paired FASTQs.

    Returns (ref_path, fq1, fq2, truth_path).
    """
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(pa.seed)
    genomes = ref_genomes if ref_genomes is not None else random_genomes(pa, rng)
    ref_path = os.path.join(outdir, f"{sample}.ref.fa")
    fasta.write_fasta(ref_path, list(genomes.items()))

    edited, truth = implant_hgts(genomes, pa, rng)
    edited = {c: mutate(s, pa, rng) for c, s in edited.items()}
    truth_path = os.path.join(outdir, f"{sample}.true.sv.txt")
    write_truth(truth_path, truth)

    r1, r2 = synthesize_reads(edited, pa, rng)
    fq1 = os.path.join(outdir, f"{sample}.1.fq")
    fq2 = os.path.join(outdir, f"{sample}.2.fq")
    write_fastq(fq1, r1)
    write_fastq(fq2, r2)
    return ref_path, fq1, fq2, truth_path
