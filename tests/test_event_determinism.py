"""`localhgt event` must be run-to-run deterministic even when the cohort
exceeds pop_sample (r2 VERDICT ask #7): the reference's ambiguity check
subsamples the cohort with an UNSEEDED shuffle (infer_HGT_event.py:258), so
its output can differ between runs; this framework seeds it."""

import os

import numpy as np

from localhgt_tpu.config import EventConfig
from localhgt_tpu.pipeline.event import detect_event


def _write_fixture(d):
    ref = os.path.join(d, "ref.fa")
    rng = np.random.default_rng(3)
    with open(ref, "w") as f:
        for g in ("gA_1", "gB_1", "gC_1"):
            f.write(f">{g}\n")
            f.write("".join("ACGT"[i] for i in rng.integers(0, 4, 60_000)))
            f.write("\n")
    cols = ("from_ref,from_pos,from_side,from_strand,"
            "to_ref,to_pos,to_side,to_strand,if_reverse,"
            "read_seq,ref_seq,similarity,from_split_reads,to_split_reads,"
            "cross_split_reads,pair_end")
    # every sample shares one matched breakpoint pair (a tail->head event
    # joining gA into gB), but each adds noise bkps at sample-specific donor
    # positions so the ambiguity subsample actually varies with the chosen
    # cohort subset
    for s in range(12):
        p = os.path.join(d, f"s{s}.acc.csv")
        with open(p, "w") as f:
            f.write(f"# the number of reads is: 100000; "
                    f"the insert size is: 350\n{cols}\n")
            f.write(f"gA_1,30000,head,+,gB_1,{10000 + s * 37},tail,+,False,"
                    f"s,s,0.99,5,5,6,10\n")
            f.write(f"gA_1,30010,head,+,gB_1,{22000 + s * 53},head,+,False,"
                    f"s,s,0.99,5,5,6,10\n")
            f.write(f"gC_1,15000,tail,-,gB_1,{30000 + s * 91},head,+,False,"
                    f"s,s,0.99,4,4,5,8\n")
    return ref


def test_event_output_identical_across_runs(tmp_path):
    d = str(tmp_path)
    ref = _write_fixture(d)
    cfg = EventConfig(min_split_reads=2, min_hgt_len=100, pop_sample=4)
    out1 = os.path.join(d, "e1.csv")
    out2 = os.path.join(d, "e2.csv")
    detect_event(ref, d, out1, cfg)
    detect_event(ref, d, out2, cfg)
    assert open(out1).read() == open(out2).read()
