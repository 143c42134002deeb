"""Stage-A count-table checkpointing + comparator-scoring harness tests."""

import numpy as np

from localhgt_tpu.config import Config, KmerConfig
from localhgt_tpu.ops import encode
from localhgt_tpu.pipeline import extract
from localhgt_tpu.sim import evaluate
from localhgt_tpu.sim.simulate import SimParams, simulate_sample


def test_count_checkpoint_roundtrip(tmp_path):
    out = str(tmp_path)
    pa = SimParams(n_genomes=3, genome_len=12_000, hgt_num=1, depth=6,
                   snp_rate=0.01, seed=5)
    _, fq1, fq2, _ = simulate_sample(out, "ck", pa)
    cfg = Config().replace(kmer=KmerConfig(k=16),
                           count_ckpt=str(tmp_path / "ckpt"))
    masks, _ = encode.hasher_for(cfg.kmer.k, cfg.kmer.coder_num,
                                 cfg.kmer.seed)
    t1, ratio1, n1, cache1 = extract.count_kmers(fq1, fq2, masks, cfg)
    ck = extract._count_ckpt_path(fq1, fq2, cfg)
    import os
    assert os.path.isfile(ck)
    # resume: identical tables, cache dropped (vote re-streams)
    t2, ratio2, n2, cache2 = extract.count_kmers(fq1, fq2, masks, cfg)
    assert cache2 is None
    assert ratio2 == ratio1 and n2 == n1
    for a, b in zip(t1, t2):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # a parameter change keys a different checkpoint
    cfg3 = cfg.replace(kmer=KmerConfig(k=16, seed=2))
    assert extract._count_ckpt_path(fq1, fq2, cfg3) != ck


def test_comparator_readers(tmp_path):
    lemon = tmp_path / "lemon.csv"
    lemon.write_text(
        "from_ref,from_pos,to_ref,to_pos\n"
        "g1_c1,100,g2_c1,200,extra\n"
        "g1_c1,100,g2_c1,200,dup-collapses\n"
        "g3_c1,50,g4_c1,75\n"
    )
    calls = evaluate.read_comparator_csv(str(lemon))
    assert calls == [("g1_c1", 100, "g2_c1", 200), ("g3_c1", 50, "g4_c1", 75)]

    acc = tmp_path / "s.acc.csv"
    # 16-column schema; col14 = cross_split_reads (accurate_bkp.py:921-933)
    row_hi = ["g1_c1", "100", "h", "+", "g2_c1", "200", "t", "-",
              "AAAA", "TTTT", "0.0", "0.0", "2", "3", "5", "10"]
    row_lo = ["g5_c1", "10", "h", "+", "g6_c1", "20", "t", "-",
              "AAAA", "TTTT", "0.0", "0.0", "0", "0", "0", "1"]
    acc.write_text(
        "# the number of reads: 1000000; insert size: 300\n"
        + ",".join(["from_ref"] + ["x"] * 15) + "\n"
        + ",".join(row_hi) + "\n" + ",".join(row_lo) + "\n"
    )
    # cutoff 1e-6: row_hi passes (5e-6), row_lo (0) is dropped
    calls = evaluate.read_localhgt_csv(str(acc), abun_cutoff=1e-6)
    assert calls == [("g1_c1", 100, "g2_c1", 200)]
    # deep_flag drops same-genome pairs
    calls = evaluate.read_localhgt_csv(str(acc), abun_cutoff=0.0,
                                       deep_flag=True)
    assert ("g5_c1", 10, "g6_c1", 20) in calls


def test_compare_tools_table(tmp_path):
    from localhgt_tpu.sim.simulate import TruthEvent

    truth = [TruthEvent(receptor="r_c1", insert_locus=500, donor="d_c1",
                        seg_start=100, seg_end=900, reverse=False)]
    good = tmp_path / "good.csv"
    good.write_text("r_c1,510,d_c1,105\nr_c1,495,d_c1,895\n")
    bad = tmp_path / "bad.csv"
    bad.write_text("zz_c1,1,qq_c1,2\n")
    rows = evaluate.compare_tools(
        truth, {"good": (str(good), "generic"), "bad": (str(bad), "generic")})
    assert rows["good"]["recall"] == 1.0 and rows["good"]["fdr"] == 0.0
    assert rows["bad"]["recall"] == 0.0
