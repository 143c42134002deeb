"""Tests for the downstream analysis package (SURVEY.md section 2.4)."""

import numpy as np
import pytest

from localhgt_tpu.analysis import (classifier, mechanism, microhomology,
                                   network, records, stats)
from localhgt_tpu.analysis.taxonomy import Taxonomy
from localhgt_tpu.io import fasta
from localhgt_tpu.ops import nw
from localhgt_tpu.utils import formats


# ---------- ops/nw kernel ----------

def test_nw_matches_oracle_random():
    rng = np.random.default_rng(7)
    B, M, N = 16, 48, 52
    q = rng.integers(0, 4, (B, M)).astype(np.uint8)
    r = rng.integers(0, 4, (B, N)).astype(np.uint8)
    r[::3, 10:10 + 24] = q[::3, 4:28]  # plant shared blocks
    s_d, m_d = nw.nw_max_ungapped(q, r)
    s_n, m_n = nw.nw_max_ungapped_np(q, r)
    np.testing.assert_array_equal(np.asarray(s_d), s_n)
    np.testing.assert_array_equal(np.asarray(m_d), m_n)


def test_nw_identical_seqs_full_run():
    rng = np.random.default_rng(1)
    q = rng.integers(0, 4, (2, 40)).astype(np.uint8)
    s, m = nw.nw_max_ungapped(q, q)
    assert np.all(np.asarray(m) == 40)
    assert np.all(np.asarray(s) == 80)  # match=2 each


def test_nw_gap_splits_run():
    # identical halves separated by an insertion in ref -> run = half length
    q = np.tile(np.array([0, 1, 2, 3], np.uint8), 10)[None]  # 40bp
    ins = np.full(6, 0, np.uint8)
    r = np.concatenate([q[0, :20], ins, q[0, 20:]])[None]
    _, m = nw.nw_max_ungapped(q, r)
    assert int(m[0]) == 20


# ---------- fixtures ----------

@pytest.fixture(scope="module")
def toy_cohort(tmp_path_factory):
    """Two-contig reference with a shared 30bp block at the junctions, plus
    acc.csv files for four samples across two phenotype groups."""
    td = tmp_path_factory.mktemp("ana")
    rng = np.random.default_rng(3)
    bases = "ACGT"
    homo = "".join(bases[i] for i in rng.integers(0, 4, 30))
    # large enough that random flank windows rarely overlap each other
    seqA = ("".join(bases[i] for i in rng.integers(0, 4, 470)) + homo
            + "".join(bases[i] for i in rng.integers(0, 4, 9500)))
    seqB = ("".join(bases[i] for i in rng.integers(0, 4, 700)) + homo
            + "".join(bases[i] for i in rng.integers(0, 4, 9270)))
    ref = td / "ref.fa"
    fasta.write_fasta(str(ref), [("gA_1", seqA), ("gB_1", seqB)])
    contigs = fasta.read_fasta(str(ref))

    # breakpoints at opposite ends of the shared block (as an aligner calls
    # them): from-flank ends with the block, to-flank starts with it, so the
    # semi-global overlap alignment traverses the 30 bp homology
    def acc_rows(n_extra):
        rows = []
        for i in range(1 + n_extra):
            rows.append([
                "gA_1", 401 + i, "right", "+", "gB_1", 801 + i, "left", "+",
                "False", "", "", "0.9", 4, 5, 6 + i, 7,
            ])
        return rows

    sdir = td / "cohort"
    sdir.mkdir()
    for si, (sid, extra) in enumerate(
            [("s1", 0), ("s2", 1), ("s3", 2), ("s4", 3)]):
        p = sdir / f"{sid}.acc.csv"
        with open(p, "w") as f:
            print("# the number of reads in the sample is: 100000; "
                  "Insert size is 300.", file=f)
            print(",".join(formats.HEADER), file=f)
            for r in acc_rows(extra):
                print(",".join(str(x) for x in r), file=f)
    return contigs, str(sdir), str(ref)


# ---------- records ----------

def test_load_cohort(toy_cohort):
    _, sdir, _ = toy_cohort
    samples = records.load_cohort(sdir)
    assert len(samples) == 4
    assert samples[0].reads_num == 100000
    b = samples[0].bkps[0]
    assert b.from_ref_genome == "gA" and b.to_ref_genome == "gB"
    assert b.pair_tag == "gA&gB"
    assert b.hgt_tag == "gA_1&4&gB_1&8"


def test_abundance_filter(toy_cohort):
    _, sdir, _ = toy_cohort
    # cutoff above cross_split_reads/reads_num = 6e-5 drops everything
    samples = records.load_cohort(sdir, abun_cutoff=1e-3)
    assert not samples


# ---------- microhomology ----------

def test_bkp_homology_detects_planted_block(toy_cohort):
    contigs, sdir, _ = toy_cohort
    samples = records.load_cohort(sdir)
    h = microhomology.bkp_homology(samples[0].bkps, contigs)
    # from-flank suffix and to-flank prefix share the 30bp planted block
    assert h[0] >= 30


def test_random_homology_is_short(toy_cohort):
    contigs, _, _ = toy_cohort
    r = microhomology.random_homology(contigs, 32, seed=5)
    assert len(r) == 32
    assert np.median(r) < 30


def test_find_mh():
    rng = np.random.default_rng(0)
    s1 = rng.integers(0, 4, 60).astype(np.uint8)
    s2 = rng.integers(0, 4, 60).astype(np.uint8)
    s2[20:25] = s1[22:27]  # 5-mer at offset diff 2
    assert microhomology.find_mh(s1, s2)
    assert not microhomology.find_mh(s1[:4], s2)


def test_compare_vs_random(toy_cohort):
    contigs, sdir, _ = toy_cohort
    samples = records.load_cohort(sdir)
    bkps = [b for s in samples for b in s.bkps]
    res = microhomology.compare_vs_random(bkps, contigs, n_random=64)
    assert res["hgt_mean"] >= 25
    assert res["random_mean"] < res["hgt_mean"]


# ---------- mechanism ----------

def test_classify_tree():
    assert mechanism.classify("ins", False, True, 0, 0) == "TEI"
    assert mechanism.classify("ins", True, False, 0, 0) == "VNTR"
    assert mechanism.classify("ins", False, False, 0, 0) == "NA"
    assert mechanism.classify("del", False, False, 12, 0) == "FoSTeS/MMBIR"
    assert mechanism.classify("del", False, False, 3, 0) == "NHEJ"
    assert mechanism.classify("del", False, False, 0, 150) == "NAHR"
    assert mechanism.classify("del", False, False, 0, 5) == "alt-EJ"
    assert mechanism.classify("del", False, False, 0, 1) == "NHEJ"


def test_classify_events(toy_cohort):
    contigs, _, _ = toy_cohort
    ev = mechanism.EventRow("s1", "gA_1", 471, "gB_1", 701, 950, "False")
    out = mechanism.classify_events([ev], contigs)
    assert out[0]["ins_mechanism"] == "NA"
    assert out[0]["del_mechanism"] in ("NHEJ", "alt-EJ", "NAHR")
    tei = {"gB_1": [(690, 710)]}
    out2 = mechanism.classify_events([ev], contigs, tei=tei)
    assert out2[0]["del_mechanism"] == "TEI"
    freq = mechanism.mechanism_frequency(out2)
    assert freq == {"TEI": 1.0}


# ---------- network ----------

def test_network_properties(toy_cohort):
    contigs, sdir, _ = toy_cohort
    samples = records.load_cohort(sdir)
    tax = Taxonomy()
    props, total = network.network_properties(samples[3], tax, "genome", 1)
    assert total == 1  # all bkps collapse to the single gA&gB edge tag
    assert props[4] == 2 and props[5] == 1  # 2 nodes, 1 edge

    # insufficient distinct edges -> zeros
    props0, total0 = network.network_properties(samples[0], tax, "genome", 5)
    assert total0 < 5 and props0 == [0, 0, 0, 0, 0, 0]


def test_compare_groups(toy_cohort):
    _, sdir, _ = toy_cohort
    samples = records.load_cohort(sdir)
    for s, dis in zip(samples, ["CRC", "CRC", "control", "control"]):
        s.disease = dis
    rows = network.compare_groups(samples, Taxonomy(), "CRC", "control",
                                  levels=[6])
    assert len(rows) == len(network.PROPERTIES)


# ---------- classifier ----------

def test_marker_selection_and_training():
    rng = np.random.default_rng(0)
    samples = []
    # group-specific junction: g1 carries tagA, g2 carries tagB
    for i in range(30):
        gi = i % 2
        s = records.SampleBkps(f"x{i}")
        s.disease = "CRC" if gi == 0 else "control"
        pos = 100 if gi == 0 else 900
        npos = int(rng.integers(0, 50))
        s.bkps.append(records.BkpRecord(
            "gA_1", pos, "right", "+", "gB_1", pos + npos % 20, "left", "+",
            "False", 0.9, 1, 1, 5, 1,
        ))
        samples.append(s)
    markers = classifier.select_markers(samples, "CRC", "control", 5)
    assert markers
    res = classifier.train_and_eval(samples, "CRC", "control", model="logreg")
    assert res["n_markers"] >= 1
    assert res["auc"] > 0.9


def test_roc_auc_perfect():
    assert classifier.roc_auc([0, 0, 1, 1], [0.1, 0.2, 0.8, 0.9]) == 1.0
    assert classifier.roc_auc([1, 1, 0, 0], [0.1, 0.2, 0.8, 0.9]) == 0.0


def test_undersample_balances():
    X = np.arange(20, dtype=np.float32)[:, None]
    y = np.array([0] * 15 + [1] * 5)
    Xb, yb = classifier.undersample(X, y)
    assert (yb == 0).sum() == (yb == 1).sum() == 5


# ---------- stats ----------

def test_stats_summary(toy_cohort):
    contigs, sdir, _ = toy_cohort
    samples = records.load_cohort(sdir)
    s = stats.summary(samples, contigs)
    assert s["n_samples"] == 4
    assert s["total_bkps"] == 1 + 2 + 3 + 4
    assert s["top_pairs"][0][0] == "gA&gB"
    for smp, dis in zip(samples, ["CRC", "CRC", "control", "control"]):
        smp.disease = dis
    t = stats.group_count_test(samples, "CRC", "control")
    assert t["n1"] == 2 and t["n2"] == 2
    assert np.isfinite(t["p_value"])


# ---------- taxonomy ----------

def test_taxonomy_metadata(tmp_path):
    meta = tmp_path / "meta.tsv"
    meta.write_text(
        "Genome\tLineage\n"
        "gA\td__Bacteria;p__Firmicutes;c__Bacilli;o__X;f__Y;g__Z;s__Z w\n"
    )
    tax = Taxonomy(str(meta))
    assert tax.taxon("gA", "phylum") == "p__Firmicutes"
    assert tax.taxon("gA", "genome") == "gA"
    assert tax.taxon("unknown", "phylum") == "unknown"
    b = records.BkpRecord("gA_1", 1, "r", "+", "gB_1", 2, "l", "+",
                          "False", 0.9, 1, 1, 5, 1)
    assert tax.edge_tag(b, "phylum") == "gB&p__Firmicutes"


# ---------- analyze CLI ----------

def test_analyze_cli_stats_and_microhomology(toy_cohort, tmp_path, capsys):
    from localhgt_tpu import cli

    contigs, sdir, ref = toy_cohort
    out = tmp_path / "stats.json"
    rc = cli.main(["analyze", "stats", "-b", sdir, "-r", ref,
                   "-f", str(out)])
    assert rc == 0
    import json

    st = json.loads(out.read_text())
    assert st["n_samples"] == 4

    out2 = tmp_path / "mh.json"
    rc = cli.main(["analyze", "microhomology", "-b", sdir, "-r", ref,
                   "--n-random", "32", "-f", str(out2)])
    assert rc == 0
    mh = json.loads(out2.read_text())
    assert mh["hgt_mean"] >= 25


# ---------- cohort drivers (LODO / KEGG / timeline) ----------

def _cohort_samples(n=40, seed=0):
    rng = np.random.default_rng(seed)
    samples = []
    for i in range(n):
        gi = i % 2
        s = records.SampleBkps(f"s{i}")
        s.disease = "CRC" if gi == 0 else "control"
        s.cohort = "cohortA" if i < n // 2 else "cohortB"
        pos = 100 if gi == 0 else 900
        npos = int(rng.integers(0, 20))
        s.bkps.append(records.BkpRecord(
            "gA_1", pos, "right", "+", "gB_1", pos + npos, "left", "+",
            "False", 0.9, 1, 1, 5, 1,
        ))
        samples.append(s)
    return samples


def test_lodo_cross_cohort():
    from localhgt_tpu.analysis import cohort

    samples = _cohort_samples()
    out = cohort.lodo(samples, "CRC", "control", marker_num=5)
    assert set(out["per_cohort"]) == {"cohortA", "cohortB"}
    # separable signal -> both held-out cohorts score well
    assert out["weighted_mean"] > 0.9
    import pytest as _pt
    with _pt.raises(ValueError):
        one = [s for s in samples if s.cohort == "cohortA"]
        cohort.lodo(one, "CRC", "control")


def test_kegg_enrichment_ranks_enriched_pathway():
    from localhgt_tpu.analysis import cohort

    ko_pathway = {f"K{i:05d}": ["map00010"] for i in range(10)}
    ko_pathway.update({f"K1{i:04d}": ["map99999"] for i in range(200)})
    input_kos = [f"K{i:05d}" for i in range(10)] + ["K10000"]
    background = list(ko_pathway)  # uniform background
    rows = cohort.kegg_enrichment(input_kos, background, ko_pathway)
    assert rows[0]["pathway"] == "map00010"
    assert rows[0]["p_adj"] < 0.05
    # 'ko'-prefixed pathways are skipped
    rows2 = cohort.kegg_enrichment(
        ["K1"], ["K1"], {"K1": ["ko00010", "map00010"]})
    assert all(r["pathway"] == "map00010" for r in rows2)


def test_bh_correction_monotone():
    from localhgt_tpu.analysis import cohort

    p = np.array([0.01, 0.02, 0.5, 0.04])
    q = cohort.benjamini_hochberg(p)
    assert np.all(q >= p) and np.all(q <= 1.0)
    order = np.argsort(p)
    assert np.all(np.diff(q[order]) >= -1e-12)


def test_timeline_fingerprint_separates_individuals():
    from localhgt_tpu.analysis import cohort

    rng = np.random.default_rng(3)
    samples = []
    # two individuals, 3 time points each; same individual shares tags
    for ind in range(2):
        base = 100 + 700 * ind
        for t in range(3):
            s = records.SampleBkps(f"i{ind}t{t}")
            for j in range(4):
                s.bkps.append(records.BkpRecord(
                    "gA_1", base + 100 * j, "right", "+",
                    "gB_1", base + 100 * j + 7, "left", "+",
                    "False", 0.9, 1, 1, 5, 1,
                ))
            # one random private tag so vectors are not identical
            priv = int(rng.integers(0, 5000))
            s.bkps.append(records.BkpRecord(
                "gC_1", priv * 13 + 1, "right", "+", "gD_1", priv * 17 + 3,
                "left", "+", "False", 0.9, 1, 1, 5, 1,
            ))
            samples.append(s)
    vectors, tags = cohort.profile_vectors(samples)
    assert len(tags) >= 8
    ind_of = {f"i{ind}t{t}": f"I{ind}" for ind in range(2) for t in range(3)}
    out = cohort.timeline_fingerprint(vectors, ind_of)
    assert out["n_same"] == 6 and out["n_diff"] == 9
    assert out["mean_same"] > out["mean_diff"]


def test_jaccard_share():
    from localhgt_tpu.analysis import cohort

    e1 = [("gA", 100, "gB", 500, 900, True)]
    e2 = [("gA", 110, "gB", 510, 890, True),
          ("gX", 1, "gY", 2, 3, False)]
    # one shared (within 50bp), one private in e2 -> 1 / (1 + 1)
    assert cohort.jaccard_share(e1, e2) == 0.5
    assert cohort.jaccard_share(e1, []) == 0.0


# ---------------------------------------------------------------------------
# transfer_gene (analyze_transfer_gene.py reusable core)
# ---------------------------------------------------------------------------


def _mk_events():
    from localhgt_tpu.analysis.mechanism import EventRow

    # same donor segment inserted at two distinct sites (multi-site seg),
    # plus a second segment seen once
    return [
        EventRow("s1", "gR_1", 5000, "gD_1", 10000, 14000, "False"),
        EventRow("s2", "gR_1", 9000, "gD_1", 10020, 14040, "True"),
        EventRow("s1", "gR_2", 700, "gD_2", 200, 900, "False"),
    ]


def test_transfer_times_counts_distinct_sites():
    from localhgt_tpu.analysis import transfer_gene as tg

    out = tg.transfer_times(_mk_events())
    # two segments: gD_1 tag (sites 50 and 90) and gD_2 tag (one site)
    assert out["n_segments"] == 2
    assert out["site_histogram"] == {1: 1, 2: 1}
    assert out["multiple_fraction"] == 0.5
    assert out["per_sample_multiple"] == 0  # multi-site only across samples


def test_gff_annotation_queries(tmp_path):
    from localhgt_tpu.analysis import transfer_gene as tg

    gff = tmp_path / "genes.gff"
    gff.write_text(
        "gD_1\tsrc\tCDS\t10100\t11000\t.\t+\t0\t"
        "ID=g1;product=tetracycline resistance protein\n"
        "gD_1\tsrc\tCDS\t13950\t16000\t.\t+\t0\t"
        "ID=g2;product=DNA integrase\n"
        "gD_1\tsrc\tCDS\t20000\t21000\t.\t+\t0\t"
        "ID=g3;product=hypothetical protein\n"
    )
    ann = tg.GffAnnotation(str(gff))
    # point query: within NEAR of g1's start
    hits = ann.genes_at_point("gD_1", 10050)
    assert any(h.get("ID") == "g1" for h in hits if isinstance(h, dict))
    assert ann.genes_at_point("missing_genome", 5) == ["NA"]
    # segment [10000, 14000]: g1 fully inside (covered), g2 only 50/2050
    # covered -> below min_gene_frac, g3 outside
    prods = ann.products_in_segment("gD_1", (10000, 14000))
    assert prods == ["tetracycline resistance protein"]


def test_classify_product_classes_and_order():
    from localhgt_tpu.analysis import transfer_gene as tg

    assert tg.classify_product("tetracycline resistance protein") == "ARG"
    assert tg.classify_product("phage tail fiber") == "phage"
    assert tg.classify_product("IS3 family transposase") == "transposon"
    assert tg.classify_product("ribosomal protein L3") == "unclassified"
    # last-match-wins ordering: a product matching both plasmid and ARG
    # patterns classifies as ARG (the later pattern), like the reference
    assert tg.classify_product("plasmid-borne beta-lactamase") == "ARG"
    assert tg.is_IS("IS66 element") and not tg.is_IS("integrase")


def test_product_class_counts_over_events(tmp_path):
    from localhgt_tpu.analysis import transfer_gene as tg

    gff = tmp_path / "genes.gff"
    gff.write_text(
        "gD_1\tsrc\tCDS\t10100\t11000\t.\t+\t0\tID=g1;product=IS3 transposase\n"
        "gD_2\tsrc\tCDS\t250\t800\t.\t+\t0\tID=g4;product=capsid protein\n"
    )
    ann = tg.GffAnnotation(str(gff))
    out = tg.product_class_counts(_mk_events(), ann)
    # gD_1 segment appears in TWO events -> transposon counted twice
    assert out["transposon"] == 2 and out["IS_elements"] == 2
    assert out["phage"] == 1


def test_merge_intervals_and_lengths():
    from localhgt_tpu.analysis import transfer_gene as tg

    assert tg.merge_intervals([(5, 9), (1, 3), (2, 4)]) == [(1, 4), (5, 9)]
    st = tg.gene_length_stats(_mk_events())
    assert st["n"] == 3 and st["median"] == 4000.0


# ---------- association (associtation_study.py + extract_phenotype.py) ----------

class _Bkp:
    def __init__(self, c1, p1, c2, p2):
        self.from_ref, self.from_bkp = c1, p1
        self.to_ref, self.to_bkp = c2, p2


class _S:
    def __init__(self, sid, bkps):
        self.sample_id, self.bkps = sid, bkps


def test_select_samples_filters():
    from localhgt_tpu.analysis import association

    samples = [_S(f"s{i}", []) for i in range(6)]
    pheno = {
        "s0": ("c1", "CRC", "CRC"),
        "s1": ("c1", "control", "healthy"),
        "s2": ("c1", "control", "adenoma"),        # control but not healthy
        "s3": ("c1", "CRC", "CRC;T2D"),            # multi-disease
        "s4": ("c2", "", ""),                      # empty disease
        "s5": ("c2", "CRC", "CRC"),
    }
    sel = association.select_samples(samples, pheno, "CRC", "control")
    assert sel == {"s0": 0, "s1": 1, "s5": 0}
    sel_c1 = association.select_samples(samples, pheno, "CRC", "control",
                                        cohort="c1")
    assert sel_c1 == {"s0": 0, "s1": 1}


def test_fisher_markers_detects_enriched_tag():
    from localhgt_tpu.analysis import association

    rng = np.random.default_rng(5)
    tax = Taxonomy()
    samples, pheno = [], {}
    for i in range(40):
        grp = "CRC" if i < 20 else "control"
        bkps = []
        # the enriched junction: 18/20 CRC carriers vs 1/20 controls
        if (grp == "CRC" and i < 18) or (grp == "control" and i == 25):
            bkps.append(_Bkp("gA_1", 1000, "gB_1", 2000))
        # noise junctions spread thin across both groups
        bkps.append(_Bkp(f"gN{rng.integers(0, 30)}_1", 500, "gZ_1", 900))
        sid = f"s{i}"
        samples.append(_S(sid, bkps))
        pheno[sid] = ("c", grp, "healthy" if grp == "control" else grp)
    sel = association.select_samples(samples, pheno, "CRC", "control")
    pair_counts, bk_counts, n = association.extract_tag_counts(
        samples, sel, tax, "genome")
    assert n == [20, 20]
    assert pair_counts["gA&gB"] == [18, 1]
    rows = association.fisher_markers(pair_counts, n, "CRC", "control")
    assert rows[0]["tag"] == "gA&gB" and rows[0]["significant"]
    assert rows[0]["oddsratio"] > 1 and rows[0]["CRC"] == 0.9
    # breakpoint-bin markers find the enriched endpoints too
    brows = association.fisher_markers(bk_counts, n, "CRC", "control")
    sig = {r["tag"] for r in brows if r["significant"]}
    assert "gA_1&0" in sig and "gB_1&0" in sig
    # a non-differential tag must not be significant
    assert all(not r["significant"] for r in rows if r["tag"] != "gA&gB")


def test_association_study_end_to_end(toy_cohort, tmp_path):
    from localhgt_tpu.analysis import association

    _, sdir, _ = toy_cohort
    pheno_csv = tmp_path / "pheno.csv"
    with open(pheno_csv, "w") as f:
        f.write("sample,cohort,disease,full\n")
        f.write("s1,c1,CRC,CRC\ns2,c1,CRC,CRC\n")
        f.write("s3,c1,control,healthy\ns4,c1,control,healthy\n")
    out = association.association_study(
        sdir, str(pheno_csv), Taxonomy(), "CRC", "control", level="genome")
    assert out["n_samples"] == {"CRC": 2, "control": 2}
    assert out["n_pair_tags"] == 1        # every sample shares gA&gB
    assert out["top_pairs"][0]["tag"] == "gA&gB"
    # identical presence in both groups: no significant marker
    assert out["diff_pairs"] == []


def test_phenotype_table_roundtrip(tmp_path):
    from localhgt_tpu.analysis import association

    meta = tmp_path / "meta.csv"
    with open(meta, "w") as f:
        f.write("sample,cohort,disease,full_disease,run,age,gender,bmi\n")
        f.write("p1,co1,CRC,CRC,SRR001,61,male,24.2\n")
        f.write("p2,co1,control,healthy,SRR002,55,female,22.9\n")
        f.write("p3,co2,T2D,T2D,NA,48,nan,31.0\n")
    t = association.PhenotypeTable.from_metadata_csv(meta)
    out = tmp_path / "pheno.csv"
    assert t.write_csv(str(out)) == 3
    ph = records.read_phenotype(str(out))
    # runs inherit the sample's phenotype; unmapped samples keep their name
    assert ph["SRR001"] == ("co1", "CRC", "CRC")
    assert ph["SRR002"] == ("co1", "control", "healthy")
    assert ph["p3"] == ("co2", "T2D", "T2D")
    assert t.by_sample["p1"]["gender"] == 0
    assert t.by_sample["p2"]["gender"] == 1
    assert t.by_sample["p3"]["gender"] == 2
