"""Production multi-chip extraction == single-device extraction.

Runs the FULL extract stage (real tables, real scan, real peakset build,
real vote) under the 8-virtual-device CPU mesh and asserts the emitted
intervals are identical to the single-device path — the deterministic
collective design of SURVEY.md section 2.5 (vs the reference's benign
counter races, extract_ref_normal_peak.cpp:1082-1085)."""

import numpy as np
import pytest

from localhgt_tpu.config import Config, KmerConfig
from localhgt_tpu.index import reference
from localhgt_tpu.sim.simulate import SimParams, simulate_sample


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("shx"))
    pa = SimParams(n_genomes=6, genome_len=30_000, hgt_num=3, depth=8,
                   snp_rate=0.01, seed=21)
    ref, fq1, fq2, _ = simulate_sample(out, "sx", pa)
    return ref, fq1, fq2


def test_sharded_extract_matches_single_device(fixture):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    ref, fq1, fq2 = fixture
    cfg = Config().replace(kmer=KmerConfig(k=18))
    contigs = reference.build(ref)

    from localhgt_tpu.parallel import extract_sharded as shx
    from localhgt_tpu.pipeline import extract as ex

    single = ex.extract(fq1, fq2, contigs, cfg)
    mesh = shx.make_flat_mesh(8)
    sharded = shx.extract_sharded(fq1, fq2, contigs, cfg, mesh,
                                  scan_block=1 << 13)
    assert sharded.n_pairs_counted == single.n_pairs_counted
    assert len(single.intervals) > 0
    assert sharded.intervals == single.intervals, (
        sharded.intervals, single.intervals)
    # index 0 is the sentinel slot: non-voting (padded) rows scatter there,
    # so its junk count varies with batch geometry — compare real peaks only
    np.testing.assert_array_equal(sharded.peak_votes[1:],
                                  single.peak_votes[1:])


def test_public_entry_mesh_acc_csv_identical(fixture, tmp_path):
    """detect_breakpoint(mesh=...) — the user-reachable multi-chip path
    (VERDICT r2 ask #4) — must emit a byte-identical acc.csv."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    ref, fq1, fq2 = fixture
    cfg = Config().replace(kmer=KmerConfig(k=18))

    from localhgt_tpu.parallel import extract_sharded as shx
    from localhgt_tpu.pipeline.bkp import detect_breakpoint

    out = str(tmp_path)
    acc1 = detect_breakpoint(ref, fq1, fq2, "one", out, cfg=cfg)
    accn = detect_breakpoint(ref, fq1, fq2, "mesh", out, cfg=cfg,
                             mesh=shx.make_flat_mesh(8))
    assert open(acc1, "rb").read() == open(accn, "rb").read()
    # "auto" resolves to the mesh when >1 device is visible
    acca = detect_breakpoint(ref, fq1, fq2, "auto", out, cfg=cfg,
                             mesh="auto")
    assert open(acc1, "rb").read() == open(acca, "rb").read()


def test_sharded_packed_tables_match(fixture):
    """k = 31 exercises the packed int32-word tables (delta + saturating
    fold) under the mesh; counts must equal the single-device tables."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    ref, fq1, fq2 = fixture
    # k=31 packed tables are 2^28 int32 = 1 GB each on the CPU mesh: too
    # big for a unit test, so exercise the packed code path shape-faithfully
    # through the sharded count step with a tiny table via monkeypatching
    # is fragile — instead check the fold semantics directly.
    from localhgt_tpu.parallel import extract_sharded as shx

    mesh = shx.make_flat_mesh(8)
    k_bits = 12  # pretend-packed table: int32 words, 2^12 hashes
    words = 1 << (k_bits - 3)
    cap = 3

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def step(t, s, c):
        return shx._scatter_slice_packed(t, s, c, cap)

    fn = jax.jit(shard_map(
        step, mesh=mesh, in_specs=(P("x"), P(), P()), out_specs=P("x"),
        check_vma=False))
    t = shx._shard_x(mesh, jnp.zeros(words, jnp.int32))
    rng = np.random.default_rng(3)
    hashes = rng.integers(0, 1 << k_bits, 4096).astype(np.uint32)
    contrib = np.minimum(rng.integers(1, 4, 4096), cap).astype(np.int8)
    exp = np.zeros(1 << k_bits, np.int64)
    np.add.at(exp, hashes.astype(np.int64), contrib)
    exp = np.minimum(exp, cap)
    t = fn(t, shx._replicate(mesh, jnp.asarray(hashes)),
           shx._replicate(mesh, jnp.asarray(contrib)))
    got = np.zeros(1 << k_bits, np.int64)
    th = np.asarray(t)
    for f in range(8):
        got[f::8] = 0  # layout: hash h -> word h>>3, field h&7
    for h in range(1 << k_bits):
        got[h] = (th[h >> 3] >> ((h & 7) * 4)) & 15
    np.testing.assert_array_equal(got, exp)
