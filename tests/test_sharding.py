"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    tables, hits = out
    assert hits.shape[0] == 3


def test_sharded_count_matches_single_device():
    import jax
    import jax.numpy as jnp

    from localhgt_tpu.parallel import mesh as pmesh

    k = 10
    cap = 3
    mesh = pmesh.make_mesh(8)
    step = pmesh.sharded_count_step(mesh, k, cap)
    rng = np.random.default_rng(0)
    B = 4096
    hashes = rng.integers(0, 1 << k, B).astype(np.uint32)
    hashes[:1000] = 7  # heavy duplication across dp shards
    valid = rng.random(B) < 0.9

    t = pmesh.shard_tp(mesh, jnp.zeros(1 << k, jnp.int32))
    t = step(t, pmesh.shard_dp(mesh, jnp.asarray(hashes)),
             pmesh.shard_dp(mesh, jnp.asarray(valid)))
    got = np.asarray(t)

    exp = np.zeros(1 << k, np.int64)
    np.add.at(exp, hashes[valid].astype(np.int64), 1)
    np.testing.assert_array_equal(got, np.minimum(exp, cap))


def test_sharded_scan_matches_host():
    """Position-sharded halo-block scan must equal the monolithic scan."""
    import jax.numpy as jnp

    from localhgt_tpu.config import ScanConfig
    from localhgt_tpu.ops import encode, scan
    from localhgt_tpu.parallel import mesh as pmesh
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    k = 12
    coder_num = 3
    cfg = ScanConfig(window=64)
    mesh = pmesh.make_mesh(8)
    dp = mesh.shape["dp"]

    rng = np.random.default_rng(1)
    block, halo = 512, 256
    n_blocks = 2 * dp
    L = n_blocks * block
    ref = rng.integers(0, 4, L + 2 * halo).astype(np.uint8)
    masks, _ = encode.hasher_for(k, coder_num, seed=1)

    # a table with some hits
    table = np.zeros((coder_num, 1 << k), np.int32)
    h, v = encode.canonical_hashes(np, ref, masks, k)
    for i in range(coder_num):
        sel = h[i][v][::2].astype(np.int64)
        table[i][sel] = 3

    step = pmesh.sharded_scan_step(mesh, k, cfg, coder_num, block, halo)
    blocks = np.stack(
        [ref[i * block : i * block + block + 2 * halo] for i in range(n_blocks)]
    )
    tj = jax.device_put(
        jnp.asarray(table), NamedSharding(mesh, P(None, "tp"))
    )
    good, peak = step(pmesh.shard_dp(mesh, jnp.asarray(blocks)), tj,
                      jnp.asarray(masks))
    good = np.asarray(good)

    # host reference on the same padded layout: block i core equals positions
    # [i*block+halo, i*block+halo+block) of a scan started at i*block
    for i in range(0, n_blocks, max(1, n_blocks // 3)):
        seg = ref[i * block : i * block + block + 2 * halo]
        hh, vv = encode.canonical_hashes(np, seg, masks, k)
        hc = np.stack([
            np.where(vv & (hh[c] != 0), table[c][hh[c].astype(np.int64)], 0)
            for c in range(coder_num)
        ]).astype(np.int8)
        g_host, _ = scan.scan_hits(np, hc, k, cfg)
        np.testing.assert_array_equal(good[i], g_host[halo : halo + block])


def test_sw_align_sharded_matches_single():
    """Data-parallel SW over the 8-device CPU mesh must return the exact
    single-device spans (per-row independence; VERDICT r3 ask #7)."""
    from localhgt_tpu.ops import sw
    from localhgt_tpu.parallel import extract_sharded as shx

    rng = np.random.default_rng(3)
    B, M, N = 700, 48, 96  # deliberately not a multiple of 8*256
    q = rng.integers(0, 4, (B, M)).astype(np.uint8)
    r = rng.integers(0, 4, (B, N)).astype(np.uint8)
    for b in range(0, B, 3):
        r[b, 11:11 + 32] = q[b][5:37]
    mesh = shx.make_flat_mesh(8)
    got = sw.sw_align_sharded(mesh, q, r)
    exp = sw.sw_align_tiled(q, r)
    for f in sw._FIELDS:
        np.testing.assert_array_equal(got[f], exp[f], err_msg=f)
