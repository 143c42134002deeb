"""Multi-chip sharding of the HGT pipeline.

The reference is single-node shared-memory only (SURVEY.md section 2.5); its
benign counter races become deterministic collectives here:

* **dp axis** — read batches are data-parallel; each dp shard counts its own
  reads, and shards merge with a saturating all-reduce
  min(psum(local_counts), cap), which is exactly the single-thread reference
  semantics min(total_occurrences, cap).
* **tp axis** — the 2^k count table is sharded by leading hash bits; every
  device filters the (dp-sharded, tp-replicated) hash stream down to its own
  slice before scattering, so no all-to-all of table rows is needed.
* **sp axis** (= dp reused) — the reference scan is a 1-D stencil over contig
  positions; position blocks with halo overlap shard across devices and each
  block scans independently (halo covers the 500-bp window and the 2k peak
  stencil), peak masks concatenate back.

Collectives ride ICI within a slice; on multi-host slices the same program
runs under jax.distributed with no code change (XLA inserts DCN transfers).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from localhgt_tpu.ops import encode, scan


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              tp: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = np.asarray(devs[:n])
    if dp is None or tp is None:
        # favor dp; tp gets the largest power-of-two factor <= 4
        tp = 1
        for t in (4, 2):
            if n % t == 0 and n // t >= 1:
                tp = t
                break
        dp = n // tp
    return Mesh(devs.reshape(dp, tp), ("dp", "tp"))


def sharded_count_step(mesh: Mesh, k: int, cap: int = 3):
    """Returns a jitted step: (table_shards, hashes, valid) -> table_shards.

    table: int32 [2^k] sharded over tp (leading bits). hashes: uint32 [B]
    sharded over dp. Deterministic: every device's contribution is summed with
    psum over dp before the saturating clip.

    k <= 30 only (slice indices must fit int32; the production k=32 path is
    the packed-word form in parallel.extract_sharded).
    """
    if k > 30:
        raise ValueError("sharded_count_step supports k <= 30; use "
                         "parallel.extract_sharded's packed tables for k > 30")
    T = 1 << k

    def step(table, hashes, valid):
        # table: local slice [T/tp]; hashes: local dp shard [B/dp]
        tp_idx = jax.lax.axis_index("tp")
        tp_n = jax.lax.axis_size("tp")
        slice_size = T // tp_n
        lo = (tp_idx * slice_size).astype(jnp.uint32)
        # modular uint32 membership test — an int64 cast would silently
        # compile as int32 without x64 and wrap for hashes >= 2^31
        # (r3 MULTICHIP warning); unsigned wrap-around makes the single
        # `< slice_size` compare exact for any shard offset
        local_u = hashes.astype(jnp.uint32) - lo
        mine = valid & (local_u < jnp.uint32(slice_size))
        local = jnp.where(mine, local_u,
                          jnp.uint32(slice_size)).astype(jnp.int32)
        delta = jnp.zeros(slice_size, jnp.int32).at[local].add(
            mine.astype(jnp.int32), mode="drop"
        )
        delta = jax.lax.psum(delta, "dp")
        return jnp.minimum(table + delta, cap)

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P("tp"), P("dp"), P("dp")),
        out_specs=P("tp"),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_scan_step(mesh: Mesh, k: int, scan_cfg, coder_num: int,
                      block: int, halo: int):
    """Returns a jitted step scanning a contig sharded in position blocks.

    Input: codes_blocks uint8 [n_blocks, block+2*halo] (host prepares halo
    overlap), table int32 [coder_num, 2^k] replicated, masks. Output: good and
    peak masks [n_blocks, block] for the core region of each block.
    """

    def step(codes, table, masks):
        # codes: [blocks/dp, block+2*halo] on this device; table arrives
        # tp-sharded from the count step and is gathered once over ICI
        table = jax.lax.all_gather(table, "tp", axis=1, tiled=True)
        h, v = encode.canonical_hashes(jnp, codes, masks, k)
        rows = []
        for i in range(coder_num):
            cnt = table[i][h[i]]
            rows.append(jnp.where(v & (h[i] != 0), cnt, 0))

        def one(hc):
            g, p = scan.scan_hits(jnp, hc, k, scan_cfg, true_len=None)
            return g[halo:halo + block], p[halo:halo + block]

        hc = jnp.stack(rows, axis=0)  # [C, nb, L]
        return jax.vmap(one, in_axes=1, out_axes=0)(hc)

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P("dp", None), P(None, "tp"), P(None, None)),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )
    return jax.jit(fn)


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P(*([None] * np.ndim(x)))))


def shard_dp(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P("dp", *([None] * (np.ndim(x) - 1)))))


def shard_tp(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P("tp", *([None] * (np.ndim(x) - 1)))))
