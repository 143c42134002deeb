"""Tests for the deterministic saturating count table.

Semantics under test: final_count == min(total_occurrences, cap), matching a
single-threaded run of the reference's capped increment
(extract_ref_normal_peak.cpp:1082-1085), independent of batching.
"""

import numpy as np

from localhgt_tpu.ops import coder, count, encode


def test_count_batch_caps_and_saturates():
    import jax.numpy as jnp

    k = 10
    table = count.make_table(k)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 1 << k, size=5000).astype(np.uint32)
    # force heavy duplication of one index within the batch
    idx[:3000] = 7
    valid = np.ones(5000, bool)
    valid[4000:] = False

    table = count.count_batch(table, jnp.asarray(idx), jnp.asarray(valid))
    got = np.asarray(table).reshape(-1)

    exp = np.zeros(1 << k, np.int64)
    np.add.at(exp, idx[valid], 1)
    np.testing.assert_array_equal(got, np.minimum(exp, 3).astype(np.int8))


def test_count_batch_accumulates_across_batches():
    import jax.numpy as jnp

    k = 8
    table = count.make_table(k)
    total = np.zeros(1 << k, np.int64)
    rng = np.random.default_rng(1)
    for _ in range(4):
        idx = rng.integers(0, 1 << k, size=300).astype(np.uint32)
        valid = rng.random(300) < 0.8
        table = count.count_batch(table, jnp.asarray(idx), jnp.asarray(valid))
        np.add.at(total, idx[valid], 1)
    np.testing.assert_array_equal(
        np.asarray(table).reshape(-1), np.minimum(total, 3).astype(np.int8)
    )


def test_count_reads_step_end_to_end():
    """Hash + count fused step equals per-read host hashing + capped counts."""
    import jax.numpy as jnp

    k = 12
    masks, cc = encode.hasher_for(k, 3, seed=1)
    rng = np.random.default_rng(2)
    B, L = 16, 60
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    codes[0, 5] = coder.BASE_N
    lengths = np.full(B, L, np.int32)
    lengths[3] = 40
    accept = np.ones(B, bool)
    accept[7] = False

    tables = tuple(count.make_table(k) for _ in range(3))
    tables = count.count_reads_step(
        tables, jnp.asarray(codes), jnp.asarray(lengths), jnp.asarray(accept),
        masks, k,
    )

    exp = [np.zeros(1 << k, np.int64) for _ in range(3)]
    for b in range(B):
        if not accept[b]:
            continue
        h, v = coder.reference_kmer_hashes(codes[b, : lengths[b]], cc, k)
        for i in range(3):
            np.add.at(exp[i], h[v, i].astype(np.int64), 1)
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(tables[i]).reshape(-1), np.minimum(exp[i], 3).astype(np.int8)
        )


def test_packed_table_layout_k32_semantics():
    """k=32 packs eight 4-bit fields per int32 word (1-D scatter); counts
    land in the right field and the sentinel never pollutes the table."""
    import jax.numpy as jnp

    t = count.make_table(32)
    # eight 4-bit fields per int32 word: 2 GB instead of 4 GB at k=32
    assert t.shape == (1 << 29,) and t.dtype == jnp.int32
    idx = np.array([4, 4, 4, 4, 5, (1 << 31) + 9, (3 << 30) + 7, 0xFFFFFFFE],
                   dtype=np.uint32)
    valid = np.array([True] * 7 + [False])
    s, contrib = count.capped_batch_delta(jnp.asarray(idx), jnp.asarray(valid), 3)
    t = count.scatter_delta(t, s, contrib)
    h = jnp.asarray(idx[[0, 4, 5, 6]])
    looked = np.asarray(count.table_lookup(t, h))
    # hashes 4 and 5 share word 0 (fields 4 and 5); 4 saturates at cap=3
    np.testing.assert_array_equal(looked, [3, 1, 1, 1])
    t = np.asarray(t)
    assert t[0] == ((3 << 16) | (1 << 20))
    assert t[((1 << 31) + 9) >> 3] == (1 << 4)   # field 1 of its word
    assert t[((3 << 30) + 7) >> 3] == (1 << 28)  # field 7 of its word
    assert t[0xFFFFFFFE >> 3] == 0  # invalid entry dropped (contrib 0)


def test_packed_clip_and_lookup_roundtrip():
    """Packed-table clip keeps per-field min(total, cap) across batches."""
    import jax.numpy as jnp

    k = 31
    t = count.make_table(k)
    assert count.is_packed(t)
    idx = np.array([10, 10, 10, 10, 10, 11, 11], dtype=np.uint32)
    valid = np.ones(7, bool)
    for _ in range(3):  # repeated batches would overflow 4 bits without clip
        s, contrib = count.capped_batch_delta(
            jnp.asarray(idx), jnp.asarray(valid), 3)
        t = count.scatter_delta(t, s, contrib)
        (t,) = count.clip_tables((t,), 3)
    looked = np.asarray(count.table_lookup(t, jnp.asarray(idx[[0, 5]])))
    np.testing.assert_array_equal(looked, [3, 3])
    assert count.clip_every_batches(31) == 4
    assert count.clip_every_batches(30) == 38


def test_count_reads_step_packed_duplicates_oracle():
    """The unique-scatter path (run-length deltas + per-field unique
    scatters on the packed k>30 table) must equal min(total, cap) computed
    by the host oracle — heavy duplicates within and across batches, so
    run merging, field splitting and the deferred clip all engage."""
    import jax.numpy as jnp

    k = 31
    masks, cc = encode.hasher_for(k, 1, seed=3)
    rng = np.random.default_rng(5)
    B, L = 8, 48
    # half the reads identical: every k-mer occurs >= 4 > cap times
    base = rng.integers(0, 4, size=L).astype(np.uint8)
    codes = np.tile(base, (B, 1))
    codes[5:] = rng.integers(0, 4, size=(B - 5, L)).astype(np.uint8)
    lengths = np.full(B, L, np.int32)
    accept = np.ones(B, bool)

    tables = (count.make_table(k),)
    for _ in range(2):  # two batches: deferred-clip headroom engages
        tables = count.count_reads_step(
            tables, jnp.asarray(codes), jnp.asarray(lengths),
            jnp.asarray(accept), masks, k, clip=False, kw=64)
    tables = count.clip_tables(tables, 3)

    exp = np.zeros(1 << k, np.int64)
    for _ in range(2):
        for b in range(B):
            h, v = coder.reference_kmer_hashes(codes[b], cc, k)
            np.add.at(exp, h[v, 0].astype(np.int64), 1)
    nz = np.flatnonzero(exp)
    got = np.asarray(count.table_lookup(tables[0], jnp.asarray(nz.astype(np.uint32))))
    np.testing.assert_array_equal(got, np.minimum(exp[nz], 3).astype(np.int8))
    # and everything else is zero
    total_nonzero = int((np.asarray(tables[0]) != 0).sum())
    words = np.unique(nz >> 3)
    assert total_nonzero <= len(words)
