"""Split-read vote kernel: a pair bridging two genomes' peak k-mers votes for
both; pure single-genome pairs vote for none (check_split requires >= 2
genomes with >= MIN_BASE_NUM voting bases, cpp:161-202)."""

import numpy as np

from localhgt_tpu.ops import encode
from localhgt_tpu.pipeline import peaks as pm


def _mk(k=16):
    rng = np.random.default_rng(0)
    gA = rng.integers(0, 4, 400).astype(np.uint8)
    gB = rng.integers(0, 4, 400).astype(np.uint8)
    masks, _ = encode.hasher_for(k, 3, seed=1)

    # peaks: one on each genome; register all k-mers of each genome's window
    def kmers(codes):
        h, v = encode.canonical_hashes(np, codes, masks, k)
        return h[:, v].reshape(3, -1)

    hA = kmers(gA[100:200]).reshape(-1)
    hB = kmers(gB[100:200]).reshape(-1)
    hashes = np.concatenate([hA, hB]).astype(np.uint32)
    pids = np.concatenate([np.full(len(hA), 1), np.full(len(hB), 2)]).astype(np.int32)
    order = np.argsort(hashes, kind="stable")
    hashes, pids = hashes[order], pids[order]
    last = np.ones(len(hashes), bool)
    last[:-1] = hashes[1:] != hashes[:-1]
    pset = pm.PeakSet(
        contig=np.array([0, 1, 2], np.int32),
        pos=np.array([0, 150, 150], np.int64),
        sorted_hash=hashes[last],
        sorted_peak=pids[last],
    )
    return gA, gB, masks, pset, k


def _vote(pset, masks, k, m1, m2, accept=None):
    import jax.numpy as jnp

    B = m1.shape[0]
    pf = jnp.zeros(pset.n + 1, jnp.int32)
    acc = np.ones(B, bool) if accept is None else accept
    pf = pm.split_vote_batch(
        pf,
        jnp.asarray(m1), jnp.full(B, m1.shape[1], jnp.int32),
        jnp.asarray(m2), jnp.full(B, m2.shape[1], jnp.int32),
        jnp.asarray(acc),
        jnp.asarray(masks), jnp.asarray(pset.sorted_hash),
        jnp.asarray(pset.sorted_peak),
        jnp.asarray(pset.contig.astype(np.int32)),
        k=k,
    )
    return np.asarray(pf)


def test_bridging_pair_votes_both_peaks():
    gA, gB, masks, pset, k = _mk()
    chimera = np.concatenate([gA[120:180], gB[120:180]])[None, :]
    mate = gB[110:170][None, :]
    pf = _vote(pset, masks, k, chimera, mate)
    assert pf[1] >= 1 and pf[2] >= 1, pf


def test_pure_pair_votes_nothing():
    gA, gB, masks, pset, k = _mk()
    m1 = gA[110:170][None, :]
    m2 = gA[130:190][None, :]
    pf = _vote(pset, masks, k, m1, m2)
    assert pf[1] == 0 and pf[2] == 0, pf


def test_downsample_gates_votes():
    gA, gB, masks, pset, k = _mk()
    chimera = np.concatenate([gA[120:180], gB[120:180]])[None, :]
    mate = gB[110:170][None, :]
    pf = _vote(pset, masks, k, chimera, mate, accept=np.zeros(1, bool))
    assert pf[1:].sum() == 0
