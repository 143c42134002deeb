"""Precise breakpoint refinement.

Port of scripts/accurate_bkp.py on in-memory tables:

* raw junctions cluster per contig pair within 50 bp (Read_Raw_Bkp, :96-155);
* split (SA-tagged) alignments become SplitRead objects with clip directions
  and junction-adjusted positions (Each_Split_Read, :157-277) and attach to
  clusters within the insert size (:324-337);
* per cluster, candidate breakpoints slide over [min-2*rlen, max+2*rlen] and
  the clipped read substring is scored against each reference window
  (choose_acc_from_cluster, :398-496) — here as ONE batched device SW-score
  call over all windows (hot loop 5 made device-native);
* accepted when normalized score > 0.8 and the +-50bp flanks of the two
  contigs are < 0.4 similar (repeat guard, recheck/compare_two_refs,
  :528-551);
* support-read counting around each accepted bkp (count_reads_for_norm_
  parallel, :688-779) via a sorted interval index over the alignment table;
* head/tail + strand normalization (refine_bkp, :574-592).

Scoring: scikit-bio's StripedSmithWaterman is replaced by localhgt_tpu.ops.sw
with match=1 (score == matched bases, the interpretation the reference's
comment states at :36); thresholds min_match_score=0.8 / max_refs_sim=0.4 are
kept. Parity is at the +-50bp output level (SURVEY.md section 6), not exact
scores.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import numpy as np

from localhgt_tpu.config import BkpConfig
from localhgt_tpu.io import fasta
from localhgt_tpu.ops import coder
from localhgt_tpu.pipeline.align import AlnTable, SubRef
from localhgt_tpu.pipeline.rawbkp import InsertStats, RawBkp

log = logging.getLogger("localhgt_tpu.accbkp")


@dataclass
class SplitRead:
    read_id: int
    ref1: int
    pos1: int
    ref2: int
    pos2: int
    clipped_direction: str      # primary clip side: 'left' | 'right'
    seq1: np.ndarray            # clipped piece for ref1 (codes)
    seq2: np.ndarray            # clipped piece for ref2 (codes)
    end_point: bool
    clipped: int = 2

    def reverse(self):
        self.ref1, self.ref2 = self.ref2, self.ref1
        self.pos1, self.pos2 = self.pos2, self.pos1
        self.seq1, self.seq2 = self.seq2, self.seq1
        if self.clipped == 2:
            self.clipped = 1


@dataclass
class Cluster:
    ref1: int
    ref2: int
    direction: bool
    ref1_positions: list
    ref2_positions: list
    support_reads: list = field(default_factory=list)
    pos1: int = 0
    pos2: int = 0


@dataclass
class AccBkp:
    from_ref: int
    from_bkp: int
    from_side: str
    from_strand: str
    to_ref: int
    to_bkp: int
    to_side: str
    to_strand: str
    if_reverse: bool
    read_str: str
    ref_str: str
    similarity: float
    from_reads: int = 0
    to_reads: int = 0
    cross: int = 0
    pair_end: int = 0

    def reverse_direction(self):
        self.from_ref, self.to_ref = self.to_ref, self.from_ref
        self.from_side, self.to_side = self.to_side, self.from_side
        self.from_bkp, self.to_bkp = self.to_bkp, self.from_bkp
        self.from_reads, self.to_reads = self.to_reads, self.from_reads
        self.from_strand, self.to_strand = self.to_strand, self.from_strand

    def refine(self):
        """accurate_bkp.py:574-592."""
        self.from_side = "tail" if self.from_side == "right" else "head"
        self.to_side = "tail" if self.to_side == "right" else "head"
        if self.from_strand == "+" and self.from_side == "tail":
            self.reverse_direction()
        if self.from_strand == "-" and self.from_side == "head":
            self.from_strand = "+"
            self.to_strand = "-" if self.to_strand == "+" else "+"


def cluster_raw_bkps(raw: list[RawBkp], cfg: BkpConfig) -> list[Cluster]:
    """Read_Raw_Bkp.cluster_bkp/update_cluster/sort_cluster semantics."""
    table: dict[tuple, list[Cluster]] = {}
    for b in raw:
        r1, p1s = b.c1, [b.pos1, b.min1, b.max1]
        r2, p2s = b.c2, [b.pos2, b.min2, b.max2]
        if (r1, r2) in table:
            key = (r1, r2)
        elif (r2, r1) in table:
            key = (r2, r1)
            r1, r2 = r2, r1
            p1s, p2s = p2s, p1s
        else:
            table[(r1, r2)] = [Cluster(r1, r2, b.reverse, p1s, p2s)]
            continue
        matched = False
        for cl in table[key]:
            if cl.direction == b.reverse and \
               abs(p1s[0] - cl.ref1_positions[0]) < cfg.cluster_max_dist and \
               abs(p2s[0] - cl.ref2_positions[0]) < cfg.cluster_max_dist:
                cl.ref1_positions += p1s
                cl.ref2_positions += p2s
                matched = True
        if not matched:
            table[key].append(Cluster(r1, r2, b.reverse, p1s, p2s))
    out = []
    for cls in table.values():
        for cl in cls:
            cl.ref1_positions = sorted(set(cl.ref1_positions))
            cl.ref2_positions = sorted(set(cl.ref2_positions))
            out.append(cl)
    return out


def _oriented_codes(codes: np.ndarray, length: int, strand: int) -> np.ndarray:
    q = codes[:length]
    if strand:
        q = coder.COMPLEMENT[q][::-1]
    return q


def make_split_reads(
    aln: AlnTable, read_codes: np.ndarray, rlen: int,
    subref: SubRef | None, cfg: BkpConfig,
) -> list[SplitRead]:
    """Each_Split_Read construction (accurate_bkp.py:157-277).

    `read_codes` rows align with `aln` rows. `subref` enables the
    segment-end proximity check (update_pos, :225-237); None = -n 0 mode.

    Contract with bkp.CompactRows: `read_codes` retains ONLY the rows
    where `aln.contig2 >= 0` at alignment time — exactly the rows this
    function indexes. Any new consumer selecting rows by a different
    predicate must verify retention with `read_codes.has(i)` at selection
    time (CompactRows raises KeyError for unretained rows).
    """
    out = []
    idx = np.flatnonzero(aln.contig2 >= 0)
    for i in idx:
        L = int(aln.rlen[i])
        ref1 = int(aln.contig[i])
        ref2 = int(aln.contig2[i])
        if ref1 == ref2 or ref1 < 0:
            continue
        pos1 = int(aln.pos[i])
        pos2 = int(aln.pos2[i])
        l = int(aln.qstart[i])
        r = L - 1 - int(aln.qend[i])
        if r > l:
            clipdir = "right"
            m = rlen - r
            pos1 += m
        else:
            clipdir = "left"
            m = l
        # SA-side clip (get_ref2_clipped_direction, :204-223)
        l2 = int(aln.qstart2[i])
        r2 = L - 1 - int(aln.qend2[i])
        if not (l2 > r2):
            pos2 += rlen - r2
        if L < rlen:
            seq1 = np.zeros(0, np.uint8)
            seq2 = np.zeros(0, np.uint8)
        else:
            # CompactRows is keyed by GLOBAL read ordinal (== read_id), not
            # table row position — the table is row-filtered upstream
            q = _oriented_codes(read_codes[int(aln.read_id[i])], L,
                                int(aln.strand[i]))
            mm = max(0, min(m, L))
            if clipdir == "right":
                seq1, seq2 = q[:mm], q[mm:]
            else:
                seq1, seq2 = q[mm:], q[:mm]
        end_point = False
        if subref is not None:
            end_point = _near_segment_end(subref, ref1, pos1, cfg.bkp2end) or \
                _near_segment_end(subref, ref2, pos2, cfg.bkp2end)
        if len(seq1) == 0 and len(seq2) == 0:
            continue
        out.append(SplitRead(int(aln.read_id[i]), ref1, pos1, ref2, pos2,
                             clipdir, seq1, seq2, end_point))
    return out


def _near_segment_end(subref: SubRef, contig: int, pos: int, tol: int) -> bool:
    """update_pos end check: position within `tol` of its segment's bounds
    (segment interior start only counts when the segment doesn't begin at the
    contig head, :230-232)."""
    m = subref.seg_contig == contig
    if not m.any():
        return False
    starts = subref.seg_start[m]
    lens = subref.seg_len[m]
    j = np.searchsorted(starts, pos, side="right") - 1
    if j < 0:
        return True
    s, ln = int(starts[j]), int(lens[j])
    within = pos - s
    if s > 100 and within < tol:
        return True
    if ln - within < tol:
        return True
    return False


def attach_split_reads(clusters: list[Cluster], splits: list[SplitRead],
                       insert_size: int):
    """read_split_bam + add_support_split_reads (:279-337)."""
    index: dict[tuple, list[Cluster]] = {}
    for cl in clusters:
        index.setdefault((cl.ref1, cl.ref2), []).append(cl)
    for sr in splits:
        key = (sr.ref1, sr.ref2)
        rkey = (sr.ref2, sr.ref1)
        if key in index:
            targets = index[key]
        elif rkey in index:
            sr.reverse()
            targets = index[rkey]
        else:
            continue
        for cl in targets:
            if any(abs(sr.pos1 - p1) < insert_size for p1 in cl.ref1_positions) \
               and any(abs(sr.pos2 - p2) < insert_size for p2 in cl.ref2_positions):
                cl.support_reads.append(sr)


def _sort_support(cl: Cluster):
    """sort_support_reads (:62-77): by distance to the position medians,
    deduped by read id (dict overwrite keeps the last occurrence)."""
    m1 = np.median(cl.ref1_positions)
    m2 = np.median(cl.ref2_positions)
    rec: dict[int, SplitRead] = {}
    dist: dict[int, float] = {}
    for sr in cl.support_reads:
        rec[sr.read_id] = sr
        dist[sr.read_id] = abs(sr.pos1 - m1) + abs(sr.pos2 - m2)
    cl.support_reads = [rec[q] for q, _ in sorted(dist.items(), key=lambda x: x[1])]


def _revcomp(codes: np.ndarray) -> np.ndarray:
    return coder.COMPLEMENT[codes][::-1]


def _window_scores(seq: np.ndarray, contig_codes: np.ndarray, lo: int, hi: int,
                   left_windows: bool, revcomp_ref: bool):
    """Batched scores of `seq` vs every candidate window pb in [lo, hi).

    left_windows: window = ref[pb-len(seq) : pb]; else ref[pb : pb+len(seq)].
    Window start clamp mirrors extract_ref_seq's floor at 1 (:339-342).
    Returns float scores [hi-lo] (score / len(seq)).
    """
    import jax.numpy as jnp

    from localhgt_tpu.ops import sw as swmod

    sl = len(seq)
    n = hi - lo
    if n <= 0 or sl == 0:
        return np.zeros(0, np.float32)
    pb = np.arange(lo, hi, dtype=np.int64)
    if left_windows:
        starts = pb - sl
    else:
        starts = pb
    starts = np.maximum(starts, 1)
    gather = starts[:, None] + np.arange(sl)[None, :]
    gather = np.clip(gather, 0, max(len(contig_codes) - 1, 0))
    wins = contig_codes[gather]
    oob = (starts[:, None] + np.arange(sl)[None, :]) >= len(contig_codes)
    wins = np.where(oob, 4, wins).astype(np.uint8)
    if revcomp_ref:
        wins = coder.COMPLEMENT[wins][:, ::-1]
    # pad width to a 32-multiple bucket: clip lengths vary per read and each
    # distinct width would recompile the kernel; N-padding cannot score
    sl_pad = -(-sl // 32) * 32
    q = np.full((n, sl_pad), 4, np.uint8)
    q[:, :sl] = seq[None, :]
    w = np.full((n, sl_pad), 4, np.uint8)
    w[:, :sl] = wins
    scores = swmod.sw_score_tiled(q, w)
    return scores.astype(np.float32) / sl


def _enumerate_tasks(clusters, rlen: int, cfg: BkpConfig):
    """All (cluster, read, side) window-scan tasks the sequential loop could
    touch — scored in ONE device batch instead of one dispatch each (the
    per-dispatch tunnel RTT dominated this stage)."""
    inte = cfg.search_scale * rlen
    tasks = []
    for ci, cl in enumerate(clusters):
        if not cl.support_reads:
            continue
        _sort_support(cl)
        extract_dir = "right" if cl.direction else "left"
        for ri, sr in enumerate(cl.support_reads):
            if sr.end_point:
                continue
            for side in (1, 2):
                seq = sr.seq1 if side == 1 else sr.seq2
                if len(seq) <= cfg.min_seq_len or sr.clipped != side:
                    continue
                positions = (cl.ref1_positions if side == 1
                             else cl.ref2_positions)
                ref_id = cl.ref1 if side == 1 else cl.ref2
                tasks.append(dict(
                    ci=ci, ri=ri, side=side, seq=seq, ref_id=ref_id,
                    lo=positions[0] - inte, hi=positions[-1] + inte,
                    left_windows=sr.clipped_direction == extract_dir,
                    revcomp_ref=cl.direction,
                    ref1=cl.ref1, ref2=cl.ref2,
                    sr_pos1=sr.pos1, sr_pos2=sr.pos2,
                ))
    return tasks


def _score_tasks(tasks, contigs: fasta.Contigs, max_rows: int = 1 << 16):
    """Batched window scores for every task: builds all (query, window) rows
    host-side, runs sw_score_tiled in few large calls, returns per-task
    (best_offset, best_ratio)."""
    from localhgt_tpu.ops import sw as swmod

    results = {}
    if not tasks:
        return results
    W = max(32, -(-max(len(t["seq"]) for t in tasks) // 32) * 32)
    rows_q, rows_r, spans = [], [], []
    for t in tasks:
        q, w = _window_rows(t, contigs, W)
        rows_q.append(q)
        rows_r.append(w)
        spans.append(len(q))
    qs = np.concatenate(rows_q)
    rs = np.concatenate(rows_r)
    scores = np.concatenate([
        swmod.sw_score_tiled(qs[i: i + max_rows], rs[i: i + max_rows])
        for i in range(0, len(qs), max_rows)
    ]) if len(qs) else np.zeros(0, np.int32)
    off = 0
    for t, n in zip(tasks, spans):
        sl = len(t["seq"])
        if n == 0 or sl == 0:
            results[(t["ci"], t["ri"], t["side"])] = (0, 0.0)
            off += n
            continue
        sc = scores[off: off + n].astype(np.float32) / sl
        best = int(np.argmax(sc))
        results[(t["ci"], t["ri"], t["side"])] = (best, float(sc[best]))
        off += n
    return results


def _window_rows(t, contigs: fasta.Contigs, W: int):
    """(query rows, window rows) for one task — same window geometry as
    choose_acc_from_cluster's per-position extract_ref_seq scan
    (accurate_bkp.py:339-342,398-496)."""
    seq = t["seq"]
    contig_codes = contigs.contig_codes(t["ref_id"])
    sl = len(seq)
    n = t["hi"] - t["lo"]
    if n <= 0 or sl == 0:
        return (np.zeros((0, W), np.uint8), np.zeros((0, W), np.uint8))
    pb = np.arange(t["lo"], t["hi"], dtype=np.int64)
    starts = pb - sl if t["left_windows"] else pb
    starts = np.maximum(starts, 1)
    gather = starts[:, None] + np.arange(sl)[None, :]
    oob = gather >= len(contig_codes)
    gather = np.clip(gather, 0, max(len(contig_codes) - 1, 0))
    wins = contig_codes[gather]
    wins = np.where(oob, 4, wins).astype(np.uint8)
    if t["revcomp_ref"]:
        wins = coder.COMPLEMENT[wins][:, ::-1]
    q = np.full((n, W), 4, np.uint8)
    q[:, :sl] = seq[None, :]
    w = np.full((n, W), 4, np.uint8)
    w[:, :sl] = wins
    return q, w


def choose_acc_from_cluster(cl: Cluster, contigs: fasta.Contigs, rlen: int,
                            cfg: BkpConfig, ci: int = 0,
                            scored: dict | None = None,
                            recheck_memo: dict | None = None):
    """choose_acc_from_cluster (:398-496). Window scores come from the
    pre-batched `scored` map when given (falling back to a per-task device
    call); the sequential read order, early exits and cluster position state
    are replicated exactly."""
    inte = cfg.search_scale * rlen
    if scored is None:
        _sort_support(cl)
    for ri, sr in enumerate(cl.support_reads):
        if sr.end_point:
            continue
        extract_dir = "right" if cl.direction else "left"
        acc1 = acc2 = None
        score1 = score2 = 0.0

        for side in (1, 2):
            seq = sr.seq1 if side == 1 else sr.seq2
            if len(seq) <= cfg.min_seq_len or sr.clipped != side:
                continue
            positions = cl.ref1_positions if side == 1 else cl.ref2_positions
            ref_id = cl.ref1 if side == 1 else cl.ref2
            lo = positions[0] - inte
            hi = positions[-1] + inte
            left_windows = sr.clipped_direction == extract_dir
            if scored is not None:
                if (ci, ri, side) not in scored:
                    continue
                best, sc = scored[(ci, ri, side)]
            else:
                ratios = _window_scores(
                    seq, contigs.contig_codes(ref_id), lo, hi,
                    left_windows, cl.direction,
                )
                if len(ratios) == 0:
                    continue
                best = int(np.argmax(ratios))
                sc = float(ratios[best])
            if sc <= cfg.min_match_score:
                continue
            pb = lo + best
            if side == 1:
                to_side = "left" if sr.clipped_direction == "right" else "right"
                if sr.clipped_direction == "right":
                    from_side = "left" if cl.direction else "right"
                else:
                    from_side = "right" if cl.direction else "left"
                cl.pos1 = pb
                cl.pos2 = sr.pos2
                score1 = sc
                acc1 = _make_acc(cl, from_side, to_side, seq, sc, contigs,
                                 left_windows, rlen)
            else:
                from_side = "left" if sr.clipped_direction == "right" else "right"
                if sr.clipped_direction == "right":
                    to_side = "left" if cl.direction else "right"
                else:
                    to_side = "right" if cl.direction else "left"
                cl.pos2 = pb
                cl.pos1 = sr.pos1
                score2 = sc
                acc2 = _make_acc(cl, from_side, to_side, seq, sc, contigs,
                                 left_windows, rlen)

        if cl.pos1 > 0 and cl.pos2 > 0:
            if score1 > cfg.min_match_score and acc1 is not None and \
               _recheck_cached(acc1, contigs, cfg, recheck_memo):
                return acc1
            if score2 > cfg.min_match_score and acc2 is not None and \
               _recheck_cached(acc2, contigs, cfg, recheck_memo):
                return acc2
            return None
    return None


def _recheck_key(acc: AccBkp):
    return (acc.from_ref, acc.from_bkp, acc.to_ref, acc.to_bkp)


def _recheck_cached(acc, contigs, cfg, memo):
    if memo is not None:
        hit = memo.get(_recheck_key(acc))
        if hit is not None:
            return hit
    return _recheck(acc, contigs, cfg)


def _batch_recheck(coords, contigs: fasta.Contigs, cfg: BkpConfig) -> dict:
    """Repeat-guard similarity for many (from_ref, from_bkp, to_ref, to_bkp)
    candidates in one device call (two SW rows per candidate: forward and
    revcomp orientation — compare_two_refs, accurate_bkp.py:528-551)."""
    from localhgt_tpu.ops import sw as swmod

    coords = list(dict.fromkeys(coords))
    out = {}
    if not coords:
        return out
    clw = cfg.refs_check_len
    rows_q, rows_r, meta = [], [], []
    W = 2 * clw + 32
    W = -(-W // 32) * 32
    for c in coords:
        fr, fb, tr, tb = c
        a = contigs.slice_codes(fr, max(fb - clw, 1), fb + clw)
        b = contigs.slice_codes(tr, max(tb - clw, 1), tb + clw)
        if len(a) == 0 or len(b) == 0:
            out[c] = True
            continue
        pa = np.full(W, 4, np.uint8)
        pa[: len(a)] = a
        par = np.full(W, 4, np.uint8)
        ar = _revcomp(a)
        par[: len(ar)] = ar
        pb = np.full(W, 4, np.uint8)
        pb[: len(b)] = b
        rows_q += [pa, par]
        rows_r += [pb, pb]
        meta.append((c, len(a)))
    if meta:
        scores = swmod.sw_score_tiled(np.stack(rows_q), np.stack(rows_r))
        for i, (c, la) in enumerate(meta):
            sim = float(max(scores[2 * i], scores[2 * i + 1])) / la
            out[c] = sim <= cfg.max_refs_sim
    return out


def _make_acc(cl: Cluster, from_side, to_side, seq, score, contigs,
              left_windows, rlen) -> AccBkp:
    ref_str = ""  # informational columns; sequence text filled for parity
    read_str = coder.codes_to_seq(seq)
    return AccBkp(
        from_ref=cl.ref1, from_bkp=cl.pos1, from_side=from_side,
        from_strand=".", to_ref=cl.ref2, to_bkp=cl.pos2, to_side=to_side,
        to_strand=".", if_reverse=cl.direction, read_str=read_str,
        ref_str=ref_str, similarity=round(score, 3),
    )


def _recheck(acc: AccBkp, contigs: fasta.Contigs, cfg: BkpConfig) -> bool:
    """Repeat guard (compare_two_refs/recheck, :528-551): the two +-50bp
    flanks must not look alike in either orientation."""
    import jax.numpy as jnp

    from localhgt_tpu.ops import sw as swmod

    cl = cfg.refs_check_len
    a = contigs.slice_codes(acc.from_ref, max(acc.from_bkp - cl, 1),
                            acc.from_bkp + cl)
    b = contigs.slice_codes(acc.to_ref, max(acc.to_bkp - cl, 1),
                            acc.to_bkp + cl)
    if len(a) == 0 or len(b) == 0:
        return True
    n = -(-max(len(a), len(b)) // 32) * 32
    pa = np.full(n, 4, np.uint8)
    pa[: len(a)] = a
    pb = np.full(n, 4, np.uint8)
    pb[: len(b)] = b
    par = np.full(n, 4, np.uint8)
    ar = _revcomp(a)
    par[: len(ar)] = ar
    q = np.stack([pa, par])
    r = np.stack([pb, pb])
    scores = np.asarray(swmod.sw_score(jnp.asarray(q), jnp.asarray(r)))
    sim = float(scores.max()) / len(a)
    return sim <= cfg.max_refs_sim


class AlnIndex:
    """Sorted-by-(contig, pos) view over both mates for interval queries —
    the in-memory replacement of pysam's fetch on the unique BAM."""

    def __init__(self, a1: AlnTable, a2: AlnTable):
        def flat(a, other):
            m = a.contig > 0
            return dict(
                contig=a.contig[m], pos=a.pos[m], rend=a.rend[m],
                qname=a.read_id[m], mapq=a.mapq[m], strand=a.strand[m],
                sa_contig=a.contig2[m], sa_pos=a.pos2[m],
                sa_strand=a.strand2[m],
                mate_contig=other.contig[m], mate_pos=other.pos[m],
            )

        def supp(a, other):
            # supplementary records: the SA half appears at its own locus with
            # an SA pointer back to the primary — exactly the flag-2048 rows a
            # position-sorted BAM holds, which count_reads_for_norm's fetches
            # rely on to intersect qname sets across the junction
            m = (a.contig > 0) & (a.contig2 > 0)
            return dict(
                contig=a.contig2[m], pos=a.pos2[m], rend=a.rend2[m],
                qname=a.read_id[m], mapq=a.mapq[m], strand=a.strand2[m],
                sa_contig=a.contig[m], sa_pos=a.pos[m],
                sa_strand=a.strand[m],
                mate_contig=other.contig[m], mate_pos=other.pos[m],
            )

        parts = [flat(a1, a2), flat(a2, a1), supp(a1, a2), supp(a2, a1)]
        self.d = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
        order = np.lexsort((self.d["pos"], self.d["contig"]))
        self.d = {k: v[order] for k, v in self.d.items()}
        self.max_span = int((self.d["rend"] - self.d["pos"]).max()) + 1 \
            if len(order) else 0

    def fetch(self, contig: int, lo: int, hi: int) -> np.ndarray:
        """Indices of records overlapping [lo, hi), position-ordered."""
        c = self.d["contig"]
        p = self.d["pos"]
        left = np.searchsorted(c, contig, side="left")
        right = np.searchsorted(c, contig, side="right")
        s = np.searchsorted(p[left:right], lo - self.max_span) + left
        e = np.searchsorted(p[left:right], hi) + left
        idx = np.arange(s, e)
        keep = self.d["rend"][idx] >= lo
        return idx[keep]


def count_support(acc: AccBkp, index: AlnIndex, ins: InsertStats,
                  cfg: BkpConfig):
    """count_reads_for_norm_parallel (:688-779)."""
    ar = cfg.around_cutoff
    d = index.d
    from_set, to_set = set(), set()
    strand_flag = False
    for i in index.fetch(acc.from_ref, max(acc.from_bkp - ar, 1),
                         acc.from_bkp + ar):
        if d["sa_contig"][i] >= 0:
            from_set.add(int(d["qname"][i]))
            if not strand_flag and d["sa_contig"][i] == acc.to_ref and \
               abs(int(d["sa_pos"][i]) - acc.to_bkp) < 150:
                sa_strand = "-" if d["sa_strand"][i] else "+"
                acc.from_strand = "-" if d["strand"][i] else "+"
                acc.to_strand = sa_strand
                strand_flag = True
    for i in index.fetch(acc.to_ref, max(acc.to_bkp - ar, 1), acc.to_bkp + ar):
        if d["sa_contig"][i] >= 0:
            to_set.add(int(d["qname"][i]))
            if not strand_flag and d["sa_contig"][i] == acc.from_ref and \
               abs(int(d["sa_pos"][i]) - acc.from_bkp) < 500:
                sa_strand = "-" if d["sa_strand"][i] else "+"
                acc.to_strand = "-" if d["strand"][i] else "+"
                acc.from_strand = sa_strand
                strand_flag = True
    acc.from_reads = len(from_set)
    acc.to_reads = len(to_set)
    acc.cross = len(from_set & to_set)

    pe = set()
    isz = ins.insert_size
    for i in index.fetch(acc.from_ref, max(acc.from_bkp - isz, 1),
                         acc.from_bkp + isz):
        if d["mapq"][i] >= cfg.mapq_min and d["mate_contig"][i] == acc.to_ref \
           and abs(int(d["mate_pos"][i]) - acc.to_bkp) < isz:
            pe.add(int(d["qname"][i]))
    for i in index.fetch(acc.to_ref, max(acc.to_bkp - isz, 1),
                         acc.to_bkp + isz):
        if d["mapq"][i] >= cfg.mapq_min and d["mate_contig"][i] == acc.from_ref \
           and abs(int(d["mate_pos"][i]) - acc.from_bkp) < isz:
            pe.add(int(d["qname"][i]))
    acc.pair_end = len(pe)


def find_accurate_bkps(
    raw: list[RawBkp], a1: AlnTable, a2: AlnTable,
    codes1: np.ndarray, codes2: np.ndarray,
    contigs: fasta.Contigs, ins: InsertStats, cfg: BkpConfig,
    subref: SubRef | None, read_info: bool = True,
) -> list[AccBkp]:
    clusters = cluster_raw_bkps(raw, cfg)
    log.info("breakpoint cluster number: %d", len(clusters))
    splits = make_split_reads(a1, codes1, ins.rlen, subref, cfg) + \
        make_split_reads(a2, codes2, ins.rlen, subref, cfg)
    log.info("split reads: %d", len(splits))
    attach_split_reads(clusters, splits, ins.insert_size)
    # phase 1: every window-scan task scored in one batched device pass
    tasks = _enumerate_tasks(clusters, ins.rlen, cfg)
    scored = _score_tasks(tasks, contigs)
    # phase 2: pre-batch the repeat-guard rechecks for every candidate that
    # could clear min_match_score (superset of what the sequential pass uses)
    cand_coords = []
    for t in tasks:
        best, sc = scored[(t["ci"], t["ri"], t["side"])]
        if sc <= cfg.min_match_score:
            continue
        pb = t["lo"] + best
        if t["side"] == 1:
            cand_coords.append((t["ref1"], pb, t["ref2"], t["sr_pos2"]))
        else:
            cand_coords.append((t["ref1"], t["sr_pos1"], t["ref2"], pb))
    recheck_memo = _batch_recheck(cand_coords, contigs, cfg)
    # phase 3: exact sequential accept logic, consuming the batched results
    accs = []
    for ci, cl in enumerate(clusters):
        if not cl.support_reads:
            continue
        acc = choose_acc_from_cluster(cl, contigs, ins.rlen, cfg, ci=ci,
                                      scored=scored,
                                      recheck_memo=recheck_memo)
        if acc is not None:
            accs.append(acc)
    log.info("rough number of acc bkps: %d", len(accs))
    if read_info and accs:
        index = AlnIndex(a1, a2)
        for acc in accs:
            count_support(acc, index, ins, cfg)
    for acc in accs:
        acc.refine()
    return accs
