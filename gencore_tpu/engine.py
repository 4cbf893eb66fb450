"""The batched, vectorized consensus engine (TPU-native pipeline).

Reformulates the reference's record-at-a-time streaming design
(gencore.cpp:162-477) as batch dataflow:

  1. columnar decode (io.bam.RecordBatch)
  2. vectorized pre-stats + cluster-key computation (sort-by-key replaces the
     nested std::map hierarchy, gencore.h:76)
  3. pair assembly + greedy UMI grouping (shared with the oracle)
  4. host-side template election over CIGAR equivalence classes
  5. device kernels (core.kernels) for overlap scoring + consensus voting
     over padded job tensors
  6. shared per-cluster duplex/threshold flow (core.postmerge)
  7. ordered output assembly + post-stats

Output is record-equivalent to the scalar oracle (and thus to the documented
reference behavior); tests/test_engine_equivalence.py enforces this on
randomized workloads.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from gencore_tpu.core import kernels
from gencore_tpu.core.grouping import greedy_umi_groups
from gencore_tpu.core.oracle import ORead, OPair, RefLookup, get_umi
from gencore_tpu.core.postmerge import postprocess_cluster
from gencore_tpu.io import bam as bamio
from gencore_tpu.options import Options
from gencore_tpu.stats import Stats
from gencore_tpu.utils import cigar as cig

PAIR_GAP_LIMIT = 100_000  # gencore.cpp:300
TICK = 10_000             # gencore.cpp:319-322


def _next_pow2(x: int) -> int:
    n = 1
    while n < x:
        n <<= 1
    return n


@dataclass
class _Group:
    cluster_ord: int          # cluster ordinal (processing order)
    pair_ids: list            # pair indices (qname order within cluster)
    cross_contig: bool
    # per-side election results (filled by _elect)
    left_job: int = -1        # index into job list, -1 = no output read
    right_job: int = -1
    left_single: int = -1     # pair id for the single-pair early return
    # job bookkeeping
    result: object = None


@dataclass
class _Job:
    group: _Group
    is_left_side: bool        # which side of the pair this job produces
    left_read_mode: bool      # election/vote alignment mode
    template_pair: int        # pair id owning the template read
    template_read: int        # read index of template
    members_reads: list       # read indices (template first)
    members_pairs: list       # pair ids aligned with members_reads
    len_diffs: list           # per member
    job_len: int
    # results
    new_seq: np.ndarray = None
    new_qual: np.ndarray = None
    diff: int = 0
    minc: int = 0


class VectorEngine:
    def __init__(self, opt: Options, header: bamio.BamHeader, fasta=None, bed=None):
        self.opt = opt
        self.header = header
        self.ref = RefLookup(fasta, header.names)
        pre_bed = bed
        post_bed = bed.copy_structure() if bed is not None else None
        self.pre_stats = Stats(opt.coverage_step, header.names, header.lengths,
                               bed_stats=pre_bed, is_post=False)
        self.post_stats = Stats(opt.coverage_step, header.names, header.lengths,
                                bed_stats=post_bed, is_post=True)
        self._ipo_cache: dict = {}    # (cig_bytes, cig_bytes, mode) -> bool
        self._cig_cache: dict = {}    # cig_bytes -> parsed np array
        self._refoff_cache: dict = {} # (cig_bytes, length) -> offsets array

    # ------------------------------------------------------------------
    def run(self, batch: bamio.RecordBatch) -> list:
        opt = self.opt
        n = batch.n
        if n == 0:
            return []

        # UMI prefix auto-detect from first record (gencore.cpp:206-221)
        if opt.umi_prefix == "auto":
            qn0 = batch.qname(0).decode("latin-1") if n else ""
            if "umi_" in qn0:
                opt.umi_prefix = "umi"
            elif "UMI_" in qn0:
                opt.umi_prefix = "UMI"
            else:
                opt.umi_prefix = ""

        tid = batch.tid.astype(np.int64)
        pos = batch.pos.astype(np.int64)
        mtid = batch.mtid.astype(np.int64)
        mpos = batch.mpos.astype(np.int64)
        isize = batch.isize.astype(np.int64)

        # --quit_after_contig: stop at first record with tid >= maxContig;
        # that record is still counted in pre-stats (gencore.cpp:222,242-246)
        limit = n
        if opt.max_contig > 0:
            over = np.nonzero(tid >= opt.max_contig)[0]
            if len(over):
                limit = int(over[0]) + 1

        nm = self._extract_int_tags(batch, b"NM", limit)
        self.pre_stats.add_reads_vectorized(tid[:limit], pos[:limit],
                                            batch.l_qseq[:limit].astype(np.int64), nm)
        proc = limit if limit == n else limit - 1

        mapped = (tid[:proc] >= 0) & (pos[:proc] >= 0)
        primary = (batch.flag[:proc] & (bamio.FSECONDARY | bamio.FSUPPLEMENTARY)) == 0
        use = mapped & primary
        idx = np.nonzero(use)[0]

        # cluster keys (gencore.cpp:295-313)
        t = tid[idx]
        p = pos[idx]
        mt = mtid[idx]
        mp = mpos[idx]
        isz = isize[idx]
        same_near = (mt == t) & (np.abs(mp - p) < PAIR_GAP_LIMIT)
        left = np.where(same_near & (isz < 0), mp, p)
        tlen_arr = np.array(self.header.lengths, dtype=np.int64)
        right = np.where(
            same_near,
            left + np.abs(isz) - 1,
            -tlen_arr[np.clip(t, 0, len(tlen_arr) - 1)] * (mt + 1) + mp,
        )
        passthrough = ~same_near & (mt < 0)

        out_records: list = []   # (sortkey tuple, encoded-record-callable/ORead)
        self._serial = 0

        # passthrough mate-less reads: raw record bytes unchanged
        for i in idx[passthrough]:
            self._emit_raw(batch, int(i), out_records)

        cl_mask = ~passthrough
        cidx = idx[cl_mask]            # record indices of clustered reads
        ckey_t = t[cl_mask]
        ckey_l = left[cl_mask]
        ckey_r = right[cl_mask]

        if len(cidx) == 0:
            return self._finalize(out_records, batch)

        # tick checkpoints: every 10000th clustered read (gencore.cpp:319-322);
        # the LAST checkpoint decides which clusters were watermark-flushed
        # (with the proper threshold) vs finished at EOF (unproper threshold)
        nclust = len(cidx)
        last_ck_tid, last_ck_pos = -1, -1
        if nclust >= TICK:
            ck = cidx[TICK - 1::TICK][-1]
            last_ck_tid, last_ck_pos = int(tid[ck]), int(pos[ck])

        # sort clustered reads by (tid, left, right, qname, serial)
        qname_mat, qname_w = self._qname_matrix(batch, cidx)
        qname_keys = qname_mat.view(f"S{qname_w}").ravel()
        order = np.lexsort((cidx, qname_keys, ckey_r, ckey_l, ckey_t))
        s_rec = cidx[order]
        s_t = ckey_t[order]
        s_l = ckey_l[order]
        s_r = ckey_r[order]
        s_q = qname_keys[order]

        # boundaries
        new_cluster = np.ones(nclust, dtype=bool)
        new_cluster[1:] = (s_t[1:] != s_t[:-1]) | (s_l[1:] != s_l[:-1]) | (s_r[1:] != s_r[:-1])
        new_pair = new_cluster.copy()
        new_pair[1:] |= s_q[1:] != s_q[:-1]
        pair_start = np.nonzero(new_pair)[0]
        pair_end = np.append(pair_start[1:], nclust)
        pair_cluster_start = np.nonzero(new_cluster)[0]

        # pair left = first read (stream order within equal qname = serial
        # order; lexsort used cidx as last key so first in slice), right =
        # LAST read (Cluster::addRead overwrites mRight, cluster.cpp:260-273)
        pl = s_rec[pair_start]
        pr = np.where(pair_end - pair_start >= 2, s_rec[pair_end - 1], -1)
        npairs = len(pl)

        # cluster id per pair
        cluster_of_pair = np.cumsum(new_cluster)[pair_start] - 1
        nclusters = int(cluster_of_pair[-1]) + 1 if npairs else 0
        # cluster key info per cluster
        c_first = pair_cluster_start
        c_tid = s_t[c_first]
        c_left = s_l[c_first]
        c_right = s_r[c_first]

        # threshold per cluster (watermark-flush vs EOF quirk)
        flushed = (c_tid < last_ck_tid) | (
            (c_tid == last_ck_tid) & (c_left < last_ck_pos) & (c_right < last_ck_pos))
        c_thr = np.where(flushed, opt.proper_reads_umi_diff_threshold,
                         opt.unproper_reads_umi_diff_threshold)

        # ---- materialize working arrays for clustered reads ----
        max_len = int(batch.l_qseq[cidx].max()) if len(cidx) else 0
        self.max_len = max(max_len, 1)
        work = _WorkArrays(batch, cidx, self.max_len,
                           default_score=opt.score_not_overlapped_moderate_qual)
        self.work = work

        # UMIs per pair (from the left read; mate mismatch is fatal,
        # pair.cpp:196-216)
        umis = self._pair_umis(batch, pl, pr)

        # ---- per-cluster grouping + election ----
        groups: list = []
        jobs: list = []
        pair_of_global: dict = {}
        cluster_groups: list = [[] for _ in range(nclusters)]
        pair_ids_by_cluster: list = [[] for _ in range(nclusters)]
        for pi in range(npairs):
            pair_ids_by_cluster[int(cluster_of_pair[pi])].append(pi)

        for ci in range(nclusters):
            pids = pair_ids_by_cluster[ci]
            cluster_umis = [umis[pi] for pi in pids]
            idx_groups = greedy_umi_groups(cluster_umis, int(c_thr[ci]))
            for gidxs in idx_groups:
                g = _Group(cluster_ord=ci, pair_ids=[pids[k] for k in gidxs],
                           cross_contig=bool(c_right[ci] < 0))
                groups.append(g)
                cluster_groups[ci].append(g)

        # election + job construction
        for g in groups:
            self._elect_group(g, pl, pr, batch, jobs)

        # ---- device phase 1: overlap scoring ----
        self._score_pairs(batch, pl, pr, jobs, work)

        # ---- device phase 2: consensus voting ----
        self._vote_jobs(jobs, batch, work)

        # ---- assemble group results, duplex, thresholds ----
        for ci in range(nclusters):
            glist = cluster_groups[ci]
            if not glist:
                continue
            self.pre_stats.add_cluster(len(glist) > 1)
            singles = [self._assemble_group(g, jobs, batch, pl, pr, umis, work)
                       for g in glist]
            has_umi = any(umis[pi] for pi in pair_ids_by_cluster[ci])
            results = postprocess_cluster(singles, has_umi, opt,
                                          self.pre_stats, self.post_stats)
            for pair in results:
                self._emit_pair(pair, out_records)

        return self._finalize(out_records, batch)

    # ------------------------------------------------------------------
    def _finalize(self, out_records: list, batch) -> list:
        out_records.sort(key=lambda kr: kr[0])
        outs = [r for _, r in out_records]
        if outs:
            self.post_stats.add_reads_vectorized(
                np.array([r.tid for r in outs]),
                np.array([r.pos for r in outs]),
                np.array([r.l_qseq for r in outs]),
                np.array([(r.nm_new if r.nm_new is not None else r.nm_val) for r in outs]),
            )
        return outs

    def _emit_raw(self, batch, i: int, out_records: list):
        from gencore_tpu.core.oracle import oread_from_batch
        r = oread_from_batch(batch, i)
        self._serial += 1
        key = (r.tid if r.tid >= 0 else 0x7FFFFFFF, r.pos, r.mtid, r.mpos,
               r.isize, self._serial)
        out_records.append((key, r))

    def _emit_pair(self, pair: OPair, out_records: list):
        self.post_stats.add_molecule(1, pair.left is not None and pair.right is not None)
        for r in (pair.left, pair.right):
            if r is not None:
                self._serial += 1
                key = (r.tid if r.tid >= 0 else 0x7FFFFFFF, r.pos, r.mtid,
                       r.mpos, r.isize, self._serial)
                out_records.append((key, r))

    # ------------------------------------------------------------------
    def _extract_int_tags(self, batch, tag: bytes, limit: int) -> np.ndarray:
        """Vectorized NM extraction: probe the first record's tag offset and
        verify the same layout across records; fall back per-record."""
        out = np.zeros(limit, dtype=np.int64)
        if limit == 0:
            return out
        off0, typ0 = batch.find_tag(0, tag)
        done = np.zeros(limit, dtype=bool)
        if off0 is not None and typ0 in "Cc":
            delta = off0 - int(batch.aux_off[0])
            cand = batch.aux_off[:limit] + delta
            ok = cand + 1 <= batch.end[:limit]
            probe = cand - 3
            ok &= (batch.data[np.clip(probe, 0, len(batch.data) - 1)] == tag[0])
            ok &= (batch.data[np.clip(probe + 1, 0, len(batch.data) - 1)] == tag[1])
            ok &= (batch.data[np.clip(probe + 2, 0, len(batch.data) - 1)] == ord(typ0))
            vals = batch.data[np.clip(cand, 0, len(batch.data) - 1)].astype(np.int64)
            if typ0 == "c":
                vals = np.where(vals > 127, vals - 256, vals)
            out[ok] = vals[ok]
            done = ok
        for i in np.nonzero(~done)[0]:
            out[i] = batch.get_int_tag(int(i), tag, 0)
        return out

    def _qname_matrix(self, batch, idx: np.ndarray):
        lens = batch.l_read_name[idx].astype(np.int64) - 1  # exclude NUL
        w = max(int(lens.max()) if len(lens) else 1, 1)
        cols = np.arange(w, dtype=np.int64)
        g = batch.qname_off[idx][:, None] + cols[None, :]
        np.minimum(g, len(batch.data) - 1, out=g)
        m = batch.data[g].copy()
        m[cols[None, :] >= lens[:, None]] = 0
        return m, w

    def _pair_umis(self, batch, pl: np.ndarray, pr: np.ndarray) -> list:
        prefix = self.opt.umi_prefix
        from gencore_tpu.utils.umi import get_umi_from_qname
        umis = []
        for k in range(len(pl)):
            li = int(pl[k])
            mi = batch.get_str_tag(li, b"MI")
            src = mi if mi is not None else batch.qname(li).decode("latin-1")
            u = get_umi_from_qname(src, prefix)
            ri = int(pr[k])
            if ri >= 0:
                mi_r = batch.get_str_tag(ri, b"MI")
                src_r = mi_r if mi_r is not None else batch.qname(ri).decode("latin-1")
                ur = get_umi_from_qname(src_r, prefix)
                if u and ur != u:
                    raise ValueError(
                        f"The UMI of a read pair should be identical, but we got {u} and {ur}")
                if not u:
                    u = ur
            umis.append(u)
        return umis

    # ------------------------------------------------------------------
    def _cig(self, batch, read_idx: int):
        key = batch.data[batch.cigar_off[read_idx]:batch.seq_off[read_idx]].tobytes()
        c = self._cig_cache.get(key)
        if c is None:
            c = np.frombuffer(key, dtype=np.uint32)
            self._cig_cache[key] = c
        return key, c

    def _is_part_of(self, key_a, cig_a, key_b, cig_b, mode: bool) -> bool:
        k = (key_a, key_b, mode)
        v = self._ipo_cache.get(k)
        if v is None:
            v = cig.is_part_of(cig_a, cig_b, mode)
            self._ipo_cache[k] = v
        return v

    def _elect_group(self, g: _Group, pl, pr, batch, jobs: list):
        """Template election + job creation for both sides
        (reference group.cpp:68-318)."""
        opt = self.opt
        npair = len(g.pair_ids)
        # single pair with no right: early return (group.cpp:73-77)
        if npair == 1 and int(pr[g.pair_ids[0]]) < 0:
            g.left_single = g.pair_ids[0]
            return

        for is_left in (True, False):
            side_reads = []
            for pi in g.pair_ids:
                ri = int(pl[pi]) if is_left else int(pr[pi])
                side_reads.append(ri if ri >= 0 else -1)

            job = self._elect_side(g, is_left, side_reads, batch)
            if job is not None:
                jobs.append(job)
                if is_left:
                    g.left_job = len(jobs) - 1
                else:
                    g.right_job = len(jobs) - 1

    def _elect_side(self, g: _Group, is_left: bool, side_reads: list, batch):
        opt = self.opt
        npairs = len(g.pair_ids)

        # low-complexity skip (group.cpp:142-175)
        if npairs > opt.skip_low_complexity_cluster_threshold:
            cigars = set()
            first_read = -1
            for ri in side_reads:
                if ri >= 0:
                    cigars.add(self._cig(batch, ri)[0])
                    if first_read < 0:
                        first_read = ri
            if len(cigars) > npairs * 0.1 and first_read >= 0:
                seq = batch.seq_codes(first_read)
                diff_neighbor = int((seq[:-1] != seq[1:]).sum())
                if diff_neighbor < len(seq) * 0.5:
                    return None

        left_read_mode = is_left
        if not is_left:
            last_pos = -1
            left_aligned = True
            for ri in side_reads:
                if ri >= 0:
                    rp = int(batch.pos[ri])
                    if last_pos >= 0 and rp != last_pos:
                        left_aligned = False
                        break
                    last_pos = rp
            if left_aligned:
                left_read_mode = True

        # containment counts over cigar classes
        keys = []
        rrps = []
        for ri in side_reads:
            if ri >= 0:
                k, c = self._cig(batch, ri)
                keys.append((k, c))
                rrps.append(int(batch.pos[ri]) + cig.ref_len(c) if not is_left else 0)
            else:
                keys.append(None)
                rrps.append(0)

        contained_by = [0] * npairs
        early_break = npairs > opt.skip_low_complexity_cluster_threshold
        for i in range(npairs):
            if keys[i] is None:
                continue
            cby = 1
            for j in range(npairs):
                if i == j or keys[j] is None:
                    continue
                if not is_left and rrps[i] != rrps[j]:
                    continue
                if self._is_part_of(keys[i][0], keys[i][1],
                                    keys[j][0], keys[j][1], left_read_mode):
                    cby += 1
            contained_by[i] = cby
            if early_break and cby >= npairs // 2:
                break

        most_id = -1
        most_num = -1
        for i in range(npairs):
            if contained_by[i] > most_num:
                most_num = contained_by[i]
                most_id = i
            elif contained_by[i] == most_num and most_id >= 0:
                bi = side_reads[i]
                bc = side_reads[most_id]
                this_len = int(batch.l_qseq[bi]) if bi >= 0 else 0
                cur_len = int(batch.l_qseq[bc]) if bc >= 0 else 0
                if this_len < cur_len:
                    most_num = contained_by[i]
                    most_id = i

        if most_num < npairs * 0.4 and npairs != 1:
            return None
        template = side_reads[most_id]
        if template < 0:
            return None

        tkey, tcig = self._cig(batch, template)
        members_reads = [template]
        members_pairs = [g.pair_ids[most_id]]
        for j in range(npairs):
            if j == most_id or side_reads[j] < 0:
                continue
            rj = side_reads[j]
            jkey, jcig = self._cig(batch, rj)
            # collection: template contained by member (group.cpp:309)
            if self._is_part_of(tkey, tcig, jkey, jcig, left_read_mode):
                members_reads.append(rj)
                members_pairs.append(g.pair_ids[j])

        # lenDiff + aligner WAR (group.cpp:339-349)
        tlen_q = int(batch.l_qseq[template])
        len_diffs = []
        for rj in members_reads:
            d = int(batch.l_qseq[rj]) - tlen_q
            if d != 0:
                jkey, jcig = self._cig(batch, rj)
                if int(batch.pos[rj]) == int(batch.pos[template]) and \
                        self._is_part_of(tkey, tcig, jkey, jcig, True):
                    d = 0
            len_diffs.append(d)

        job_len = tlen_q
        if len(tcig) == 0:
            for rj in members_reads:
                job_len = min(job_len, int(batch.l_qseq[rj]))

        return _Job(group=g, is_left_side=is_left, left_read_mode=left_read_mode,
                    template_pair=g.pair_ids[most_id], template_read=template,
                    members_reads=members_reads, members_pairs=members_pairs,
                    len_diffs=len_diffs, job_len=job_len)

    # ------------------------------------------------------------------
    def _score_pairs(self, batch, pl, pr, jobs: list, work):
        """Overlap scoring for every pair in any group that fetches scores
        (i.e. owns at least one successful side job) — reference semantics:
        getLeftScore/getRightScore called for all pairs of the group
        (group.cpp:272,300-304), computeScore mutates quals once per pair."""
        need = set()
        for job in jobs:
            for pi in job.group.pair_ids:
                need.add(pi)
        score_pairs = sorted(need)
        if not score_pairs:
            return
        L = work.L
        comp = [pi for pi in score_pairs if int(pr[pi]) >= 0]
        # incomplete pairs keep default score 6 and untouched quals
        geoms = []
        run = []
        for pi in comp:
            li, ri = int(pl[pi]), int(pr[pi])
            _, lcig = self._cig(batch, li)
            _, rcig = self._cig(batch, ri)
            lmoff, lmlen = self._first_m(lcig)
            rmoff, rmlen = self._first_m(rcig)
            if lmlen <= 0 or rmlen <= 0:
                continue  # stays default 6
            pos_dis = int(batch.pos[ri]) - int(batch.pos[li])
            if pos_dis >= 0:
                ls, rs = lmoff + pos_dis, rmoff
                cl = min(lmlen - pos_dis, rmlen)
            else:
                ls, rs = lmoff, rmoff - pos_dis
                cl = min(lmlen, rmlen + pos_dis)
            run.append((pi, li, ri))
            geoms.append((ls, rs, cl))
        if not run:
            return
        P = len(run)
        li_arr = np.array([r[1] for r in run])
        ri_arr = np.array([r[2] for r in run])
        lrow = work.row_of(li_arr)
        rrow = work.row_of(ri_arr)
        g = np.array(geoms, dtype=np.int32)
        o = self.opt
        ls_, rs_, nlq, nrq = kernels.overlap_score_kernel(
            work.seq[lrow], work.qual[lrow], work.seq[rrow], work.qual[rrow],
            g[:, 0], g[:, 1], g[:, 2],
            batch.l_qseq[li_arr].astype(np.int32), batch.l_qseq[ri_arr].astype(np.int32),
            hi=o.high_quality, mod=o.moderate_quality, lo=o.low_quality,
            s_hi=o.score_not_overlapped_high_qual, s_mod=o.score_not_overlapped_moderate_qual,
            s_lo=o.score_not_overlapped_low_qual, s_bad=o.score_not_overlapped_bad_qual)
        ls_, rs_, nlq, nrq = map(np.asarray, (ls_, rs_, nlq, nrq))
        work.score[lrow] = ls_.astype(np.int8)
        work.score[rrow] = rs_.astype(np.int8)
        work.qual[lrow] = nlq
        work.qual[rrow] = nrq

    def _first_m(self, c: np.ndarray):
        return cig.first_m_offset_len(c)

    def _ref_offsets(self, key: bytes, c: np.ndarray, length: int):
        k = (key, length)
        v = self._refoff_cache.get(k)
        if v is None:
            v = cig.ref_offsets_vector(c, length)
            self._refoff_cache[k] = v
        return v

    def _vote_jobs(self, jobs: list, batch, work):
        if not jobs:
            return
        o = self.opt
        rnum, rden = kernels.ratio_fraction(o.score_percent_req)
        L = work.L
        # bucket jobs by K
        buckets: dict = {}
        for ji, job in enumerate(jobs):
            kb = _next_pow2(len(job.members_reads))
            buckets.setdefault(kb, []).append(ji)

        for kb, jlist in sorted(buckets.items()):
            J = len(jlist)
            seq = np.zeros((J, kb, L), dtype=np.uint8)
            qual = np.zeros((J, kb, L), dtype=np.uint8)
            score = np.zeros((J, kb, L), dtype=np.int32)
            valid = np.zeros((J, kb), dtype=bool)
            pos_valid = np.zeros((J, L), dtype=bool)
            refbase = np.zeros((J, L), dtype=np.uint8)
            for jj, ji in enumerate(jlist):
                job = jobs[ji]
                jl = job.job_len
                pos_valid[jj, :jl] = True
                for k, (rj, d) in enumerate(zip(job.members_reads, job.len_diffs)):
                    row = work.row_of_one(rj)
                    shift = d if not job.left_read_mode else 0
                    # gather member positions i -> read position i+shift
                    if shift == 0:
                        seq[jj, k] = work.seq[row]
                        qual[jj, k] = work.qual[row]
                        score[jj, k] = work.score[row]
                    else:
                        end = min(L, work.L - shift) if shift >= 0 else L
                        if shift >= 0:
                            seq[jj, k, :work.L - shift] = work.seq[row, shift:]
                            qual[jj, k, :work.L - shift] = work.qual[row, shift:]
                            score[jj, k, :work.L - shift] = work.score[row, shift:]
                        else:
                            seq[jj, k, -shift:] = work.seq[row, :work.L + shift]
                            qual[jj, k, -shift:] = work.qual[row, :work.L + shift]
                            score[jj, k, -shift:] = work.score[row, :work.L + shift]
                    valid[jj, k] = True
                # reference gather (group.cpp:362-367,430-439)
                refbase[jj] = self._job_refbase(job, batch)
            new_seq, new_qual, diff, minc = kernels.consensus_kernel(
                seq, qual, score, valid, pos_valid, refbase,
                hi=o.high_quality, mod=o.moderate_quality, lo=o.low_quality,
                base_score_req=o.base_score_req, ratio_num=rnum, ratio_den=rden)
            new_seq = np.asarray(new_seq)
            new_qual = np.asarray(new_qual)
            diff = np.asarray(diff)
            minc = np.asarray(minc)
            for jj, ji in enumerate(jlist):
                job = jobs[ji]
                job.new_seq = new_seq[jj]
                job.new_qual = new_qual[jj]
                job.diff = int(diff[jj])
                job.minc = int(minc[jj])

    def _job_refbase(self, job: _Job, batch) -> np.ndarray:
        """Per-position reference base (nt16 code, 0 = unavailable)."""
        L = self.work.L
        out = np.zeros(L, dtype=np.uint8)
        template = job.template_read
        if int(batch.isize[template]) == 0:
            return out
        tkey, tcig = self._cig(batch, template)
        jl = job.job_len
        if len(tcig) == 0 or jl <= 0:
            return out
        offs = self._ref_offsets(tkey, tcig, jl)
        # reference uses getRefOffset(out, len-1)+1 as the span (group.cpp:364)
        reflen = cig.ref_offset(tcig, jl - 1) + 1
        contig = self.ref.get_contig(int(batch.tid[template]),
                                     int(batch.pos[template]), reflen)
        if contig is None:
            return out
        pos = int(batch.pos[template])
        valid = offs >= 0
        gather = np.clip(pos + offs, 0, len(contig) - 1)
        chars = contig[gather]
        codes = _ASCII_TO_NT16[chars]
        codes[~valid] = 0
        out[:jl] = codes
        return out

    # ------------------------------------------------------------------
    def _assemble_group(self, g: _Group, jobs, batch, pl, pr, umis, work) -> OPair:
        """Build the merged OPair for a group (reference group.cpp:68-134)."""
        from gencore_tpu.core.oracle import oread_from_batch
        opt = self.opt

        if g.left_single >= 0:
            pair = OPair(opt)
            li = int(pl[g.left_single])
            pair.set_left(oread_from_batch(batch, li))
            # apply overlap-mutated quals? single-pair-no-right groups never
            # compute scores (group.cpp:73-77 early return) — keep original.
            return pair

        left = self._job_output(g.left_job, jobs, batch, work)
        right = self._job_output(g.right_job, jobs, batch, work)

        pair = OPair(opt)
        pair.merge_reads = len(g.pair_ids)

        if g.cross_contig:
            # smallest (padded len, then bytes) left qname (group.cpp:80-99)
            name_to_copy = None
            cur_len = 0
            cur_template = -1
            for pi in g.pair_ids:
                li = int(pl[pi])
                if li < 0:
                    continue
                qn = batch.qname(li)
                plen = bamio.padded_qname_len(len(qn))
                if name_to_copy is None:
                    name_to_copy, cur_len, cur_template = qn, plen, li
                elif plen < cur_len or (plen == cur_len and qn < name_to_copy):
                    name_to_copy, cur_len, cur_template = qn, plen, li
            if left is not None and name_to_copy is not None and \
                    cur_template != (jobs[g.left_job].template_read if g.left_job >= 0 else -1):
                left.qname = name_to_copy
        elif left is not None and right is not None:
            if left.padded_l_qname() <= right.padded_l_qname():
                right.qname = left.qname
            else:
                left.qname = right.qname

        if left is not None:
            pair.set_left(left)
            pair.merge_left_diff = jobs[g.left_job].diff if g.left_job >= 0 else 0
        if right is not None:
            pair.set_right(right)
            pair.merge_right_diff = jobs[g.right_job].diff if g.right_job >= 0 else 0
        return pair

    def _job_output(self, job_id: int, jobs, batch, work):
        if job_id < 0:
            return None
        from gencore_tpu.core.oracle import oread_from_batch
        job = jobs[job_id]
        r = oread_from_batch(batch, job.template_read)
        n = r.l_qseq
        # voting covered positions [0, job_len); beyond that the template's
        # post-overlap-scoring qual persists (quals mutated in computeScore)
        row = work.row_of_one(job.template_read)
        r.seq = work.seq[row, :n].copy()
        r.qual = work.qual[row, :n].copy()
        jl = job.job_len
        r.seq[:jl] = job.new_seq[:jl]
        r.qual[:jl] = job.new_qual[:jl]
        if job.minc != 0 and job.minc <= 5:
            new_nm = r.nm_val + job.minc
            if r.nm_typ == "C" and 0 <= new_nm <= 255:
                r.nm_new = new_nm
        return r


_ASCII_TO_NT16 = np.zeros(256, dtype=np.uint8)
_ASCII_TO_NT16[ord("A")] = 1
_ASCII_TO_NT16[ord("C")] = 2
_ASCII_TO_NT16[ord("G")] = 4
_ASCII_TO_NT16[ord("T")] = 8


class _WorkArrays:
    """Dense working matrices for clustered reads; rows map from record
    index via searchsorted (cidx is ascending)."""

    def __init__(self, batch, cidx: np.ndarray, max_len: int, default_score: int = 6):
        self.L = max_len
        self.cidx = cidx
        self.seq = batch.seq_matrix(cidx, max_len)
        self.qual = batch.qual_matrix(cidx, max_len)
        self.score = np.full((len(cidx), max_len), default_score, dtype=np.int8)

    def row_of(self, read_idx: np.ndarray) -> np.ndarray:
        return np.searchsorted(self.cidx, read_idx)

    def row_of_one(self, read_idx: int) -> int:
        return int(np.searchsorted(self.cidx, read_idx))
