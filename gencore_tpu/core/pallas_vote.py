"""Pallas TPU kernel for the consensus voting hot loop.

The XLA formulation of the voting math (core.kernels._vote_core) lowers to
~250 HLO ops, which this environment's TPU toolchain compiles at ~0.4s/op —
minutes per shape. The Pallas kernel packs the whole per-position vote into
one Mosaic kernel (single custom call), compiling in seconds and running at
VPU speed.

Layout: member tensors are [K, J, L] (K leading) so each grid block sees
(K, TJ, L) with the aligned (sublane, lane) = (TJ, L) tile in the trailing
dims. The kernel emits per-position candidate outputs + change/mismatch
masks; a tiny XLA epilogue applies the reference's per-read rollback rule
(mismatchInc > 5 -> restore, group.cpp:538-566).

Semantics: identical to kernels._vote_core with full_bins=False (=ACGTN
data; other data falls back to the XLA kernel). Equivalence is enforced by
tests/test_pallas_vote.py in interpreter mode and, on TPU, compiled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
BINS = (0, 1, 2, 4, 8, 15)  # non-empty bins for =ACGTN data (see kernels.py)


SENTINEL = 255  # member-absent marker (never matches a bin or refbase)

# sparse wire-encoding caps (see _epilogue): inline seq edits / qual runs
# per job; jobs exceeding either are pulled densely by the collector.
# R=10/C=4 with nibble-paired edit bases and table-indexed run values is
# ~27 B/job; measured on the bench workloads (deep panel + amplicon pile)
# per-job runs are p50=2 / max=10 and seq edits p99=2 / max=4, so these
# caps see no overflow there while cutting ~25% of download bytes vs the
# old R=12/C=8 (the dense-pull fallback still covers any tail).
# SPARSE_DIFFS must stay even (bases pack 2/byte).
SPARSE_DIFFS = 4
SPARSE_RUNS = 10


def _vote_block(seq, qual, score, refbase, hi, mod, lo, bsr, rnum, rden):
    """Voting math on one block: seq/qual/score [K, TJ, L] (absent members
    carry SENTINEL rows with qual=0/score=0), refbase [TJ, L]. Returns
    (cand_seq, cand_qual, changed, minc_pos) each int32 [TJ, L]; position
    masking by job length is applied in the XLA epilogue.

    All masks are kept as int32 0/1 values with fresh comparisons at select
    sites — Mosaic cannot re-truncate spilled i8 booleans to i1, and cannot
    insert minor dims on sub-32-bit vectors, so no boolean or 3-D
    intermediates are stored.
    """
    K, TJ, L = seq.shape
    B = len(BINS)

    zero = jnp.zeros((TJ, L), dtype=I32)
    neg_inf = jnp.int32(-0x7FFFFFFF)
    rb = refbase
    has_ref = (rb != 0).astype(I32)

    countsB = [zero] * B
    scoresB = [zero] * B
    qualsB = [zero] * B
    topqB = [zero] * B
    total_score = zero
    ref_qual = zero
    high_ref = zero

    for k in range(K):
        sk = seq[k]
        sck = jnp.where(sk == SENTINEL, 0, score[k])
        qlk = jnp.where(sk == SENTINEL, 0, qual[k])
        total_score = total_score + sck
        for bi, b in enumerate(BINS):
            m = (sk == b).astype(I32)
            countsB[bi] = countsB[bi] + m
            scoresB[bi] = scoresB[bi] + m * sck
            qualsB[bi] = qualsB[bi] + m * qlk
            topqB[bi] = jnp.maximum(topqB[bi], m * qlk)
        refm = (sk == rb).astype(I32) * has_ref
        ref_qual = jnp.maximum(ref_qual, refm * qlk)
        high_ref = jnp.maximum(high_ref, refm * (qlk >= hi).astype(I32))

    # top election: lexmax of (score, qual, b) — see kernels.py proof
    top_base = zero
    top_score = jnp.full((TJ, L), neg_inf)
    top_qual_sum = zero
    for bi, b in enumerate(BINS):
        better = ((scoresB[bi] > top_score) |
                  ((scoresB[bi] == top_score) & (qualsB[bi] >= top_qual_sum))).astype(I32)
        top_base = better * b + (1 - better) * top_base
        top_score = better * scoresB[bi] + (1 - better) * top_score
        top_qual_sum = better * qualsB[bi] + (1 - better) * top_qual_sum
    vb = ((0 > top_score) |
          ((top_score == 0) & (top_qual_sum <= 0) & (top_base < 14))).astype(I32)
    top_base = vb * 14 + (1 - vb) * top_base
    top_score = (1 - vb) * top_score
    top_qual_sum = (1 - vb) * top_qual_sum

    sec_base = zero
    sec_score = jnp.full((TJ, L), neg_inf)
    sec_qual_sum = zero
    for bi, b in enumerate(BINS):
        better = ((top_base != b) &
                  ((scoresB[bi] > sec_score) |
                   ((scoresB[bi] == sec_score) & (qualsB[bi] >= sec_qual_sum)))).astype(I32)
        sec_base = better * b + (1 - better) * sec_base
        sec_score = better * scoresB[bi] + (1 - better) * sec_score
        sec_qual_sum = better * qualsB[bi] + (1 - better) * sec_qual_sum
    vidx = jnp.where(top_base == 14, 13, 14)
    vb = ((0 > sec_score) |
          ((sec_score == 0) & (sec_qual_sum <= 0) & (sec_base < vidx))).astype(I32)
    sec_base = vb * vidx + (1 - vb) * sec_base
    sec_score = (1 - vb) * sec_score
    sec_qual_sum = (1 - vb) * sec_qual_sum

    def take_bin(arrs, idx):
        out = zero
        for bi, b in enumerate(BINS):
            out = jnp.where(idx == b, arrs[bi], out)
        return out

    top_num = take_bin(countsB, top_base)
    top_qual = take_bin(topqB, top_base)
    sec_num = take_bin(countsB, sec_base)
    sec_qsum = take_bin(qualsB, sec_base)

    accept_early = ((sec_num == 0) & (top_score >= bsr) & (top_qual >= mod)).astype(I32)

    nr = ((sec_num == 0).astype(I32)) * (1 - accept_early)
    low_sec = (sec_qsum <= lo).astype(I32)
    nr1a = ((top_num < 2) & (top_qual < hi)).astype(I32)
    nr1b = ((top_num < 3) | (top_qual < hi)).astype(I32)
    nr = jnp.maximum(nr, (sec_num == 1).astype(I32) *
                     (low_sec * nr1a + (1 - low_sec) * nr1b))
    nr = jnp.maximum(nr, (sec_num > 1).astype(I32) *
                     ((top_score * rden < rnum * total_score) |
                      (top_qual < mod)).astype(I32))
    nr = jnp.maximum(nr, ((top_score < bsr) | (top_qual <= lo)).astype(I32))

    do_ref = nr * has_ref * (1 - accept_early)

    sel = do_ref * high_ref
    top_base2 = sel * rb + (1 - sel) * top_base
    sel = do_ref * (top_qual < mod).astype(I32)
    top_base2 = sel * rb + (1 - sel) * top_base2
    sel = do_ref * (top_base2 == rb).astype(I32)
    top_qual2 = sel * ref_qual + (1 - sel) * top_qual

    out_base = seq[0]

    changed = (1 - accept_early) * (out_base != top_base2).astype(I32)
    cand_seq = changed * top_base2 + (1 - changed) * out_base
    cand_qual = accept_early * top_qual + (1 - accept_early) * top_qual2
    inner = jnp.where(out_base == rb, 1, jnp.where(top_base2 == rb, -1, 0))
    minc_pos = changed * has_ref * inner
    return cand_seq, cand_qual, changed, minc_pos


def _kernel(seq_ref, qual_ref, score_ref, ref_ref,
            cseq_ref, cqual_ref, chg_ref, minc_ref, *, hi, mod, lo, bsr,
            rnum, rden):
    cs, cq, ch, mi = _vote_block(
        seq_ref[:], qual_ref[:], score_ref[:], ref_ref[:],
        hi, mod, lo, bsr, rnum, rden)
    cseq_ref[:] = cs
    cqual_ref[:] = cq
    chg_ref[:] = ch
    minc_ref[:] = mi


def _pallas_core(seq, qual, score, refbase, valid, *, hi, mod, lo,
                 base_score_req, ratio_num, ratio_den, tj, interpret):
    """The pallas_call with sentinel masking; callers jit it so the
    outputs are program results and XLA materializes them to HBM instead
    of stack-allocating the full arrays in scoped VMEM (which OOMs for
    large J)."""
    K, J, L = seq.shape
    grid = (J // tj,)
    kern = functools.partial(_kernel, hi=hi, mod=mod, lo=lo,
                             bsr=base_score_req, rnum=ratio_num, rden=ratio_den)
    invalid = ~(valid.astype(bool))
    seq_s = jnp.where(invalid[:, :, None], SENTINEL, seq.astype(I32))
    qual_s = jnp.where(invalid[:, :, None], 0, qual.astype(I32))
    score_s = jnp.where(invalid[:, :, None], 0, score.astype(I32))
    out_shapes = tuple(jax.ShapeDtypeStruct((J, L), I32) for _ in range(4))
    member_spec = pl.BlockSpec((K, tj, L), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tj, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        out_shape=out_shapes,
        in_specs=[member_spec, member_spec, member_spec, out_spec],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        interpret=interpret,
    )(seq_s, qual_s, score_s, refbase.astype(I32))


_pallas_stage = functools.partial(jax.jit, static_argnames=(
    "hi", "mod", "lo", "base_score_req", "ratio_num", "ratio_den", "tj",
    "interpret"))(_pallas_core)


@functools.partial(jax.jit, static_argnames=(
    "hi", "mod", "lo", "base_score_req", "ratio_num", "ratio_den", "tj",
    "interpret"))
def _pallas_stage_gathered(seq_dev, qual_dev, score_dev, rows_t, refbase,
                           valid, *, hi, mod, lo, base_score_req,
                           ratio_num, ratio_den, tj, interpret):
    """Member row-gather fused with the pallas vote in ONE jit — the
    remote transport charges ~30ms per execute, so the separate gather
    execute per bucket was pure latency."""
    seq = seq_dev[rows_t]
    qual = qual_dev[rows_t]
    score = score_dev[rows_t]
    return _pallas_core(seq, qual, score, refbase, valid, hi=hi, mod=mod,
                        lo=lo, base_score_req=base_score_req,
                        ratio_num=ratio_num, ratio_den=ratio_den, tj=tj,
                        interpret=interpret)


def _epilogue_core(cseq, cqual, chg, minc_pos, seq0, qual0,
                   job_len, *, hi, mod, lo, base_score_req, ratio_num,
                   ratio_den, out_len=None, sparse=False,
                   n_diffs=SPARSE_DIFFS, n_runs=SPARSE_RUNS, qtable=None):
    """Per-read rollback + output packing. new_seq ships 4-bit packed
    (BAM nibble layout, first base in the high nibble) — the transport
    has no wire compression, so halving the seq bytes halves its
    download time; the host unpacks vectorized.

    sparse=True additionally emits a compact wire encoding (the dense
    arrays stay device-resident for overflow fallback):
      * seq as up to `n_diffs` (position, base) edits vs the template row
        (the consensus equals the template except at changed positions,
        group.cpp:504-516), plus the true edit count; edit bases are
        nibble-PAIRED (2 per byte);
      * qual as up to `n_runs` run-length (start, value) pairs, plus the
        true run count; when `qtable` (a device [16] u8 candidate table,
        see engine._vote_qual_table) is given, run values ship as nibble
        pairs of table indices with a `bad` escape counter — the host
        dense-pulls any bucket whose values escaped the closure.
    Requires out_len <= 256 so positions fit a byte (checked by caller).
    """
    J, L = cseq.shape
    pos_valid = jnp.arange(L, dtype=I32)[None, :] < job_len[:, None]
    tmpl_seq = seq0.astype(I32)
    tmpl_qual = qual0.astype(I32)
    chg = jnp.where(pos_valid, chg, 0)
    minc_pos = jnp.where(pos_valid, minc_pos, 0)
    cseq = jnp.where(pos_valid, cseq, tmpl_seq)
    cqual = jnp.where(pos_valid, cqual, tmpl_qual)
    diff = chg.sum(axis=1)
    minc = minc_pos.sum(axis=1)
    rollback = (minc > 5)[:, None]
    new_seq = jnp.where(rollback, tmpl_seq, cseq).astype(jnp.uint8)
    new_qual = jnp.where(rollback, tmpl_qual, cqual).astype(jnp.uint8)
    ol = L if out_len is None else min(out_len, L)
    new_seq = new_seq[:, :ol]
    new_qual = new_qual[:, :ol]
    pseq = (new_seq[:, 0::2] << 4) | new_seq[:, 1::2]
    if not sparse:
        return pseq, new_qual, diff, minc

    # ---- seq edits vs the template row (final rows, so rollback and
    # out-of-range positions are already template values and never edit)
    emask = (new_seq != seq0.astype(jnp.uint8)[:, :ol]).astype(I32)
    nd = emask.sum(axis=1)
    ranks = jnp.cumsum(emask, axis=1) * emask      # 1..nd at edit positions
    sp = []
    sb = []
    for d in range(1, n_diffs + 1):
        pos = jnp.argmax((ranks == d).astype(I32), axis=1).astype(I32)
        sp.append(pos)
        sb.append(jnp.take_along_axis(new_seq, pos[:, None], axis=1)[:, 0])
    sp = jnp.stack(sp, axis=1).astype(jnp.uint8)
    sb = jnp.stack(sb, axis=1).astype(jnp.uint8)
    # edit bases are 4-bit codes: pair them (n_diffs must be even)
    sbp = (sb[:, 0::2] << 4) | sb[:, 1::2]

    # ---- qual runs
    q = new_qual.astype(I32)
    b = jnp.concatenate(
        [jnp.ones((J, 1), I32), (q[:, 1:] != q[:, :-1]).astype(I32)], axis=1)
    rid = jnp.cumsum(b, axis=1) * b                # run no. (1-based) at starts
    qs = []
    qv = []
    for r in range(1, n_runs + 1):
        pos = jnp.argmax((rid == r).astype(I32), axis=1).astype(I32)
        qs.append(pos)
        qv.append(jnp.take_along_axis(q, pos[:, None], axis=1)[:, 0])
    qs = jnp.stack(qs, axis=1).astype(jnp.uint8)
    qv = jnp.stack(qv, axis=1).astype(jnp.uint8)
    nr = b.sum(axis=1)

    if qtable is not None:
        # run values as nibble-paired table indices; `bad` counts escapes
        # (host falls back to the dense pull for the whole bucket)
        qenc = jnp.zeros(qv.shape, jnp.uint8)
        qdec = jnp.zeros(qv.shape, jnp.uint8)
        for i in range(1, 16):
            hit = qv == qtable[i]
            qenc = jnp.where(hit, jnp.uint8(i), qenc)
            qdec = jnp.where(hit, qtable[i], qdec)
        vrun = jnp.arange(n_runs, dtype=I32)[None, :] < jnp.minimum(
            nr, n_runs)[:, None]
        bad = jnp.sum(((qdec != qv) & vrun).astype(I32))
        qvp = (qenc[:, 0::2] << 4) | qenc[:, 1::2]
        enc = (qvp, qs, jnp.minimum(nr, 255).astype(jnp.uint8),
               sp, sbp, jnp.minimum(nd, 255).astype(jnp.uint8),
               diff.astype(jnp.int16), minc.astype(jnp.int16),
               bad.astype(jnp.int32))
    else:
        enc = (qv, qs, jnp.minimum(nr, 255).astype(jnp.uint8),
               sp, sbp, jnp.minimum(nd, 255).astype(jnp.uint8),
               diff.astype(jnp.int16), minc.astype(jnp.int16),
               jnp.zeros((), jnp.int32))
    return pseq, new_qual, diff, minc, enc


_epilogue = functools.partial(jax.jit, static_argnames=(
    "hi", "mod", "lo", "base_score_req", "ratio_num", "ratio_den", "out_len",
    "sparse", "n_diffs", "n_runs"))(_epilogue_core)


@functools.partial(jax.jit, static_argnames=(
    "hi", "mod", "lo", "base_score_req", "ratio_num", "ratio_den", "out_len",
    "sparse", "n_diffs", "n_runs"))
def _epilogue_gathered(cseq, cqual, chg, minc_pos, seq_dev, qual_dev, row0,
                       job_len, qtable=None, *, hi, mod, lo, base_score_req,
                       ratio_num, ratio_den, out_len=None, sparse=False,
                       n_diffs=SPARSE_DIFFS, n_runs=SPARSE_RUNS):
    """Epilogue variant for the fused-gather path: the template rows are
    fetched from the device-resident matrices inside the same jit."""
    seq0 = seq_dev[row0]
    qual0 = qual_dev[row0]
    return _epilogue_core(cseq, cqual, chg, minc_pos, seq0, qual0, job_len,
                          hi=hi, mod=mod, lo=lo,
                          base_score_req=base_score_req, ratio_num=ratio_num,
                          ratio_den=ratio_den, out_len=out_len, sparse=sparse,
                          n_diffs=n_diffs, n_runs=n_runs, qtable=qtable)


def pallas_vote(seq, qual, score, valid, job_len, refbase, *, hi, mod, lo,
                base_score_req, ratio_num, ratio_den, tj=256,
                interpret=False, out_len=None, sparse=False):
    """Pallas-backed voting over gathered member tensors.

    seq/qual [K, J, L] uint8, score [K, J, L] int8, valid [K, J] (any int),
    job_len [J] int32, refbase [J, L] uint8. J must be a multiple of tj.
    Returns (pseq, new_qual, diff, minc): pseq is the consensus sequence
    4-bit packed (BAM nibble layout, [J, out_len//2]); new_qual is raw
    [J, out_len]. Semantics after host unpack match kernels._vote_core
    (full_bins=False) including rollback.

    sparse=True appends the compact wire encoding (see _epilogue): returns
    (pseq, new_qual, diff, minc, enc) with the first four still on device.
    """
    tj = _TJ_USED.get(tj, tj)
    kw = dict(hi=hi, mod=mod, lo=lo, base_score_req=base_score_req,
              ratio_num=ratio_num, ratio_den=ratio_den)
    # self-tuning tile: halve on scoped-VMEM OOM (remote toolchains vary)
    cur = tj
    while True:
        try:
            cseq, cqual, chg, minc_pos = _pallas_stage(
                seq, qual, score, refbase, valid, tj=cur,
                interpret=interpret, **kw)
            break
        except Exception as e:  # jax.errors.JaxRuntimeError on compile OOM
            if cur > 8 and "vmem" in str(e).lower():
                cur //= 2
                continue
            raise
    _TJ_USED[tj] = cur
    return _epilogue(cseq, cqual, chg, minc_pos, seq[0], qual[0],
                     jnp.asarray(job_len, dtype=I32),
                     out_len=out_len, sparse=sparse, **kw)


@functools.partial(jax.jit, static_argnames=(
    "classes", "L", "hi", "mod", "lo", "base_score_req", "ratio_num",
    "ratio_den", "tjs", "interpret", "out_len"))
def _pallas_window_all(seq_dev, qual_dev, score_dev, genome, gp, hr, hm, jp,
                       qtable, *class_args, classes, L, hi, mod, lo,
                       base_score_req, ratio_num, ratio_den, tjs, interpret,
                       out_len):
    """EVERY fast vote bucket of one window in ONE device program:
    refbase assembly (genome slice-gather + host rows), per-k-class member
    gather + pallas vote + rollback/sparse-encode epilogue, and the
    cross-class wire concat — the remote transport charges ~30-50ms per
    execute, so the whole window's voting is one round trip. Returns
    (flat u8 wire buffer, refbase_dev, [per-class (pseq, qual) dense
    fallbacks]). The flat layout matches engine._concat_sparse_fn:
    [qv | qs | nr | sp | sb | nd | df | mc | bads]."""
    kw = dict(hi=hi, mod=mod, lo=lo, base_score_req=base_score_req,
              ratio_num=ratio_num, ratio_den=ratio_den)
    # refbase for ALL fast jobs (engine._refbase_device semantics)
    hm32 = hm.astype(I32)
    g = jax.vmap(lambda s: jax.lax.dynamic_slice(genome, (s,), (L,)))(gp)
    keep = (jnp.arange(L, dtype=I32)[None, :]
            < jp.astype(I32)[:, None])
    g = jnp.where(keep, g, 0)
    h = hr[jnp.clip(hm32, 0, hr.shape[0] - 1)]
    refbase_dev = jnp.where((hm32 < 0)[:, None], g, h)

    n_pad = seq_dev.shape[0]
    parts = [[] for _ in range(8)]
    bads = []
    dense = []
    for ci, (K, _J2) in enumerate(classes):
        base_row, counts, jl, ridx = class_args[4 * ci:4 * ci + 4]
        br = base_row.astype(I32)
        k_iota = jnp.arange(K, dtype=I32)[:, None]
        rows_t = jnp.clip(br[None, :] + k_iota, 0, n_pad - 1)
        valid = k_iota < counts[None, :].astype(I32)
        refbase = refbase_dev[ridx.astype(I32)]
        cseq, cqual, chg, minc_pos = _pallas_core(
            seq_dev[rows_t], qual_dev[rows_t], score_dev[rows_t], refbase,
            valid, tj=tjs[ci], interpret=interpret, **kw)
        res = _epilogue_core(cseq, cqual, chg, minc_pos, seq_dev[br],
                             qual_dev[br], jl.astype(I32), out_len=out_len,
                             sparse=True, qtable=qtable, **kw)
        enc = res[4]
        for k in range(8):
            parts[k].append(enc[k])
        bads.append(enc[8].reshape(()))
        dense.append((res[0], res[1]))
    cat = [jnp.concatenate(p, axis=0) if len(p) > 1 else p[0]
           for p in parts]
    qv, qs, nr, sp, sb, nd, df16, mc16 = cat
    flat = jnp.concatenate([
        qv.reshape(-1), qs.reshape(-1), nr.reshape(-1),
        sp.reshape(-1), sb.reshape(-1), nd.reshape(-1),
        jax.lax.bitcast_convert_type(df16, jnp.uint8).reshape(-1),
        jax.lax.bitcast_convert_type(mc16, jnp.uint8).reshape(-1),
        jax.lax.bitcast_convert_type(jnp.stack(bads), jnp.uint8).reshape(-1),
    ])
    return flat, refbase_dev, dense


def pallas_vote_window(seq_dev, qual_dev, score_dev, genome, gp, hr, hm, jp,
                       qtable, class_args, *, classes, L, hi, mod, lo,
                       base_score_req, ratio_num, ratio_den,
                       interpret=False, out_len=None):
    """One-execute whole-window vote dispatch (see _pallas_window_all)
    with per-class VMEM tile self-tuning."""
    tjs0 = tuple(max(8, min(32, 1024 // K)) for K, _ in classes)
    tjs0 = tuple(min(t, j2) for t, (_, j2) in zip(tjs0, classes))
    tjs = tuple(_TJ_USED.get(("w", K), t) for t, (K, _) in zip(tjs0, classes))
    while True:
        try:
            return _pallas_window_all(
                seq_dev, qual_dev, score_dev, genome, gp, hr, hm, jp,
                qtable, *class_args, classes=classes, L=L, hi=hi, mod=mod,
                lo=lo, base_score_req=base_score_req, ratio_num=ratio_num,
                ratio_den=ratio_den, tjs=tjs, interpret=interpret,
                out_len=out_len)
        except Exception as e:  # jax.errors.JaxRuntimeError on compile OOM
            if max(tjs) > 8 and "vmem" in str(e).lower():
                tjs = tuple(max(8, t // 2) for t in tjs)
                for t, (K, _) in zip(tjs, classes):
                    _TJ_USED[("w", K)] = t
                continue
            raise


def pallas_vote_gathered(seq_dev, qual_dev, score_dev, rows_t, row0, valid,
                         job_len, refbase, qtable=None, *, hi, mod, lo,
                         base_score_req, ratio_num, ratio_den, tj=256,
                         interpret=False, out_len=None, sparse=False):
    """pallas_vote with the member gather and template-row fetch fused
    into the device programs: 2 executes per bucket (stage + epilogue)
    instead of 3 — per-execute latency is ~30ms on the remote transport.

    rows_t int32 [K, J] member work rows (transposed); row0 int32 [J]
    template rows; other args as pallas_vote."""
    tj = _TJ_USED.get(tj, tj)
    kw = dict(hi=hi, mod=mod, lo=lo, base_score_req=base_score_req,
              ratio_num=ratio_num, ratio_den=ratio_den)
    cur = tj
    while True:
        try:
            cseq, cqual, chg, minc_pos = _pallas_stage_gathered(
                seq_dev, qual_dev, score_dev, rows_t, refbase, valid,
                tj=cur, interpret=interpret, **kw)
            break
        except Exception as e:  # jax.errors.JaxRuntimeError on compile OOM
            if cur > 8 and "vmem" in str(e).lower():
                cur //= 2
                continue
            raise
    _TJ_USED[tj] = cur
    return _epilogue_gathered(cseq, cqual, chg, minc_pos, seq_dev, qual_dev,
                              jnp.asarray(row0, dtype=I32),
                              jnp.asarray(job_len, dtype=I32), qtable,
                              out_len=out_len, sparse=sparse, **kw)


_TJ_USED: dict = {}
