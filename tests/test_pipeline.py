"""The window pipeline (overlapped dispatch/collect, optional multi-device
round-robin) must be record- and stats-equivalent to a single-shot run."""

import jax
import numpy as np
import pytest

from gencore_tpu.engine import VectorEngine
from gencore_tpu.io import bam
from gencore_tpu.io.fasta import FastaRef
from gencore_tpu.options import Options
from gencore_tpu.parallel import pipeline, windows
from tests.test_engine_equivalence import STAT_FIELDS, make_random_workload


def _run_single(bam_path, ref):
    reader = bam.BamReader(bam_path)
    eng = VectorEngine(Options(), reader.header, fasta=ref)
    table = eng.run(reader.read_all())
    return eng, table


@pytest.mark.parametrize("n_windows,use_devices", [(3, False), (5, True)])
def test_pipeline_equals_single(tmp_path, n_windows, use_devices):
    sb = make_random_workload(60, n_fragments=220, umi_mode="duplex",
                              contig_len=600_000, n_contigs=2)
    bam_path = str(tmp_path / "in.bam")
    fa = str(tmp_path / "ref.fa")
    sb.write_bam(bam_path)
    sb.write_fasta(fa)
    ref = FastaRef.load(fa)
    eng, single = _run_single(bam_path, ref)
    single_recs = sorted(single.encoded_records())

    reader = bam.BamReader(bam_path)
    batch = reader.read_all()
    devices = jax.devices() if use_devices else None
    tables, pre, post = pipeline.run_pipelined(
        Options(), batch, reader.header, fasta=ref,
        n_windows=n_windows, devices=devices)
    piped = sorted(b for t in tables for b in t.encoded_records())
    assert single_recs == piped

    for f in STAT_FIELDS:
        assert getattr(eng.pre_stats, f) == getattr(pre, f), ("pre", f)
        assert getattr(eng.post_stats, f) == getattr(post, f), ("post", f)
    assert (eng.pre_stats.supporting_histogram == pre.supporting_histogram).all()
    for a, b in zip(eng.pre_stats.genome_depth, pre.genome_depth):
        assert (a == b).all()
    for a, b in zip(eng.post_stats.genome_depth, post.genome_depth):
        assert (a == b).all()

    # merged ordering matches the single-run output order
    merged = windows.merged_records(tables)
    assert merged == single.encoded_records()


def test_pipeline_incremental_writer_byte_identical(tmp_path):
    """out_writer (incremental per-window BGZF flush) must produce a BAM
    whose decompressed payload is byte-identical to writing
    merged_payload(tables) at the end."""
    from gencore_tpu.io import native
    from gencore_tpu.io import bgzf
    if native.get_lib() is None:
        pytest.skip("needs the native core")
    from gencore_tpu.parallel.streaming import StreamingBamWriter
    sb = make_random_workload(62, n_fragments=260, umi_mode="duplex",
                              contig_len=500_000, n_contigs=2)
    bam_path = str(tmp_path / "in.bam")
    fa = str(tmp_path / "ref.fa")
    sb.write_bam(bam_path)
    sb.write_fasta(fa)
    ref = FastaRef.load(fa)

    reader = bam.BamReader(bam_path)
    batch = reader.read_all()
    tables, pre1, post1 = pipeline.run_pipelined(
        Options(), batch, reader.header, fasta=ref, n_windows=4)
    base_path = str(tmp_path / "base.bam")
    w = bam.BamWriter(base_path, reader.header)
    w.write_payload(pipeline.merged_payload(tables))
    w.close()

    reader2 = bam.BamReader(bam_path)
    batch2 = reader2.read_all()
    inc_path = str(tmp_path / "inc.bam")
    iw = StreamingBamWriter(inc_path, reader2.header)
    t2, pre2, post2 = pipeline.run_pipelined(
        Options(), batch2, reader2.header, fasta=ref, n_windows=4,
        out_writer=iw)
    iw.close()
    assert t2 == []
    assert iw.records_written == sum(len(t) for t in tables)
    # byte-identical INCLUDING BGZF framing (the tail-carry chunking)
    assert open(inc_path, "rb").read() == open(base_path, "rb").read()
    assert bgzf.decompress_file(inc_path) == bgzf.decompress_file(base_path)
    for f in STAT_FIELDS:
        assert getattr(pre1, f) == getattr(pre2, f), ("pre", f)
        assert getattr(post1, f) == getattr(post2, f), ("post", f)


def test_pipeline_collector_failure_propagates(tmp_path, monkeypatch):
    """A collector-thread failure must raise, not deadlock: the dispatch
    side fills the bounded queue while the collector is busy, and a dead
    collector never drains it (regression for the blocking put)."""
    import time

    sb = make_random_workload(63, n_fragments=200, umi_mode="plain",
                              contig_len=400_000, n_contigs=1)
    bam_path = str(tmp_path / "in.bam")
    sb.write_bam(bam_path)
    reader = bam.BamReader(bam_path)
    batch = reader.read_all()

    def boom(self, st):
        time.sleep(1.0)  # let dispatch run ahead and fill the queue
        raise RuntimeError("simulated device failure")

    monkeypatch.setattr(VectorEngine, "run_collect", boom)
    t0 = time.time()
    with pytest.raises(RuntimeError, match="simulated device failure"):
        pipeline.run_pipelined(Options(), batch, reader.header,
                               n_windows=8)
    assert time.time() - t0 < 30  # not a hang


def test_plan_windows_never_splits_clusters(tmp_path):
    sb = make_random_workload(61, n_fragments=300, umi_mode="plain",
                              contig_len=400_000, n_contigs=2)
    bam_path = str(tmp_path / "in.bam")
    sb.write_bam(bam_path)
    reader = bam.BamReader(bam_path)
    batch = reader.read_all()
    wins = pipeline.plan_windows(batch, reader.header.lengths, 6)
    kind, left = windows.cluster_left_keys(batch)
    own = np.nonzero(kind > 0)[0]
    covered = np.concatenate(wins)
    assert sorted(covered.tolist()) == own.tolist()
    # same (tid, left) never appears in two windows
    seen = {}
    for w, idx in enumerate(wins):
        for key in zip(batch.tid[idx].tolist(),
                       left[idx].tolist()):
            assert seen.setdefault(key, w) == w
