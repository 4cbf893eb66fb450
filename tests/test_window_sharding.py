"""Coordinate-window sharding must be record- and stats-equivalent to a
single-shot run (the multi-host scaling contract)."""

import numpy as np
import pytest

from gencore_tpu.engine import VectorEngine
from gencore_tpu.io import bam
from gencore_tpu.io.fasta import FastaRef
from gencore_tpu.options import Options
from gencore_tpu.parallel import windows
from tests.datagen import SyntheticBam
from tests.test_engine_equivalence import STAT_FIELDS, make_random_workload


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_equals_single(tmp_path, n_shards):
    sb = make_random_workload(50, n_fragments=200, umi_mode="duplex",
                              contig_len=600_000, n_contigs=2)
    bam_path = str(tmp_path / "in.bam")
    fa = str(tmp_path / "ref.fa")
    sb.write_bam(bam_path)
    sb.write_fasta(fa)
    ref = FastaRef.load(fa)
    reader = bam.BamReader(bam_path)
    batch = reader.read_all()

    single_opt = Options()
    eng = VectorEngine(single_opt, reader.header, fasta=ref)
    single = eng.run(bam.BamReader(bam_path).read_all())
    single_recs = sorted(single.encoded_records())

    sopt = Options()
    tables, pre, post = windows.run_sharded(sopt, batch, reader.header,
                                            fasta=ref, n_shards=n_shards)
    sharded_recs = sorted(b for t in tables for b in t.encoded_records())
    assert len(single_recs) == len(sharded_recs)
    for a, b in zip(single_recs, sharded_recs):
        assert a == b

    for f in STAT_FIELDS:
        assert getattr(eng.pre_stats, f) == getattr(pre, f), ("pre", f)
        assert getattr(eng.post_stats, f) == getattr(post, f), ("post", f)
    assert (eng.pre_stats.supporting_histogram == pre.supporting_histogram).all()
    for a, b in zip(eng.pre_stats.genome_depth, pre.genome_depth):
        assert (a == b).all()
    for a, b in zip(eng.post_stats.genome_depth, post.genome_depth):
        assert (a == b).all()

    # merged ordering is bamComp-sorted
    merged = windows.merged_records(tables)
    assert sorted(merged) == sharded_recs


def test_sharded_tick_checkpoint(tmp_path):
    """Global checkpoint injection: >10000 clustered reads split over
    shards must reproduce the single-run threshold behavior."""
    sb = SyntheticBam(seed=51, contig_len=4_000_000)
    rng = np.random.default_rng(52)
    for k in range(5500):
        pos1 = 1000 + 600 * k
        sb.add_pair(0, pos1, pos1 + 150, umi=str(rng.choice(["AAAA", "AAAT"])))
    bam_path = str(tmp_path / "in.bam")
    sb.write_bam(bam_path)
    reader = bam.BamReader(bam_path)
    batch = reader.read_all()

    eng = VectorEngine(Options(), reader.header)
    single = eng.run(bam.BamReader(bam_path).read_all())
    tables, pre, post = windows.run_sharded(Options(), batch, reader.header,
                                            n_shards=3)
    single_recs = sorted(single.encoded_records())
    sharded_recs = sorted(b for t in tables for b in t.encoded_records())
    assert single_recs == sharded_recs
    assert eng.post_stats.sscs_num == post.sscs_num


def test_checkpoint_resume(tmp_path):
    """Crash-resume: completed shards load from the manifest and the final
    result is identical; changed options invalidate the checkpoint."""
    sb = make_random_workload(53, n_fragments=80, umi_mode="single",
                              contig_len=300_000, n_contigs=1)
    bam_path = str(tmp_path / "in.bam")
    sb.write_bam(bam_path)
    reader = bam.BamReader(bam_path)
    batch = reader.read_all()
    ckdir = str(tmp_path / "ck")

    t1, pre1, post1 = windows.run_sharded(Options(), batch, reader.header,
                                          n_shards=3, checkpoint_dir=ckdir)
    recs1 = sorted(b for t in t1 for b in t.encoded_records())

    # resume: all shards come from the checkpoint
    t2, pre2, post2 = windows.run_sharded(Options(), batch, reader.header,
                                          n_shards=3, checkpoint_dir=ckdir)
    from gencore_tpu.parallel.windows import LoadedShard
    assert all(isinstance(t, LoadedShard) for t in t2)
    recs2 = sorted(b for t in t2 for b in t.encoded_records())
    assert recs1 == recs2
    for f in STAT_FIELDS:
        assert getattr(post1, f) == getattr(post2, f), f
        assert getattr(pre1, f) == getattr(pre2, f), f

    # different options -> fresh run (manifest fingerprint mismatch)
    t3, _, _ = windows.run_sharded(Options(cluster_size_req=2), batch,
                                   reader.header, n_shards=3,
                                   checkpoint_dir=str(tmp_path / "ck2"))
    assert not all(isinstance(t, LoadedShard) for t in t3)
