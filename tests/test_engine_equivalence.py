"""Record-level equivalence: VectorEngine output must match the scalar
oracle exactly (encoded record multisets + all stats counters) on
randomized synthetic workloads covering dup clusters, UMIs, duplex,
soft-clips, errors, overlapping mates, pass-through and unmapped reads.
"""

import numpy as np
import pytest

from gencore_tpu.core.oracle import OracleEngine
from gencore_tpu.engine import VectorEngine
from gencore_tpu.io import bam
from gencore_tpu.io.fasta import FastaRef
from gencore_tpu.options import Options
from tests.datagen import SyntheticBam

STAT_FIELDS = [
    "read", "base", "read_unmapped", "base_unmapped", "base_mismatches",
    "read_with_mismatches", "cluster", "multi_molecule_cluster", "molecule",
    "molecule_se", "molecule_pe", "uncounted_supporting_reads", "sscs_num",
    "dcs_num",
]


def run_both(sb: SyntheticBam, tmp_path, opt_kwargs=None, use_fasta=True):
    bam_path = str(tmp_path / "in.bam")
    sb.write_bam(bam_path)
    reader = bam.BamReader(bam_path)
    ref = None
    if use_fasta:
        fa = str(tmp_path / "ref.fa")
        sb.write_fasta(fa)
        ref = FastaRef.load(fa)

    oopt = Options(**(opt_kwargs or {}))
    vopt = Options(**(opt_kwargs or {}))
    oeng = OracleEngine(oopt, reader.header, fasta=ref)
    oout = oeng.run(reader.read_all())
    veng = VectorEngine(vopt, reader.header, fasta=ref)
    vout = veng.run(reader.read_all())
    return (oeng, oout), (veng, vout)


def _enc_list(x):
    if hasattr(x, "encoded_records"):
        return sorted(x.encoded_records())
    return sorted(r.encode() for r in x)


def assert_equivalent(o, v):
    (oeng, oout), (veng, vout) = o, v
    o_enc = _enc_list(oout)
    v_enc = _enc_list(vout)
    assert len(o_enc) == len(v_enc), f"record count {len(o_enc)} vs {len(v_enc)}"
    for i, (a, b) in enumerate(zip(o_enc, v_enc)):
        assert a == b, f"record {i} differs"
    for f in STAT_FIELDS:
        for which, os_, vs_ in (("pre", oeng.pre_stats, veng.pre_stats),
                                ("post", oeng.post_stats, veng.post_stats)):
            assert getattr(os_, f) == getattr(vs_, f), (which, f)
    for os_, vs_ in ((oeng.pre_stats, veng.pre_stats),
                     (oeng.post_stats, veng.post_stats)):
        assert (os_.supporting_histogram == vs_.supporting_histogram).all()
        for a, b in zip(os_.genome_depth, vs_.genome_depth):
            assert (a == b).all()


def make_random_workload(seed: int, n_fragments: int = 120, umi_mode: str = "none",
                         contig_len: int = 400_000, n_contigs: int = 2,
                         error_rate: float = 0.3) -> SyntheticBam:
    sb = SyntheticBam(seed=seed, contig_len=contig_len, n_contigs=n_contigs)
    rng = np.random.default_rng(seed + 1000)
    umis4 = ["AAAA", "CCCC", "GGGG", "TTTT", "ACGT", "TGCA"]
    for _ in range(n_fragments):
        tid = int(rng.integers(0, n_contigs))
        pos1 = int(rng.integers(100, contig_len - 2000))
        frag = int(rng.integers(120, 320))
        read_len = int(rng.integers(80, 120))
        pos2 = pos1 + frag - read_len
        if pos2 < pos1:
            pos2 = pos1
        if umi_mode == "single":
            umi = str(rng.choice(umis4))
        elif umi_mode == "duplex":
            a, b = rng.choice(umis4, size=2, replace=False)
            umi = f"{a}_{b}" if rng.random() < 0.5 else f"{b}_{a}"
        else:
            umi = None
        ndup = int(rng.choice([1, 1, 1, 2, 2, 3, 5]))
        for _ in range(ndup):
            n_err = int(rng.random() < error_rate) * int(rng.integers(1, 3))
            softclip = int(rng.choice([0, 0, 0, 5]))
            qual = int(rng.choice([12, 18, 25, 35, 38]))
            sb.add_pair(tid, pos1, pos2, read_len=read_len, umi=umi,
                        n_errors=n_err, qual=qual, softclip_left=softclip)
    # a few mate-less and unmapped reads
    for _ in range(5):
        sb.add_single(0, int(rng.integers(100, contig_len - 200)), flag=0)
    for _ in range(3):
        sb.add_single(-1, -1, flag=4)
    return sb


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_equivalence_no_umi(tmp_path, seed):
    sb = make_random_workload(seed, umi_mode="none")
    o, v = run_both(sb, tmp_path)
    assert_equivalent(o, v)


@pytest.mark.parametrize("seed", [4, 5])
def test_equivalence_single_umi(tmp_path, seed):
    sb = make_random_workload(seed, umi_mode="single")
    o, v = run_both(sb, tmp_path)
    assert_equivalent(o, v)


@pytest.mark.parametrize("seed", [6, 7])
def test_equivalence_duplex_umi(tmp_path, seed):
    sb = make_random_workload(seed, umi_mode="duplex")
    o, v = run_both(sb, tmp_path)
    assert_equivalent(o, v)


def test_equivalence_supporting_reads_2(tmp_path):
    sb = make_random_workload(8, umi_mode="single")
    o, v = run_both(sb, tmp_path, {"cluster_size_req": 2})
    assert_equivalent(o, v)


def test_equivalence_no_fasta(tmp_path):
    sb = make_random_workload(9, umi_mode="none")
    o, v = run_both(sb, tmp_path, use_fasta=False)
    assert_equivalent(o, v)


def test_equivalence_overlapping_mates(tmp_path):
    sb = SyntheticBam(seed=30, contig_len=100_000)
    rng = np.random.default_rng(31)
    for k in range(40):
        pos1 = 1000 + 137 * k
        # heavy overlap: fragment shorter than 2 reads
        pos2 = pos1 + int(rng.integers(10, 90))
        for _ in range(int(rng.choice([1, 2, 3]))):
            sb.add_pair(0, pos1, pos2, read_len=100,
                        n_errors=int(rng.integers(0, 3)),
                        qual=int(rng.choice([15, 25, 35])),
                        qual2=int(rng.choice([15, 25, 35])))
    o, v = run_both(sb, tmp_path)
    assert_equivalent(o, v)


def test_equivalence_tick_flush(tmp_path):
    """>10000 clustered reads: watermark flush path + threshold quirk."""
    sb = SyntheticBam(seed=32, contig_len=2_000_000)
    rng = np.random.default_rng(33)
    for k in range(5300):
        pos1 = 1000 + 300 * k
        sb.add_pair(0, pos1, pos1 + 120, umi=str(rng.choice(["AAAA", "AAAT", "CCCC"])))
    o, v = run_both(sb, tmp_path)
    assert_equivalent(o, v)


def test_equivalence_variable_qname_lengths(tmp_path):
    """Qname reconciliation picks the shorter name (padded-length compare,
    group.cpp:114-123) — exercises the layout-shifting output path."""
    sb = SyntheticBam(seed=40, contig_len=100_000)
    rng = np.random.default_rng(41)
    orig = sb._qname

    def varname(umi):
        self_serial = sb._serial
        extra = "X" * int(rng.integers(0, 12))
        return orig(umi) + extra
    sb._qname = varname
    for k in range(30):
        pos1 = 1000 + 211 * k
        for _ in range(int(rng.choice([1, 2, 3]))):
            sb.add_pair(0, pos1, pos1 + 140, read_len=100,
                        n_errors=int(rng.integers(0, 2)))
    o, v = run_both(sb, tmp_path)
    assert_equivalent(o, v)


def test_equivalence_cross_contig_pairs(tmp_path):
    """Cross-contig mates: each end clustered separately with negative
    surrogate right keys + cross-contig qname selection (gencore.cpp:311,
    group.cpp:80-99)."""
    sb = SyntheticBam(seed=70, contig_len=200_000, n_contigs=3)
    rng = np.random.default_rng(71)
    for k in range(25):
        t1, t2 = rng.choice(3, size=2, replace=False)
        p1 = int(rng.integers(1000, 150_000))
        p2 = int(rng.integers(1000, 150_000))
        for _ in range(int(rng.choice([1, 2, 3]))):
            sb.add_cross_pair(int(t1), p1, int(t2), p2,
                              n_errors=int(rng.integers(0, 2)))
    # plus some normal pairs in between
    for k in range(20):
        sb.add_pair(0, 2000 + 400 * k, 2150 + 400 * k)
    o, v = run_both(sb, tmp_path)
    assert_equivalent(o, v)


def test_equivalence_mi_tag_umis(tmp_path):
    """UMIs carried in MI:Z: aux tags instead of qnames (bamutil.cpp:23-38)."""
    sb = SyntheticBam(seed=72, contig_len=100_000)
    rng = np.random.default_rng(73)
    for k in range(20):
        pos = 1000 + 300 * k
        mi = str(rng.choice(["AAAA_CCCC", "CCCC_AAAA", "GGGG_TTTT"]))
        for _ in range(int(rng.choice([1, 2]))):
            sb.add_pair_mi(0, pos, pos + 150, mi=mi)
    o, v = run_both(sb, tmp_path, {"umi_prefix": ""})
    assert_equivalent(o, v)


def test_equivalence_mi_tag_mixed_layouts(tmp_path):
    """MI extraction robustness: records whose aux layout shifts the MI
    offset (layout-probe miss -> per-record fallback), records without MI
    (qname fallback per read, bamutil.cpp:26-30), and varying MI lengths."""
    sb = SyntheticBam(seed=75, contig_len=100_000)
    rng = np.random.default_rng(76)
    mis = ["AAAA_CCCC", "CCCC_AAAA", "GGGG_TT", "TTTT_GGGG"]
    for k in range(25):
        pos = 1000 + 300 * k
        mi = str(rng.choice(mis))
        style = k % 3
        if style == 0:
            sb.add_pair_mi(0, pos, pos + 150, mi=mi)
        elif style == 1:
            # extra tag before MI shifts the aux layout
            qname = sb._qname(None)
            aux = b"XSC\x07" + b"MIZ" + mi.encode() + b"\x00"
            seq1, cg1 = sb.read_seq(0, pos, 100)
            seq2, cg2 = sb.read_seq(0, pos + 150, 100)
            sb._add(0, pos, qname, 99, cg1, 0, pos + 150, 250, seq1, 35, 0,
                    extra_aux=aux)
            sb._add(0, pos + 150, qname, 147, cg2, 0, pos, -250, seq2, 35, 0,
                    extra_aux=aux)
        else:
            sb.add_pair(0, pos, pos + 150, umi=mi)
    o, v = run_both(sb, tmp_path, {"umi_prefix": ""})
    assert_equivalent(o, v)


def test_equivalence_mi_tag_minority(tmp_path):
    """MI on a small minority of reads: the reference consults MI per read
    (bamutil.cpp:23-38), so a sampled has-MI probe is not enough — a
    cluster can mix one MI-tagged pair into qname-UMI duplicates and the
    minority rows must still win MI over qname. Workload is sized so that
    a 64-record sample would likely miss every MI row."""
    sb = SyntheticBam(seed=77, contig_len=800_000)
    rng = np.random.default_rng(78)
    for k in range(300):
        pos = 1000 + 250 * k
        umi = str(rng.choice(["AAAA_CCCC", "CCCC_AAAA", "GGGG_TTTT"]))
        ndup = int(rng.choice([1, 2, 3]))
        for d in range(ndup):
            if k % 60 == 37 and d == 0:
                # rare MI-tagged read; its qname carries NO umi, so missing
                # the MI drops it from its umi group. The MI value embeds
                # the prefix so getUMI parses it non-empty (bamutil.cpp:44).
                sb.add_pair_mi(0, pos, pos + 150, mi=f"UMI_{umi}",
                               n_errors=int(rng.integers(0, 2)))
            else:
                sb.add_pair(0, pos, pos + 150, umi=umi,
                            n_errors=int(rng.integers(0, 2)),
                            qual=int(rng.choice([18, 35])))
    o, v = run_both(sb, tmp_path, {"umi_prefix": "UMI"})
    assert_equivalent(o, v)


def test_equivalence_dense_upload_fallback(tmp_path, monkeypatch):
    """GENCORE_NO_SPARSE_UP forces the dense upload staging (the fallback
    for >256bp reads / index overflow); it must stay record-equivalent —
    the sparse path is the default, so nothing else exercises this."""
    monkeypatch.setenv("GENCORE_NO_SPARSE_UP", "1")
    sb = make_random_workload(81, n_fragments=100, umi_mode="duplex",
                              contig_len=300_000, n_contigs=1)
    o, v = run_both(sb, tmp_path)
    assert_equivalent(o, v)


def test_equivalence_deep_multi_umi_clusters(tmp_path):
    """Amplicon-style position clusters with MANY pairs over >2 distinct
    UMIs: exercises the columnar native greedy grouping path (the engine
    feeds lex-sorted distinct UMIs straight to gc_greedy_group) against
    the oracle's per-pair string greedy."""
    sb = SyntheticBam(seed=79, contig_len=200_000)
    rng = np.random.default_rng(80)
    umis = ["AAAA", "CCCC", "GGGG", "TTTT", "ACGT", "TGCA", "AAAT", "CCCG"]
    for locus in range(4):
        pos = 10_000 + 40_000 * locus
        for _ in range(120):
            a, b = rng.choice(umis, size=2, replace=False)
            sb.add_pair(0, pos, pos + 160, read_len=120, umi=f"{a}_{b}",
                        n_errors=int(rng.integers(0, 3)),
                        qual=int(rng.choice([18, 30, 36])))
    o, v = run_both(sb, tmp_path)
    assert_equivalent(o, v)


def test_equivalence_far_apart_mates(tmp_path):
    """Same-contig mates >=100kb apart take the cross-contig key path
    (gencore.cpp:300-311)."""
    sb = SyntheticBam(seed=74, contig_len=400_000)
    for k in range(15):
        p1 = 1000 + 500 * k
        p2 = p1 + 250_000
        sb.add_pair(0, p1, p2, read_len=100)
        # bump tlen beyond the gap limit manually: add_pair computes tlen
        # from positions, which already exceeds 100k here
    o, v = run_both(sb, tmp_path)
    assert_equivalent(o, v)


def test_equivalence_placed_unmapped_no_cigar(tmp_path):
    """Records with coordinates but no cigar (placed unmapped mates):
    tid>=0/pos>=0 so they cluster; n_cigar==0 takes the SE len-clamp path
    (group.cpp:355-360) and the no-M-segment scoring path."""
    sb = SyntheticBam(seed=76, contig_len=100_000)
    for k in range(10):
        pos = 1000 + 500 * k
        sb.add_pair(0, pos, pos + 120)
        # placed-unmapped read pointing at a nearby mate, no cigar
        sb.add_single(0, pos, read_len=80, flag=4 | 1, mtid=0, mpos=pos + 60,
                      tlen=140, cigar="")
        sb.add_single(0, pos + 60, read_len=90, flag=1, mtid=0, mpos=pos,
                      tlen=-140, cigar="90M")
    o, v = run_both(sb, tmp_path)
    assert_equivalent(o, v)


def test_equivalence_duplex_multiread_strands(tmp_path):
    """Duplex merge mutates voted output rows in place
    (postmerge.duplex_merge_bam, cluster.cpp:190-244). Both strands must be
    multi-read groups with injected disagreements so the mutated rows come
    from the vote-kernel download, which arrives read-only from jax —
    regression for the 'assignment destination is read-only' crash."""
    import numpy as np
    rng = np.random.default_rng(41)
    sb = SyntheticBam(seed=41, contig_len=100_000, n_contigs=1)
    for k in range(40):
        pos1 = int(rng.integers(100, 90_000))
        pos2 = pos1 + int(rng.integers(30, 120))
        for _ in range(3):
            sb.add_pair(0, pos1, pos2, read_len=100, umi="ACGT_TTAA",
                        n_errors=2)
        for _ in range(3):
            sb.add_pair(0, pos1, pos2, read_len=100, umi="TTAA_ACGT",
                        n_errors=2)
    o, v = run_both(sb, tmp_path)
    assert_equivalent(o, v)


def test_genome_sourced_upload_equivalence(tmp_path):
    """Genome-sourced sparse upload (all-M rows reconstruct on device from
    the resident genome + ref-diff edits) must produce byte-identical
    output vs the head-dense staging (GENCORE_NO_GENOME_UP=1) and ship
    fewer upload bytes."""
    import os
    from gencore_tpu.engine import VectorEngine
    from gencore_tpu.io.fasta import FastaRef
    sb = make_random_workload(31, n_fragments=800, umi_mode="duplex",
                              contig_len=400_000, n_contigs=2)
    bam_path = str(tmp_path / "in.bam")
    fa_path = str(tmp_path / "in.fa")
    sb.write_bam(bam_path)
    sb.write_fasta(fa_path)
    from gencore_tpu.io import bam as bamio
    rdr = bamio.BamReader(bam_path)
    batch = rdr.read_all()
    fa = FastaRef.load(fa_path)
    e1 = VectorEngine(Options(umi_prefix="UMI"), rdr.header, fasta=fa)
    t1 = e1.run(batch)
    os.environ["GENCORE_NO_GENOME_UP"] = "1"
    try:
        e2 = VectorEngine(Options(umi_prefix="UMI"), rdr.header, fasta=fa)
        t2 = e2.run(batch)
    finally:
        del os.environ["GENCORE_NO_GENOME_UP"]
    assert t1.encoded_records() == t2.encoded_records()
    assert e1.wire_h2d < e2.wire_h2d


def test_qname_sort_key64_collision_fallback():
    """Qnames that collide in the 8 bytes after the batch-common prefix
    must still sort in exact byte order (the u64 fast key detects the
    collision and falls back to the full lexsort)."""
    sb = SyntheticBam(seed=5, contig_len=100_000, n_contigs=1)
    # LCP is 0 (A/B at byte 0); pairs share their first 8 bytes and
    # differ only at byte 9 — beyond the u64 window
    names = iter(["AXXXXXXXB9", "AXXXXXXXA1", "BXXXXXXXC5", "BXXXXXXXA0",
                  "AXXXXXXXA0", "AXXXXXXXC2", "BXXXXXXXB7", "BXXXXXXXA9"])
    orig = sb._qname
    sb._qname = lambda umi=None: next(names)
    for _ in range(4):
        sb.add_pair(0, 5000, 5150, read_len=100, n_errors=1, qual=30)
    sb._qname = orig
    import tempfile
    with tempfile.TemporaryDirectory() as wd:
        import os
        p = os.path.join(wd, "c.bam")
        fp = os.path.join(wd, "c.fa")
        sb.write_bam(p)
        sb.write_fasta(fp)
        rdr = bam.BamReader(p)
        batch = rdr.read_all()
        fa = FastaRef.load(fp)
        vec = VectorEngine(Options(), rdr.header, fasta=fa)
        tv = vec.run(batch)
        orc = OracleEngine(Options(), rdr.header, fasta=fa)
        to = orc.run(bam.BamReader(p).read_all())
        vb = tv.encoded_records()
        ob = [r if isinstance(r, bytes) else r.encode() for r in to]
        assert vb == ob
