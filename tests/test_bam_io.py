"""BAM/BGZF round-trip and columnar decode tests."""

import numpy as np

from gencore_tpu.io import bam, bgzf
from gencore_tpu.io.fasta import FastaRef
from tests.datagen import SyntheticBam


def test_bgzf_roundtrip(tmp_path):
    payload = bytes(np.random.default_rng(1).integers(0, 256, size=300_000, dtype=np.uint8))
    p = str(tmp_path / "x.bgzf")
    bgzf.compress_to_file(p, payload)
    assert bgzf.decompress_file(p) == payload


def test_bam_roundtrip(tmp_path):
    sb = SyntheticBam(seed=2, contig_len=50_000)
    sb.add_pair(0, 1000, 1100, umi="ACGT")
    sb.add_pair(0, 2000, 2050, umi="ACGT_TTTT")
    sb.add_single(0, 3000, flag=0)
    path = str(tmp_path / "t.bam")
    sb.write_bam(path)

    r = bam.BamReader(path)
    assert r.header.names == ["chr1"]
    assert r.header.lengths == [50_000]
    b = r.read_all()
    assert b.n == 5
    assert list(b.pos) == [1000, 1100, 2000, 2050, 3000]
    assert list(b.tid) == [0] * 5
    assert b.qname(0) == b.qname(1)
    assert b.qname(0) != b.qname(2)
    assert int(b.isize[0]) == 200
    assert int(b.isize[1]) == -200
    assert int(b.l_qseq[0]) == 100
    # NM tag present
    assert b.get_int_tag(0, b"NM") == 0
    # write back and re-read: records identical
    w = bam.BamWriter(str(tmp_path / "o.bam"), r.header)
    for i in range(b.n):
        w.write_record(b.record_bytes(i))
    w.close()
    b2 = bam.BamReader(str(tmp_path / "o.bam")).read_all()
    assert b2.n == b.n
    for i in range(b.n):
        assert b2.record_bytes(i) == b.record_bytes(i)


def test_seq_matrix(tmp_path):
    sb = SyntheticBam(seed=3, contig_len=10_000)
    sb.add_pair(0, 100, 160, read_len=80)
    sb.add_single(0, 500, read_len=60)
    path = str(tmp_path / "t.bam")
    sb.write_bam(path)
    b = bam.BamReader(path).read_all()
    m = b.seq_matrix(np.array([0, 1, 2]), 96)
    q = b.qual_matrix(np.array([0, 1, 2]), 96)
    for row, i in zip(range(3), [0, 1, 2]):
        codes = b.seq_codes(i)
        n = len(codes)
        assert (m[row, :n] == codes).all()
        assert (m[row, n:] == 0).all()
        assert (q[row, :n] == b.qual(i)).all()
        assert (q[row, n:] == 0).all()


def test_seq_codes_match_ref(tmp_path):
    sb = SyntheticBam(seed=4, contig_len=10_000)
    sb.add_single(0, 100, read_len=50, n_errors=0)
    path = str(tmp_path / "t.bam")
    sb.write_bam(path)
    b = bam.BamReader(path).read_all()
    seq = bam.codes_to_seq_str(b.seq_codes(0))
    assert seq == sb.contigs[0][100:150]


def test_fasta_load(tmp_path):
    sb = SyntheticBam(seed=5, contig_len=1000, n_contigs=2)
    fp = str(tmp_path / "r.fa")
    sb.write_fasta(fp)
    ref = FastaRef.load(fp)
    assert set(ref.contigs) == {"chr1", "chr2"}
    for name, seq in zip(sb.names, sb.contigs):
        got = ref.contigs[name].tobytes().decode()
        assert got == seq


def test_aux_tag_walk(tmp_path):
    sb = SyntheticBam(seed=6, contig_len=1000)
    sb.add_single(0, 10, read_len=20, nm=3)
    path = str(tmp_path / "t.bam")
    sb.write_bam(path)
    b = bam.BamReader(path).read_all()
    assert b.get_int_tag(0, b"NM") == 3
    assert b.get_str_tag(0, b"MI") is None
    off, typ = b.find_tag(0, b"NM")
    assert typ == "C"
