"""UMI extraction/compare tests — vectors from reference src/bamutil.cpp:385-423
and src/cluster.cpp:275-288."""

from gencore_tpu.utils.umi import get_umi_from_qname, umi_diff, is_duplex


def test_umi_reference_vectors():
    cases = [
        ("NB551106:8:H5Y57BGX2:1:13304:3538:1404", "", ""),
        ("NB551106:8:H5Y57BGX2:1:13304:3538:1404:UMI_GAGCATAC", "UMI", "GAGCATAC"),
        ("NB551106:8:H5Y57BGX2:1:13304:3538:1404:UMI_GAGC_ATAC", "UMI", "GAGC_ATAC"),
        ("NB551106:8:H5Y57BGX2:1:13304:3538:1404:GAGC_ATAC", "", "GAGC_ATAC"),
        ("NB551106:8:H5Y57BGX2:1:13304:3538:1404:UMI_X", "UMI", ""),
        ("@V300034954L1C001R0040000002/1:UMI_ATG_AAT", "UMI", "ATG_AAT"),
        ("@V300034954L1C001R0040000002:UMI_ATG_AAT /1", "UMI", "ATG_AAT"),
    ]
    for qname, prefix, expect in cases:
        assert get_umi_from_qname(qname, prefix) == expect, (qname, prefix)


def test_umi_diff():
    assert umi_diff("ATCGATCG", "ATCGATCG") == 0
    assert umi_diff("ATCGATCG", "ATCGTTC") == 2
    assert umi_diff("ATCGATCG", "ATCGTTCG") == 1
    assert umi_diff("AAAA_ATCG", "AAAA_ATCG") == 0


def test_is_duplex():
    assert is_duplex("ATCG_CTAG", "CTAG_ATCG") is True
    assert is_duplex("AGC_TGA", "TGA_AGC") is True
    assert is_duplex("AAAA_AAAA", "AAAA_AAAA") is True
    assert is_duplex("CTAG", "CTAG_ATCG") is False
    assert is_duplex("CTAG", "CCCAGG") is False
    assert is_duplex("", "") is False
