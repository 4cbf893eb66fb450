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


def test_greedy_thousand_distinct_umis_fast():
    """An ultra-deep cluster with ~1000 distinct UMIs must group in
    milliseconds (native distance sweep; measured ~8ms best-of-5 on the
    2-core CI host — the bound leaves headroom for load)."""
    import time

    import numpy as np

    from gencore_tpu.core.grouping import greedy_umi_groups

    rng = np.random.default_rng(5)
    bases = "ACGT"
    umis = ["".join(bases[c] for c in rng.integers(0, 4, 10))
            for _ in range(1000)] * 3
    best = 9.0
    for _ in range(5):
        t0 = time.perf_counter()
        groups = greedy_umi_groups(umis, 1)
        best = min(best, time.perf_counter() - t0)
    assert len(groups) > 900
    assert sorted(i for g in groups for i in g) == list(range(3000))
    assert best < 0.05, f"greedy grouping too slow: {best:.3f}s"
