"""Vectorized UMI parser must match the scalar reference parser."""

import numpy as np

from gencore_tpu.core.umivec import umi_spans, umi_string
from gencore_tpu.utils.umi import get_umi_from_qname

QNAMES = [
    "NB551106:8:H5Y57BGX2:1:13304:3538:1404",
    "NB551106:8:H5Y57BGX2:1:13304:3538:1404:UMI_GAGCATAC",
    "NB551106:8:H5Y57BGX2:1:13304:3538:1404:UMI_GAGC_ATAC",
    "NB551106:8:H5Y57BGX2:1:13304:3538:1404:GAGC_ATAC",
    "NB551106:8:H5Y57BGX2:1:13304:3538:1404:UMI_X",
    "@V300034954L1C001R0040000002/1:UMI_ATG_AAT",
    "@V300034954L1C001R0040000002:UMI_ATG_AAT /1",
    "noseps",
    "ends:",
    "x:ACGT",
    "x:AC_GT",
    "x:AC_G_T",
    "x:_ACGT",
    "x:_",
    "x:1404",
    "readname:UMI_",
    "UMI_AAAA",
    ":",
    "a:b:c:TTTT",
]


def _matrix(qnames):
    w = max(len(q) for q in qnames)
    m = np.zeros((len(qnames), w), dtype=np.uint8)
    for i, q in enumerate(qnames):
        b = q.encode("latin-1")
        m[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
    return m, np.array([len(q) for q in qnames], dtype=np.int64)


def test_matches_scalar_both_modes():
    m, ql = _matrix(QNAMES)
    for prefix in ("", "UMI", "umi"):
        start, length = umi_spans(m, ql, prefix)
        for i, q in enumerate(QNAMES):
            expect = get_umi_from_qname(q, prefix)
            got = umi_string(m, start, length, i)
            assert got == expect, (q, prefix, got, expect)


def test_random_fuzz():
    rng = np.random.default_rng(0)
    alphabet = list("ACGT_:0123456789abcXYZUMI ")
    qnames = ["".join(rng.choice(alphabet, size=rng.integers(1, 30)))
              for _ in range(300)]
    m, ql = _matrix(qnames)
    for prefix in ("", "UMI"):
        start, length = umi_spans(m, ql, prefix)
        for i, q in enumerate(qnames):
            assert umi_string(m, start, length, i) == get_umi_from_qname(q, prefix), (q, prefix)
