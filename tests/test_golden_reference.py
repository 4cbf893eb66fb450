"""Golden-output equivalence vs the ACTUAL reference binary.

Compiles OpenGene/gencore from /root/reference/src against the htslib API
shim (native/htsshim) and asserts byte-identical output BAM records, order,
and JSON reports. This anchors the whole equivalence pyramid to the real
binary rather than the self-authored oracle (tools/golden_compare.py runs
the wider sweep; this test keeps one fast case in CI).
"""

import os
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from datagen import SyntheticBam  # noqa: E402


def _ref_available():
    import golden_compare as gc
    try:
        gc.build_ref()
    except Exception:
        return False
    return os.path.exists(gc.REF_BIN)


@pytest.mark.skipif(not _ref_available(),
                    reason="reference binary not buildable in this image")
def test_golden_duplex_umi_small():
    import golden_compare as gc
    rng = np.random.default_rng(99)
    sb = SyntheticBam(seed=99, contig_len=150_000, n_contigs=2)
    umis = ["AAAA", "CCCC", "GGGG", "TTTT"]
    for _ in range(150):
        tid = int(rng.integers(0, 2))
        pos1 = int(rng.integers(100, 149_000))
        pos2 = pos1 + int(rng.integers(10, 180))
        a, b = rng.choice(umis, size=2, replace=False)
        for _ in range(1 + int(rng.poisson(2))):
            sb.add_pair(tid, pos1, pos2, read_len=100, umi=f"{a}_{b}",
                        n_errors=int(rng.integers(0, 3)),
                        qual=int(rng.choice([12, 22, 35])))
    with tempfile.TemporaryDirectory() as wd:
        fails = gc.run_case("golden_small", sb, ["-u", "UMI"], wd)
        assert not fails, "\n".join(fails)


@pytest.mark.skipif(not _ref_available(),
                    reason="reference binary not buildable in this image")
def test_golden_watermark_tick_crossing():
    """>10000 clustered reads so the reference's flush tick fires: checks
    the watermark-gated post-stats quirk (post-report destructor drain)."""
    import golden_compare as gc
    rng = np.random.default_rng(7)
    sb = SyntheticBam(seed=7, contig_len=600_000, n_contigs=1)
    for _ in range(3000):
        pos1 = int(rng.integers(100, 590_000))
        pos2 = pos1 + int(rng.integers(10, 150))
        for _ in range(1 + int(rng.poisson(1))):
            sb.add_pair(0, pos1, pos2, read_len=100,
                        n_errors=int(rng.integers(0, 2)),
                        qual=int(rng.choice([18, 35])))
    with tempfile.TemporaryDirectory() as wd:
        fails = gc.run_case("golden_tick", sb, [], wd)
        assert not fails, "\n".join(fails)
