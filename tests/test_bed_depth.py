"""Vectorized BED depth must equal the scalar reference scan
(bed.cpp:64-79), on sorted and unsorted BEDs."""

import numpy as np
import pytest

from gencore_tpu.io.bed import BedRegion, BedRegions


def _mk(regions_by_contig):
    br = BedRegions(len(regions_by_contig))
    for c, regs in enumerate(regions_by_contig):
        br.contig_regions[c] = [BedRegion(f"c{c}", s, e) for s, e in regs]
    br.loaded = True
    return br


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vectorized_equals_scalar_sorted(seed):
    rng = np.random.default_rng(seed)
    regs0 = sorted((int(s), int(s + rng.integers(50, 400)))
                   for s in rng.integers(0, 100_000, 40))
    # make ends monotonic too (sorted non-overlapping-ish panel)
    fixed = []
    last_end = 0
    for s, e in regs0:
        e = max(e, last_end + 1)
        fixed.append((s, e))
        last_end = e
    a = _mk([fixed, fixed[:10]])
    b = a.copy_structure()

    n = 500
    tid = rng.integers(0, 2, n)
    start = rng.integers(0, 100_000, n)
    length = rng.integers(30, 300, n)
    for t, s, ln in zip(tid, start, length):
        a.stat_depth(int(t), int(s), int(ln))
    b.stat_depth_vectorized(tid, start, length)
    for c in range(2):
        ca = [r.count for r in a.contig_regions[c]]
        cb = [r.count for r in b.contig_regions[c]]
        assert ca == cb


def test_vectorized_unsorted_fallback():
    regs = [(500, 900), (100, 300), (50, 2000)]  # unsorted: scan semantics
    a = _mk([regs])
    b = a.copy_structure()
    tid = np.zeros(6, dtype=np.int64)
    start = np.array([0, 120, 450, 950, 60, 1999])
    length = np.array([80, 100, 100, 100, 500, 100])
    for s, ln in zip(start, length):
        a.stat_depth(0, int(s), int(ln))
    b.stat_depth_vectorized(tid, start, length)
    assert [r.count for r in a.contig_regions[0]] == \
        [r.count for r in b.contig_regions[0]]
