"""Post-merge per-cluster flow: duplex pairing, thresholds, tags, stats.

Behavioral spec: reference cluster.cpp:102-188 (the part of clusterByUMI
after the per-group consensusMerge), duplexMerge/duplexMergeBam
(cluster.cpp:190-244). Shared by the scalar oracle and the vectorized
engine — this is per-molecule logic, not per-base, so it stays host-side.
"""

from __future__ import annotations

import numpy as np

from gencore_tpu.options import Options
from gencore_tpu.stats import Stats
from gencore_tpu.utils.umi import is_duplex

N4BITS = 15


def duplex_merge(p1, p2) -> int:
    """reference cluster.cpp:190-197."""
    d = 0
    if p1.left is not None and p2.left is not None:
        d += duplex_merge_bam(p1.left, p2.left)
    if p1.right is not None and p2.right is not None:
        d += duplex_merge_bam(p1.right, p2.right)
    return d


def duplex_merge_bam(b1, b2) -> int:
    """Mask disagreeing bases to N/qual0 in BOTH reads; return mismatch count
    plus the length difference (reference cluster.cpp:199-244; see oracle
    docstring for the packed-byte equivalence argument)."""
    len1, len2 = b1.l_qseq, b2.l_qseq
    d = abs(len1 - len2)
    n = min(len1, len2)
    s1, s2 = b1.seq, b2.seq
    mism = np.nonzero(s1[:n] != s2[:n])[0]
    if len(mism):
        d += len(mism)
        b1.qual[mism] = 0
        b2.qual[mism] = 0
        s1[mism] = N4BITS
        s2[mism] = N4BITS
    return int(d)


def postprocess_cluster(singles: list, has_umi: bool, opt: Options,
                        pre_stats: Stats, post_stats: Stats) -> list:
    """Duplex pass + supporting-reads thresholds + SSCS/DCS tagging + stats.

    `singles` is the per-group consensus pair list in group creation order
    (reference cluster.cpp:107-114). Returns surviving pairs.
    """
    results = []
    if has_umi and not opt.disable_duplex:
        # duplex pass takes from the back (cluster.cpp:119-155)
        while singles:
            p1 = singles.pop()
            found = False
            for i, p2 in enumerate(singles):
                if is_duplex(p1.umi, p2.umi):
                    found = True
                    d = duplex_merge(p1, p2)
                    pre_stats.add_molecule(p1.merge_reads + p2.merge_reads,
                                           p1.left is not None and p1.right is not None)
                    if d <= opt.duplex_mismatch_threshold:
                        if p1.merge_reads + p2.merge_reads >= opt.cluster_size_req:
                            p1.is_duplex = True
                            p1.reverse_merge_reads = p2.merge_reads
                            p1.write_sscs_dcs_tag()
                            post_stats.add_dcs()
                            results.append(p1)
                    del singles[i]
                    break
            if not found:
                pre_stats.add_molecule(p1.merge_reads,
                                       p1.left is not None and p1.right is not None)
                if not opt.duplex_only and p1.merge_reads >= opt.cluster_size_req:
                    p1.write_sscs_dcs_tag()
                    post_stats.add_sscs()
                    results.append(p1)
    else:
        for p in singles:
            pre_stats.add_molecule(p.merge_reads,
                                   p.left is not None and p.right is not None)
            if not opt.duplex_only and p.merge_reads >= opt.cluster_size_req:
                p.write_sscs_dcs_tag()
                post_stats.add_sscs()
                results.append(p)
    if results:
        post_stats.add_cluster(len(results) > 1)
    return results
