"""Greedy UMI grouping within a position cluster.

Behavioral spec: reference cluster.cpp:55-100 — repeatedly take the
most-frequent UMI (first-in-map-order wins ties, i.e. lexicographically
smallest), sweep all pairs within umiDiff <= threshold into a group, repeat
until no pairs remain. Shared by the scalar oracle and the vectorized
engine (group identity must match exactly; the greedy order is part of the
output contract).
"""

from __future__ import annotations

from gencore_tpu.utils.umi import umi_diff


def greedy_umi_groups(umis: list, threshold: int) -> list:
    """Partition pair indices 0..n-1 (already in qname map order) into greedy
    UMI groups. Returns a list of index-lists in group creation order.

    Fast path: all UMIs identical -> single group.
    """
    n = len(umis)
    if n == 0:
        return []
    first = umis[0]
    if all(u == first for u in umis):
        return [list(range(n))]

    umi_count: dict = {}
    for u in umis:
        umi_count[u] = umi_count.get(u, 0) + 1

    remaining = list(range(n))
    groups = []
    while remaining:
        top_umi = ""
        top_count = 0
        for u in sorted(umi_count):
            if umi_count[u] > top_count:
                top_count = umi_count[u]
                top_umi = u
        grp = []
        rest = []
        for i in remaining:
            if umi_diff(umis[i], top_umi) <= threshold:
                grp.append(i)
                umi_count[umis[i]] = 0
            else:
                rest.append(i)
        groups.append(grp)
        umi_count[top_umi] = 0
        remaining = rest
    return groups
