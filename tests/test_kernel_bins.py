"""The reduced-bin kernel must equal the 16-bin kernel on =ACGTN data,
including negative-score edge cases where empty bins win the vote."""

import numpy as np

from gencore_tpu.core import kernels


def _rand_batch(rng, J, K, L, neg_scores=False):
    codes = np.array([0, 1, 2, 4, 8, 15], dtype=np.uint8)
    seq = codes[rng.integers(0, len(codes), size=(J, K, L))]
    qual = rng.integers(0, 42, size=(J, K, L)).astype(np.uint8)
    lo = -1 if not neg_scores else -3
    score = rng.integers(lo, 13, size=(J, K, L)).astype(np.int32)
    valid = rng.random((J, K)) < 0.8
    valid[:, 0] = True
    pos_valid = np.ones((J, L), dtype=bool)
    refcodes = np.array([0, 1, 2, 4, 8], dtype=np.uint8)
    refbase = refcodes[rng.integers(0, len(refcodes), size=(J, L))]
    return seq, qual, score, valid, pos_valid, refbase


def test_reduced_equals_full():
    rng = np.random.default_rng(0)
    for trial in range(4):
        args = _rand_batch(rng, 32, 4, 64, neg_scores=(trial % 2 == 0))
        kw = dict(hi=30, mod=20, lo=15, base_score_req=6, ratio_num=4, ratio_den=5)
        full = kernels.consensus_kernel(*args, full_bins=True, **kw)
        fast = kernels.consensus_kernel(*args, full_bins=False, **kw)
        for a, b in zip(full, fast):
            assert (np.asarray(a) == np.asarray(b)).all(), trial
