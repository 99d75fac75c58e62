"""Result evaluation — analogue of contrib/evaluation.py.

recall_at_k / knn_intersection_measure / range_PR drive the test suite's
accuracy assertions exactly as in the reference (contrib/evaluation.py:17-60).
"""

from __future__ import annotations

import numpy as np


def knn_intersection_measure(I1: np.ndarray, I2: np.ndarray) -> float:
    """Fraction of shared ids per row (contrib/evaluation.py:17)."""
    nq, k = I1.shape
    assert I2.shape == (nq, k)
    ninter = sum(
        len(np.intersect1d(I1[i], I2[i][I2[i] >= 0])) for i in range(nq)
    )
    return ninter / float(nq * k)


def recall_at_k(I: np.ndarray, gt: np.ndarray, k: int, rank: int = 1) -> float:
    """R@k of the true NN: fraction of queries whose gt[:, :rank] ids appear
    in the first k results (the `1-recall@R` criterion, AutoTune.h:56)."""
    nq = len(I)
    found = 0
    for i in range(nq):
        found += len(np.intersect1d(gt[i, :rank], I[i, :k])) > 0
    return found / nq


def check_knn_with_draws(Dref, Iref, Dnew, Inew, rtol=1e-5, atol=1e-6):
    """Tie-aware comparison of two knn result sets
    (contrib/evaluation.py:247 check_ref_knn_with_draws).

    Distances must match; ids may differ where distances are tied.
    """
    np.testing.assert_allclose(Dref, Dnew, rtol=rtol, atol=atol)
    nq, k = Iref.shape
    for q in range(nq):
        # group by (approximately) equal distances, compare id sets
        dref = Dref[q]
        start = 0
        for j in range(1, k + 1):
            if j == k or abs(dref[j] - dref[start]) > atol + rtol * abs(dref[start]):
                sref = set(Iref[q, start:j])
                snew = set(Inew[q, start:j])
                if sref != snew:
                    # allow mismatch only if boundary ties extend beyond k
                    assert j == k, (
                        f"query {q}: id sets differ at rank {start}:{j}: "
                        f"{sref} vs {snew}"
                    )
                start = j


def range_PR(lims_ref, labels_ref, lims_new, labels_new):
    """Precision/recall of a range-search result vs reference
    (contrib/evaluation.py:39)."""
    nq = len(lims_ref) - 1
    ninter = nres_ref = nres_new = 0
    for q in range(nq):
        ref = labels_ref[int(lims_ref[q]) : int(lims_ref[q + 1])]
        new = labels_new[int(lims_new[q]) : int(lims_new[q + 1])]
        ninter += len(np.intersect1d(ref, new))
        nres_ref += len(ref)
        nres_new += len(new)
    precision = ninter / max(nres_new, 1)
    recall = ninter / max(nres_ref, 1)
    return precision, recall
