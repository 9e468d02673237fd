"""t-digest-style mergeable quantile sketch (Dunning & Ertl, public
algorithm: https://arxiv.org/abs/1902.04023).

A digest is a pair of parallel numpy arrays (centroid means, centroid
weights), kept sorted by mean and compressed so that each centroid's
quantile span is bounded by the k1 scale function

    k(q) = (delta / 2π) · asin(2q − 1)

(adjacent centroids merge only while k(q_right) − k(q_left) ≤ 1). The
scale function concentrates small centroids at the tails, which is what
gives the t-digest its ~q(1−q) relative accuracy — extreme quantiles
are near-exact, the median has the coarsest resolution.

Determinism: ``compress`` sorts its input by (mean, weight) before the
single left-to-right merge pass, so a digest is a pure function of the
input *multiset* of centroids — ``merge(a, b) == merge(b, a)`` exactly
(pinned in tests/test_sketches.py). This is the property that makes the
sketch safe as a Spark partial aggregate: partition order and task
scheduling cannot change the merged result of a given set of partials.

Scale shape on Spark (queries/aggregates.py::sketch_tdigest):
partition → partial digest (≤ ~delta centroids, built executor-side) →
shuffle only the centroid rows (O(delta) per partition, bytes not
rows) → single small reduce merges P·delta centroids and reads
quantiles. The same two-level tree MLlib/Spark uses for its own
aggregates; at 1000 executors the merge input is ~1000·delta ≈ 10⁵
tiny rows — driver-safe by orders of magnitude.
"""

from __future__ import annotations

import numpy as np

DELTA = 100  # compression: max ~2*delta centroids survive a compress


def _k(q: np.ndarray | float, delta: float) -> np.ndarray | float:
    """k1 scale function; monotone [0,1] → [-delta/4, delta/4]."""
    return delta / (2.0 * np.pi) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)


def compress(
    means: np.ndarray, weights: np.ndarray, delta: float = DELTA
) -> tuple[np.ndarray, np.ndarray]:
    """Merge adjacent centroids while the k1 span bound allows.

    Input need not be sorted or pre-compressed; output is sorted by
    mean with total weight preserved exactly (weights are summed, means
    are weight-averaged)."""
    means = np.asarray(means, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    if means.size == 0:
        return means, weights
    order = np.lexsort((weights, means))
    means, weights = means[order], weights[order]
    total = float(weights.sum())

    # Vectorized greedy span partition (ADVICE r2 #3). The sequential
    # absorb-or-emit pass absorbs element j into the cluster that started
    # after emitted weight W0 iff k(C[j]/total) − k(W0/total) ≤ 1, where
    # C is the inclusive cumulative weight — the decision depends only on
    # C, not on previously absorbed elements. k is monotone, so each
    # cluster's last element is found directly with searchsorted against
    # C at q_limit = k⁻¹(k(W0/total) + 1): the Python loop below runs
    # once per OUTPUT centroid (≤ ~2δ ≈ 200), not once per input value —
    # from_values on a 6M-row partition does 6M numpy-cumsum steps and
    # ~200 loop iterations instead of 6M Python iterations.
    cum = np.cumsum(weights)
    mw = means * weights
    out_m: list[float] = []
    out_w: list[float] = []
    i = 0
    w_before = 0.0  # total weight of emitted centroids
    n = means.size
    half_pi = np.pi / 2.0
    while i < n:
        k0 = float(_k(w_before / total, delta))
        # k1 inverse: q = (sin(2π·k/δ) + 1)/2, clamped at q = 1
        ang = min((k0 + 1.0) * 2.0 * np.pi / delta, half_pi)
        q_limit = (np.sin(ang) + 1.0) / 2.0
        j = int(np.searchsorted(cum, q_limit * total, side="right")) - 1
        if j < i:
            j = i  # a cluster always keeps at least its first element
        cw = float(cum[j]) - w_before
        out_m.append(float(mw[i : j + 1].sum()) / cw)
        out_w.append(cw)
        w_before = float(cum[j])
        i = j + 1
    return np.asarray(out_m), np.asarray(out_w)


def from_values(
    values: np.ndarray, delta: float = DELTA
) -> tuple[np.ndarray, np.ndarray]:
    """Build a digest from raw values (weight 1 each)."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    return compress(v, np.ones_like(v), delta)


def merge(
    a: tuple[np.ndarray, np.ndarray],
    b: tuple[np.ndarray, np.ndarray],
    delta: float = DELTA,
) -> tuple[np.ndarray, np.ndarray]:
    """Merge two digests: concatenate centroids, recompress. Exactly
    commutative (compress sorts); weight-preserving."""
    return compress(
        np.concatenate([a[0], b[0]]), np.concatenate([a[1], b[1]]), delta
    )


def quantile(
    means: np.ndarray, weights: np.ndarray, q: float
) -> float:
    """Estimate the q-quantile by linear interpolation between centroid
    midpoints (each centroid's mean is taken to sit at the middle of
    its weight span — the standard t-digest read-out)."""
    if means.size == 0:
        return float("nan")
    if means.size == 1:
        return float(means[0])
    total = float(weights.sum())
    target = q * total
    mid = np.cumsum(weights) - weights / 2.0
    if target <= mid[0]:
        return float(means[0])
    if target >= mid[-1]:
        return float(means[-1])
    i = int(np.searchsorted(mid, target))
    t = (target - mid[i - 1]) / (mid[i] - mid[i - 1])
    return float(means[i - 1] + t * (means[i] - means[i - 1]))
