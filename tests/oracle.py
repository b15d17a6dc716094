"""Independent pure-numpy reimplementation of the reference's Lloyd/PQ
semantics, used as a quality oracle.

Mirrors ``KMeans.scala`` step by step — init samples k rows uniformly WITH
replacement (``KMeans.scala:188-196``), assignment minimizes
``||c||^2 - 2<x,c>`` with a RANDOM tie-break on exact float equality
(``KMeans.scala:47``), the update is the per-cluster mean with empty
clusters left at zero (``KMeans.scala:198-226``), and convergence is
assignment-array equality (``KMeans.scala:149``) — and
``ProductQuantizer.scala``'s per-subspace training with seed = subspace
index (``ProductQuantizer.scala:140``). No code is shared with
``gulon_tpu``; recall measured against this oracle bounds the quality of
the TPU implementation at equal code bytes.
"""

from __future__ import annotations

import numpy as np


def subspace_bounds_reference(d: int, m: int):
    """The exact split rule of ``Vectors.scala:91-103``."""
    ideal = -(-d // m)
    num_large = m - (ideal * m - d)
    bounds = []
    start = 0
    for i in range(m):
        width = ideal if i < num_large else ideal - 1
        bounds.append((start, width))
        start += width
    return bounds


def lloyd_reference(
    x: np.ndarray, k: int, max_iters: int, seed: int, tie: str = "random"
) -> np.ndarray:
    """``tie="random"`` reproduces ``KMeans.scala:47``'s seeded coin-flip
    on exact-equal distances; ``tie="first"`` is the deterministic
    smallest-index rule the TPU rebuild uses (``ops/distance.py``) — the
    A/B measures whether that semantic difference is observable."""
    rng = np.random.default_rng(seed)
    x = np.asarray(x, np.float32)
    cents = x[rng.integers(0, len(x), size=k)].copy()

    def assign(c):
        offs = (c.astype(np.float64) ** 2).sum(1).astype(np.float32)
        d = offs[None, :] - 2.0 * (x @ c.T)
        if tie == "first":
            return d.argmin(axis=1).astype(np.int32)
        mins = d.min(axis=1, keepdims=True)
        tie_w = np.where(d == mins, rng.random(d.shape), np.inf)
        return tie_w.argmin(axis=1).astype(np.int32)

    a = assign(cents)
    for _ in range(max_iters):
        sums = np.zeros((k, x.shape[1]), np.float64)
        np.add.at(sums, a, x.astype(np.float64))
        counts = np.bincount(a, minlength=k)
        new_c = np.where(
            counts[:, None] > 0,
            sums / np.maximum(counts, 1)[:, None],
            0.0,
        ).astype(np.float32)
        cents = new_c
        new_a = assign(cents)
        if np.array_equal(new_a, a):
            break
        a = new_a
    return cents


def train_pq_reference(
    x: np.ndarray, m: int, k: int, max_iters: int, tie: str = "random"
):
    """Per-subspace codebooks + codes, reference-style. Returns the
    decoded reconstruction of every row."""
    x = np.asarray(x, np.float32)
    bounds = subspace_bounds_reference(x.shape[1], m)
    recon = np.empty_like(x)
    for i, (start, width) in enumerate(bounds):
        sub = x[:, start : start + width]
        cents = lloyd_reference(sub, k, max_iters, seed=i, tie=tie)
        d = ((cents**2).sum(1))[None, :] - 2.0 * (sub @ cents.T)
        codes = d.argmin(axis=1)
        recon[:, start : start + width] = cents[codes]
    return recon


def recall_at_k(
    queries: np.ndarray,
    corpus: np.ndarray,
    recon: np.ndarray,
    k: int = 10,
) -> float:
    """Id-set recall@k of exact NN over ``recon`` vs exact NN over raw."""
    def topk(base):
        d = (
            (base**2).sum(1)[None, :]
            - 2.0 * (queries @ base.T)
        )
        return np.argsort(d, axis=1, kind="stable")[:, :k]

    truth = topk(corpus)
    approx = topk(recon)
    return float(
        np.mean(
            [
                len(set(truth[i]) & set(approx[i])) / k
                for i in range(len(queries))
            ]
        )
    )
