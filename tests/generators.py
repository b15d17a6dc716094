"""Synthetic data generators for property-style tests.

Mirrors the reference test strategy (``Generators.scala``): planted Gaussian
cluster mixtures with the true centroids returned alongside the points, so
tests can compare against ground truth.
"""

from __future__ import annotations

import numpy as np


def planted_clusters(
    rng: np.random.Generator,
    n: int,
    d: int,
    k: int,
    scale: float = 0.05,
    spread: float = 1.0,
):
    """Returns (points [n, d] f32, centroids [k, d] f32, labels [n] i32)."""
    centroids = rng.normal(0.0, spread, size=(k, d)).astype(np.float32)
    labels = rng.integers(0, k, size=n)
    noise = rng.normal(0.0, scale, size=(n, d)).astype(np.float32)
    return centroids[labels] + noise, centroids, labels.astype(np.int32)


def random_keys(rng: np.random.Generator, n: int):
    """n unique word-like keys."""
    alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    keys = set()
    while len(keys) < n:
        length = rng.integers(3, 12)
        keys.add("".join(rng.choice(alphabet, size=length)))
    return np.array(sorted(keys), dtype=object)[rng.permutation(n)]
