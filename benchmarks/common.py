"""Shared benchmark plumbing: synthetic corpora + tunnel-safe timing.

Timing: ``jax.block_until_ready`` does not reliably block through the
remote-TPU tunnel used in this environment and a host readback costs
~10-25 ms RTT, so steady-state cost is measured by iterating the op
device-side inside one jitted ``fori_loop`` (data-dependency chained) and
differencing two iteration counts — the RTT and dispatch constants cancel.
"""

from __future__ import annotations

import functools
import time
from typing import Callable

import numpy as np


def low_rank_corpus(
    rng: np.random.Generator,
    n: int,
    d: int,
    intrinsic: int = 16,
    n_clusters: int = 1000,
    noise: float = 0.05,
) -> np.ndarray:
    """Cluster mixture on a low-dim manifold — the regime embeddings live in."""
    basis = rng.normal(0, 1.0, (intrinsic, d)).astype(np.float32)
    centers = rng.normal(0, 1.0, (n_clusters, intrinsic)).astype(np.float32)
    z = centers[rng.integers(0, n_clusters, n)] + rng.normal(
        0, 0.3, (n, intrinsic)
    ).astype(np.float32)
    x = (z @ basis / np.sqrt(intrinsic)).astype(np.float32)
    x += rng.normal(0, noise, (n, d)).astype(np.float32)
    return x


def time_device_loop(step_fn: Callable, carry_probe: Callable, iters: int = 16):
    """Per-iteration seconds of ``step_fn`` via the two-point method.

    ``step_fn(acc) -> acc'`` must consume and produce a scalar so iterations
    chain; ``carry_probe(result) -> float`` forces the readback.
    """
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(n):
        def body(i, acc):
            return step_fn(acc)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    carry_probe(loop(iters))  # compile
    carry_probe(loop(1))
    t0 = time.perf_counter()
    carry_probe(loop(iters))
    t_many = time.perf_counter() - t0
    t0 = time.perf_counter()
    carry_probe(loop(1))
    t_one = time.perf_counter() - t0
    return max((t_many - t_one) / (iters - 1), 1e-9)


def idset_recall(approx_ids: np.ndarray, exact_ids: np.ndarray, k: int) -> float:
    """Mean |approx ∩ exact| / k over queries (standard ANN recall@k)."""
    return float(
        np.mean(
            [
                len(set(approx_ids[q][:k]) & set(exact_ids[q][:k])) / k
                for q in range(len(approx_ids))
            ]
        )
    )
