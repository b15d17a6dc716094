"""Distance primitives, expressed as MXU-friendly matmuls.

The reference computes distances with allocation-free scalar loops
(``MathUtils.scala:63-120``, ``KMeans.scala:24-55``). On TPU the same math is
one matmul plus rank-1 norm corrections:

    ||x - c||^2 = ||x||^2 - 2<x, c> + ||c||^2

and for pure argmin ranking the ``||x||^2`` term can be dropped, exactly like
the reference's assignment trick at ``KMeans.scala:37-52``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sq_norms(x: jax.Array) -> jax.Array:
    """Squared L2 norm of each row: ``[..., n, d] -> [..., n]``."""
    return jnp.sum(x * x, axis=-1)


def normalize_rows(x: jax.Array) -> jax.Array:
    """L2-normalize rows; zero rows are left unchanged (no NaNs).

    Counterpart of ``MathUtils.normalize`` (reference ``MathUtils.scala``),
    used to implement the Cosine metric as "normalize then L2"
    (``Metric.scala:3-9``).
    """
    norms = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return jnp.where(norms > 0, x / jnp.where(norms > 0, norms, 1.0), x)


def assign_scores(x: jax.Array, centroids: jax.Array) -> jax.Array:
    """Ranking scores ``||c||^2 - 2<x,c>`` (x-norm dropped): ``[n, k]``.

    argmin over axis -1 gives the nearest centroid, reproducing the
    assignment kernel at reference ``KMeans.scala:24-55``. Runs on the MXU.
    """
    cn = sq_norms(centroids)
    # HIGHEST: full-f32 MXU passes — code assignment must rank like the
    # reference's f32 scalar loops, not bf16-rounded.
    ip = jnp.matmul(
        x,
        centroids.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return cn[None, :] - 2.0 * ip


def pairwise_sqdist(x: jax.Array, c: jax.Array) -> jax.Array:
    """Full squared L2 distances ``[n, k]`` between rows of x and rows of c."""
    return assign_scores(x, c) + sq_norms(x)[:, None]


def nearest(x: jax.Array, centroids: jax.Array) -> jax.Array:
    """Index of nearest centroid per row: ``[n] int32``.

    Ties resolve to the lowest index (the reference breaks ties with a seeded
    coin flip, ``KMeans.scala:47``; deterministic-first is equivalent for
    recall purposes and XLA-friendly).
    """
    return jnp.argmin(assign_scores(x, centroids), axis=-1).astype(jnp.int32)
