"""Optimized Product Quantization: a learned orthogonal rotation before PQ.

A capability the reference lacks (its subspace split is the fixed
coordinate-range rule of ``Vectors.scala:91-103``): when the corpus has
correlated dimensions or unbalanced per-subspace variance — real embedding
tables almost always do — rotating the data before splitting lowers
quantization error, and therefore raises recall, at *identical* code bytes
and identical query cost (the rotation folds into query preparation: one
[Q, D] x [D, D] matmul, noise next to the scan).

Algorithm: non-parametric OPQ (Ge, He, Ke, Sun — "Optimized Product
Quantization", CVPR 2013), the alternating minimization of

    min_{R orthogonal, codebooks}  || X R − Q(X R) ||_F^2

- fix R, improve the codebooks: ordinary PQ training on ``X R`` (the
  existing vmapped Lloyd loop — one fixpoint per subspace, all on the MXU);
- fix the codebooks, improve R: with reconstructions ``X_hat = Q(X R)``
  the optimum over orthogonal matrices is the Procrustes solution
  ``R = U V^T`` from the SVD ``X^T X_hat = U S V^T``.

Both halves are single XLA programs; the [D, D] SVD is negligible next to
one Lloyd iteration. Training on a row sample (``PQConfig.train_sample``)
carries over unchanged.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gulon_tpu.ops.pq import (
    PQConfig,
    ProductQuantizer,
    train_product_quantizer,
)


def procrustes_rotation(x: jax.Array, x_hat: jax.Array) -> jax.Array:
    """Orthogonal R minimizing ``||x R - x_hat||_F``: ``U V^T`` of
    ``x^T x_hat``. Inputs ``[n, D]``; returns ``[D, D]`` f32."""
    m = jnp.matmul(
        x.T, x_hat, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    u, _, vt = jnp.linalg.svd(m, full_matrices=False)
    return jnp.matmul(u, vt, precision=jax.lax.Precision.HIGHEST)


def train_opq(
    x,
    config: PQConfig,
    *,
    opq_iters: int = 8,
    inner_iters: int = 8,
    report_fn=None,
    mesh=None,
) -> Tuple[jax.Array, ProductQuantizer]:
    """Learn (rotation, product quantizer) for ``x``.

    ``opq_iters`` alternating rounds run PQ training capped at
    ``inner_iters`` Lloyd iterations (the codebooks only need to be good
    enough to steer the Procrustes update), then one final full
    ``config``-strength training fixes the codebooks against the learned
    rotation. ``opq_iters=0`` degenerates to plain PQ with an identity
    rotation.

    Returns ``(rotation [D, D] f32, ProductQuantizer over x @ rotation)``.
    Encode with ``pq.encode(x @ rotation)``; queries rotate the same way
    (orthogonality preserves L2 distances, so recall math is unchanged).
    """
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    rot = jnp.eye(d, dtype=jnp.float32)
    inner = config._replace(max_iters=min(inner_iters, config.max_iters))
    for it in range(opq_iters):
        # fold the round into the seed so every inner PQ training draws
        # fresh init rows (same device-side sampling as plain training)
        cfg_it = inner._replace(seed=config.seed + 7919 * it)
        z = jnp.matmul(x, rot, precision=jax.lax.Precision.HIGHEST)
        pq = train_product_quantizer(z, cfg_it, mesh=mesh)
        x_hat = pq.decode(pq.encode(z))
        rot = procrustes_rotation(x, x_hat)
        if report_fn is not None:
            err = float(
                jnp.mean(jnp.sum((z - x_hat) ** 2, axis=1))
            )
            report_fn(it, err)
    z = jnp.matmul(x, rot, precision=jax.lax.Precision.HIGHEST)
    pq = train_product_quantizer(z, config, report_fn=None, mesh=mesh)
    return rot, pq


def reconstruction_mse(
    pq: ProductQuantizer, x, rotation: Optional[jax.Array] = None
) -> float:
    """Mean squared reconstruction error of ``x`` under ``pq`` (with the
    optional rotation applied) — the quantity OPQ minimizes; used by tests
    and benchmarks to compare rotations at equal code bytes."""
    x = jnp.asarray(x, jnp.float32)
    z = (
        jnp.matmul(x, rotation, precision=jax.lax.Precision.HIGHEST)
        if rotation is not None
        else x
    )
    x_hat = pq.decode(pq.encode(z))
    return float(jnp.mean(jnp.sum((z - x_hat) ** 2, axis=1)))
