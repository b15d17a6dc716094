"""Top-k-smallest selection and merge.

Functional replacement for the reference's bounded max-heap ``TopKHeap``
(``TopKHeap.scala:3-94``): ``lax.top_k`` on negated distances keeps the k
smallest, and heap merge (``TopKHeap.scala:44-53``) becomes concat + top_k.
The same merge primitive combines per-shard results across a TPU mesh.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def smallest_k(dists: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """k smallest values (ascending) and their indices along the last axis."""
    neg_vals, idx = jax.lax.top_k(-dists, k)
    return -neg_vals, idx.astype(jnp.int32)


def merge_topk(
    dists_a: jax.Array,
    ids_a: jax.Array,
    dists_b: jax.Array,
    ids_b: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Merge two (distance, id) candidate sets, keeping the k smallest.

    Batched over leading axes. ``ids`` are caller-defined (e.g. global row
    ids), which is what lets per-shard/per-partition results merge exactly
    like ``TopKHeap.merge``.
    """
    dists = jnp.concatenate([dists_a, dists_b], axis=-1)
    ids = jnp.concatenate([ids_a, ids_b], axis=-1)
    vals, pos = smallest_k(dists, k)
    return vals, jnp.take_along_axis(ids, pos, axis=-1)
