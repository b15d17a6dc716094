"""Regenerate the golden full-Index wire fixtures (run from repo root).

The fixtures pin COMPLETE serialized Index messages byte-for-byte through
``save_index`` — both oneof variants, one with a byte-plus storage width
(10-bit: MSB plane + 2-bit LSB plane, ``Coder.scala:142-168``), one 12-bit.
All float payloads are small integers (exact in f32) so the bytes are
reproducible on any IEEE platform.

Escape hatch: when a file written by the reference JVM writer
(``Index.scala:151-174``) becomes available, drop it in this directory and
point the tests at it — the loaders take any conforming stream.
"""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
)
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from gulon_tpu.models.flat import FlatIndex  # noqa: E402
from gulon_tpu.models.ivf import IVFIndex, LimitVectors  # noqa: E402
from gulon_tpu.models.keyindex import (  # noqa: E402
    GroupedKeyIndex,
    SortedKeyIndex,
)
from gulon_tpu.models.metric import Metric  # noqa: E402
from gulon_tpu.ops.pq import ProductQuantizer, subspace_bounds  # noqa: E402
from gulon_tpu.utils.serde import save_index  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def sorted_w10():
    # d=2, m=2 subspaces of width 1, K=600 -> logical 10 bits, storage 10
    bounds = subspace_bounds(2, 2)
    cb = jnp.asarray(
        (np.arange(2 * 600 * 1, dtype=np.float32) % 97).reshape(2, 600, 1)
    )
    pq = ProductQuantizer(codebooks=cb, bounds=bounds, num_clusters=600)
    codes = jnp.asarray(
        np.array([[5, 300], [599, 0], [123, 456]], np.uint16)
    )
    return FlatIndex(
        _key_index=SortedKeyIndex(np.array(["a", "b", "c"], dtype=object)),
        pq=pq,
        codes=codes,
        recon_norms=pq.reconstruction_norms(codes),
        metric=Metric.L2,
    )


def grouped_w12():
    # d=2, m=1 subspace of width 2, K=2500 -> logical 12 bits, storage 12
    bounds = subspace_bounds(2, 1)
    cb = jnp.asarray(
        (np.arange(2500 * 2, dtype=np.float32) % 53).reshape(1, 2500, 2)
    )
    pq = ProductQuantizer(codebooks=cb, bounds=bounds, num_clusters=2500)
    codes = jnp.asarray(np.array([[0], [2499], [4], [1234]], np.uint16))
    cents = jnp.asarray(np.array([[1.0, 2.0], [3.0, 4.0]], np.float32))
    return IVFIndex(
        _key_index=GroupedKeyIndex(
            np.array(["a", "b", "x", "y"], dtype=object),
            np.array([2], np.int32),
        ),
        pq=pq,
        codes=codes,
        row_const=pq.reconstruction_norms(codes),
        group_ids=jnp.asarray(np.array([0, 0, 1, 1], np.int32)),
        centroids=cents,
        metric=Metric.COSINE,
        strategy=LimitVectors(2),
    )


if __name__ == "__main__":
    save_index(sorted_w10(), os.path.join(HERE, "sorted_w10.pb"))
    save_index(grouped_w12(), os.path.join(HERE, "grouped_w12.pb"))
    for f in ("sorted_w10.pb", "grouped_w12.pb"):
        p = os.path.join(HERE, f)
        print(f, os.path.getsize(p), "bytes")
