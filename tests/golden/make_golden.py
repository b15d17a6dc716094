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




def sorted_w2_cosine():
    # d=2, m=2 subspaces of width 1, K=4 -> logical 2 bits (Coder2),
    # Cosine metric (the ingest/query-normalize flag on the wire)
    bounds = subspace_bounds(2, 2)
    cb = jnp.asarray(
        (np.arange(2 * 4 * 1, dtype=np.float32) % 7).reshape(2, 4, 1)
    )
    pq = ProductQuantizer(codebooks=cb, bounds=bounds, num_clusters=4)
    codes = jnp.asarray(np.array([[1, 2], [3, 0], [0, 1]], np.uint8))
    return FlatIndex(
        _key_index=SortedKeyIndex(np.array(["a", "b", "c"], dtype=object)),
        pq=pq,
        codes=codes,
        recon_norms=pq.reconstruction_norms(codes),
        metric=Metric.COSINE,
    )


def sorted_w4():
    # d=2, m=2 subspaces of width 1, K=16 -> logical 4 bits (Coder4)
    bounds = subspace_bounds(2, 2)
    cb = jnp.asarray(
        (np.arange(2 * 16 * 1, dtype=np.float32) % 13).reshape(2, 16, 1)
    )
    pq = ProductQuantizer(codebooks=cb, bounds=bounds, num_clusters=16)
    codes = jnp.asarray(np.array([[10, 3], [7, 15], [1, 0]], np.uint8))
    return FlatIndex(
        _key_index=SortedKeyIndex(np.array(["a", "b", "c"], dtype=object)),
        pq=pq,
        codes=codes,
        recon_norms=pq.reconstruction_norms(codes),
        metric=Metric.L2,
    )


def sorted_w16():
    # d=2, m=2 subspaces of width 1, K=5000 -> logical 13 bits, storage 16
    # (BytePlus(8): MSB byte-plane + raw low bytes, Coder.scala:142-168)
    bounds = subspace_bounds(2, 2)
    cb = jnp.asarray(
        (np.arange(2 * 5000 * 1, dtype=np.float32) % 97).reshape(2, 5000, 1)
    )
    pq = ProductQuantizer(codebooks=cb, bounds=bounds, num_clusters=5000)
    codes = jnp.asarray(np.array([[4999, 0], [1234, 2]], np.uint16))
    return FlatIndex(
        _key_index=SortedKeyIndex(np.array(["a", "b"], dtype=object)),
        pq=pq,
        codes=codes,
        recon_norms=pq.reconstruction_norms(codes),
        metric=Metric.L2,
    )


def grouped_w8_groups():
    # d=2, m=1 subspace of width 2, K=256 -> 8 bits (Coder8 identity
    # bytes), LIMIT_GROUPS strategy (proto enum 0)
    from gulon_tpu.models.ivf import LimitGroups

    bounds = subspace_bounds(2, 1)
    cb = jnp.asarray(
        (np.arange(256 * 2, dtype=np.float32) % 31).reshape(1, 256, 2)
    )
    pq = ProductQuantizer(codebooks=cb, bounds=bounds, num_clusters=256)
    codes = jnp.asarray(np.array([[5], [254], [0], [7]], np.uint8))
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
        metric=Metric.L2,
        strategy=LimitGroups(2),
    )


def grouped_w4_opq():
    # 4-bit GroupedIndex with the documented OPQ extension (rotation at
    # field 100): the rotation is a permutation matrix, exact in f32
    bounds = subspace_bounds(2, 1)
    cb = jnp.asarray(
        (np.arange(16 * 2, dtype=np.float32) % 11).reshape(1, 16, 2)
    )
    pq = ProductQuantizer(codebooks=cb, bounds=bounds, num_clusters=16)
    codes = jnp.asarray(np.array([[10], [3], [7], [0]], np.uint8))
    cents = jnp.asarray(np.array([[1.0, 2.0], [3.0, 4.0]], np.float32))
    rot = jnp.asarray(np.array([[0.0, 1.0], [1.0, 0.0]], np.float32))
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
        metric=Metric.L2,
        strategy=LimitVectors(3),
        rotation=rot,
    )


FIXTURES = {
    "sorted_w10.pb": sorted_w10,
    "grouped_w12.pb": grouped_w12,
    "sorted_w2_cosine.pb": sorted_w2_cosine,
    "sorted_w4.pb": sorted_w4,
    "sorted_w16.pb": sorted_w16,
    "grouped_w8_groups.pb": grouped_w8_groups,
    "grouped_w4_opq.pb": grouped_w4_opq,
}


if __name__ == "__main__":
    for f, build in FIXTURES.items():
        save_index(build(), os.path.join(HERE, f))
        print(f, os.path.getsize(os.path.join(HERE, f)), "bytes")
