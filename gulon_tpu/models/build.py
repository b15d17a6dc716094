"""Index builders: the TPU-native pipelines behind ``gulon build-index``.

Counterparts of ``command/BuildIndex.scala``:

- linear pipeline (``BuildIndex.scala:84-93``): sort keys -> train PQ ->
  encode -> ``FlatIndex``;
- sublinear pipeline (``BuildIndex.scala:70-82``): coarse k-means over the
  full vectors -> group rows by (cluster, key), dropping empty clusters
  (``WordVectors.scala:24-58``) -> train PQ on residuals -> encode ->
  ``IVFIndex``.

Encoding streams the corpus through the device in chunks, so corpora larger
than HBM build fine on one chip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from gulon_tpu.models.flat import FlatIndex
from gulon_tpu.models.ivf import IVFIndex, LimitGroups, LimitVectors, Strategy
from gulon_tpu.models.keyindex import GroupedKeyIndex, SortedKeyIndex
from gulon_tpu.models.metric import Metric
from gulon_tpu.ops.kmeans import KMeansConfig, fit_kmeans
from gulon_tpu.ops.pq import PQConfig, ProductQuantizer, train_product_quantizer

_DEFAULT_ENCODE_CHUNK = 1 << 20


def _normalize_np(x: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    return np.where(norms > 0, x / np.where(norms > 0, norms, 1.0), x)


def _encode_chunked(
    pq: ProductQuantizer, x: np.ndarray, chunk: int, mesh=None
) -> np.ndarray:
    """Bulk encode; with ``mesh`` the rows shard over every device (P3,
    ``ProductQuantizer.scala:25-35`` at mesh scale)."""
    if mesh is not None and len(x):
        from gulon_tpu.parallel.ops import sharded_encode

        return sharded_encode(pq, x, mesh, chunk=chunk)
    parts = []
    for start in range(0, len(x), chunk):
        parts.append(np.asarray(pq.encode(x[start : start + chunk])))
    return np.concatenate(parts, axis=0) if parts else np.zeros(
        (0, pq.num_quantizers), np.uint8
    )


def build_flat_index(
    keys: Sequence[str],
    vectors,
    metric: Metric = Metric.L2,
    pq_config: PQConfig = PQConfig(),
    *,
    encode_chunk: int = _DEFAULT_ENCODE_CHUNK,
    report_fn=None,
    mesh=None,
) -> FlatIndex:
    """Linear build: sort -> PQ train -> encode (``BuildIndex.scala:84-93``).

    With ``mesh`` the codebooks train distributed across devices.
    """
    x = np.asarray(vectors, np.float32)
    keys = np.asarray(keys, dtype=object)
    if len(keys) != len(x):
        raise ValueError("keys and vectors must have equal length")
    if metric.normalized:
        x = _normalize_np(x)

    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    x = x[order]

    pq = train_product_quantizer(x, pq_config, report_fn=report_fn, mesh=mesh)
    codes = jnp.asarray(_encode_chunked(pq, x, encode_chunk, mesh=mesh))
    recon_norms = pq.reconstruction_norms(codes)
    return FlatIndex(
        _key_index=SortedKeyIndex(keys),
        pq=pq,
        codes=codes,
        recon_norms=recon_norms,
        metric=metric,
    )


def default_num_partitions(n: int) -> int:
    """Reference default: ``size / 1000`` (``BuildIndex.scala:104``)."""
    return max(1, n // 1000)


def default_limit(num_partitions: int) -> int:
    """Reference default: ``max(0.05 * partitions, 5)`` (``BuildIndex.scala:105``)."""
    return max(int(0.05 * num_partitions), 5)


def build_ivf_index(
    keys: Sequence[str],
    vectors,
    metric: Metric = Metric.L2,
    pq_config: PQConfig = PQConfig(),
    *,
    num_partitions: Optional[int] = None,
    strategy: Optional[Strategy] = None,
    coarse_max_iters: int = 100,
    coarse_seed: int = 0,
    coarse_init: str = "sample",
    encode_chunk: int = _DEFAULT_ENCODE_CHUNK,
    report_fn=None,
    mesh=None,
) -> IVFIndex:
    """Sublinear build (``BuildIndex.scala:70-82``).

    With ``mesh`` the k-means stages train distributed (rows data-parallel,
    PQ subspaces model-parallel; see ``gulon_tpu.parallel``).
    """
    from gulon_tpu.utils.word2vec import WordVectors

    x = np.asarray(vectors, np.float32)
    keys = np.asarray(keys, dtype=object)
    if len(keys) != len(x):
        raise ValueError("keys and vectors must have equal length")
    if metric.normalized:
        x = _normalize_np(x)
    n = len(x)
    if num_partitions is None:
        num_partitions = default_num_partitions(n)
    if strategy is None:
        strategy = LimitGroups(default_limit(num_partitions))

    # Coarse clustering over the full vectors (CommandUtils.scala:127-133).
    coarse_cfg = KMeansConfig(
        k=num_partitions, max_iters=coarse_max_iters, seed=coarse_seed,
        init=coarse_init,
    )
    if mesh is not None:
        from gulon_tpu.parallel.ops import sharded_fit_kmeans

        coarse = sharded_fit_kmeans(x, coarse_cfg, mesh)
    else:
        coarse = fit_kmeans(x, coarse_cfg, report_fn=report_fn)

    # Group rows by (cluster, key), dropping empty clusters
    # (WordVectors.scala:24-58).
    grouped = WordVectors(keys, x).grouped(
        np.asarray(coarse.centroids), np.asarray(coarse.assignments)
    )
    centroids = grouped.centroids
    group_ids = grouped.group_ids

    residuals = grouped.residuals()
    pq = train_product_quantizer(
        residuals, pq_config, report_fn=report_fn, mesh=mesh
    )
    codes_np = _encode_chunked(pq, residuals, encode_chunk, mesh=mesh)
    codes = jnp.asarray(codes_np)

    # Per-row constant of the expanded residual distance:
    # ||r^||^2 + 2 <c_g, r^>  (see ivf.py module docstring), via
    # per-partition LUT gathers — no corpus reconstruction.
    rnorm = np.asarray(pq.reconstruction_norms(codes))
    crdot = pq.centroid_code_dot(codes_np, centroids, group_ids)
    row_const = jnp.asarray(rnorm + 2.0 * crdot)

    return IVFIndex(
        _key_index=GroupedKeyIndex(grouped.keys, grouped.group_offsets),
        pq=pq,
        codes=codes,
        row_const=row_const,
        group_ids=jnp.asarray(group_ids),
        centroids=jnp.asarray(centroids),
        metric=metric,
        strategy=strategy,
    )
