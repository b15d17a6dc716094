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

import jax
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
    opq_iters: int = 0,
    report_fn=None,
    mesh=None,
) -> FlatIndex:
    """Linear build: sort -> PQ train -> encode (``BuildIndex.scala:84-93``).

    With ``mesh`` the codebooks train distributed across devices. With
    ``opq_iters > 0`` a learned orthogonal rotation (``ops/opq.py``) is
    trained first and the codes quantize ``x @ rotation`` — lower
    quantization error at identical code bytes; queries rotate inside the
    index, so the serving API is unchanged.
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

    rotation = None
    if opq_iters > 0:
        from gulon_tpu.ops.opq import train_opq

        rotation, pq = train_opq(
            x, pq_config, opq_iters=opq_iters, mesh=mesh
        )
        x = np.asarray(
            jnp.matmul(
                jnp.asarray(x), rotation,
                precision=jax.lax.Precision.HIGHEST,
            )
        )
    else:
        pq = train_product_quantizer(
            x, pq_config, report_fn=report_fn, mesh=mesh
        )
    codes = jnp.asarray(_encode_chunked(pq, x, encode_chunk, mesh=mesh))
    recon_norms = pq.reconstruction_norms(codes)
    return FlatIndex(
        _key_index=SortedKeyIndex(keys),
        pq=pq,
        codes=codes,
        recon_norms=recon_norms,
        metric=metric,
        rotation=rotation,
    )


def _balanced_split(
    xp: np.ndarray, k: int, cap: int, rng: np.random.Generator
) -> np.ndarray:
    """Assign ``xp``'s rows to ``k`` children, each holding <= ``cap`` rows.

    A few host-side Lloyd iterations for quality, then a capacity repair
    pass: each overfull child keeps its ``cap`` nearest rows and the rest
    greedily move to the nearest child with spare room. Feasible because
    ``k*cap >= len(xp)`` by construction.
    """
    n = len(xp)
    init = xp[rng.choice(n, size=k, replace=False)]
    cents = init.astype(np.float32)
    xn = (xp * xp).sum(1)
    for _ in range(10):
        d2 = xn[:, None] - 2.0 * (xp @ cents.T) + (cents * cents).sum(1)[None]
        assign = d2.argmin(1)
        for j in range(k):
            sel = assign == j
            if sel.any():
                cents[j] = xp[sel].mean(0)
    d2 = xn[:, None] - 2.0 * (xp @ cents.T) + (cents * cents).sum(1)[None]
    assign = d2.argmin(1)
    counts = np.bincount(assign, minlength=k)
    for j in range(k):
        if counts[j] <= cap:
            continue
        idx = np.nonzero(assign == j)[0]
        move = idx[np.argsort(d2[idx, j])][cap:]
        counts[j] = cap
        for r in move:
            for cnd in np.argsort(d2[r]):
                if cnd != j and counts[cnd] < cap:
                    assign[r] = cnd
                    counts[cnd] += 1
                    break
    return assign


def _split_oversized_partitions(
    fetch_rows,
    assignments: np.ndarray,
    centroids: np.ndarray,
    cap: int,
    seed: int,
):
    """Split every partition with > ``cap`` rows into <= ``cap``-row children.

    Bounds ``pmax`` so the sublinear IVF paths (whose per-probe cost scales
    with the *largest* partition; see ``ivf.py``) never pay for one outlier
    partition. Children get their own centroids (the child-member means), so
    probing ranks them like any other partition. The reference never bounds
    partition sizes (its ranged scan pays actual sizes, ``Index.scala:411``)
    — this is an opt-in build knob for TPU serving shapes.

    ``fetch_rows(row_ids) -> [len, d] f32`` supplies vectors on demand, so
    streaming builds only ever hold one oversized partition in host memory.
    """
    assignments = np.asarray(assignments, np.int64).copy()
    cents = list(np.asarray(centroids, np.float32))
    rng = np.random.default_rng(seed)
    next_id = len(cents)
    for pid in range(len(cents)):
        rows = np.nonzero(assignments == pid)[0]
        if len(rows) <= cap:
            continue
        xp = np.asarray(fetch_rows(rows), np.float32)
        kchild = -(-len(rows) // cap)
        child = _balanced_split(xp, kchild, cap, rng)
        for j in range(kchild):
            sel = child == j
            c_j = (
                xp[sel].mean(0).astype(np.float32)
                if sel.any()
                else cents[pid]
            )
            if j == 0:
                cents[pid] = c_j
            else:
                assignments[rows[sel]] = next_id
                cents.append(c_j)
                next_id += 1
    return assignments, np.stack(cents)


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
    max_partition_size: Optional[int] = None,
    encode_chunk: int = _DEFAULT_ENCODE_CHUNK,
    opq_iters: int = 0,
    report_fn=None,
    mesh=None,
) -> IVFIndex:
    """Sublinear build (``BuildIndex.scala:70-82``).

    With ``mesh`` the k-means stages train distributed (rows data-parallel,
    PQ subspaces model-parallel; see ``gulon_tpu.parallel``).
    ``max_partition_size`` bounds every partition by splitting oversized
    ones into capacity-limited children (own centroids) — caps the
    per-probe cost of the sublinear scan strategies.

    With ``opq_iters > 0`` an OPQ rotation (``ops/opq.py``) is learned on
    the coarse residuals and applied as a GLOBAL basis change: coarse
    k-means is rotation-equivariant, so the existing assignment stays
    exact while centroids, residuals, and codebooks move to the rotated
    basis. Queries rotate inside the index; reported distances are
    unchanged (orthogonality).
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
    coarse_cents = np.asarray(coarse.centroids)
    coarse_assign = np.asarray(coarse.assignments)
    if max_partition_size is not None:
        if max_partition_size < 1:
            raise ValueError("max_partition_size must be >= 1")
        coarse_assign, coarse_cents = _split_oversized_partitions(
            lambda rows: x[rows], coarse_assign, coarse_cents,
            max_partition_size, coarse_seed,
        )
    grouped = WordVectors(keys, x).grouped(coarse_cents, coarse_assign)
    centroids = grouped.centroids
    group_ids = grouped.group_ids

    residuals = grouped.residuals()
    rotation = None
    if opq_iters > 0:
        from gulon_tpu.ops.opq import train_opq

        # learn R on the residuals (what the codebooks quantize), then
        # rotate residuals AND centroids: a global basis change that
        # leaves the coarse assignment exactly valid
        rotation, pq = train_opq(
            residuals, pq_config, opq_iters=opq_iters, mesh=mesh
        )
        rot_np = np.asarray(rotation)
        residuals = np.asarray(residuals, np.float32) @ rot_np
        centroids = np.asarray(centroids, np.float32) @ rot_np
    else:
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
        rotation=rotation,
    )
