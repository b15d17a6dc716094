"""Streaming builds: parse -> device-encode pipeline with O(chunk) host RSS.

The in-memory builders (``gulon_tpu.models.build``) hold the full f32 corpus
on the host. At 10M x 300d that is ~12 GB — fine for the reference's JVM
design point, wasteful for a TPU pipeline where the corpus only exists to be
(a) sampled for codebook training and (b) encoded into m-byte codes. These
builders never materialize it:

1. the native parser indexes the file (keys + per-row line offsets only,
   ``native/word2vec_parser.cpp``; counterpart of the reference's chunked
   streaming ingest at ``WordVectors.scala:199-257``);
2. codebooks train on a uniform row sample parsed on demand;
3. vectors stream through the device in chunks, double-buffered: the parser
   fills chunk N+1 on host threads while the TPU encodes chunk N;
4. only the [N, m] code matrix, keys, and per-row scalars persist; the final
   key-sort / group-sort permutation is applied to the codes.

Semantics note: the streaming IVF build trains the coarse quantizer on the
training sample rather than the full corpus (the in-memory builder matches
the reference exactly; sample-trained coarse quantizers are standard IVF
practice and the full corpus is still exactly assigned/encoded).
"""

from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import jax.numpy as jnp
import numpy as np

from gulon_tpu.models.build import (
    default_limit,
    default_num_partitions,
    _normalize_np,
)
from gulon_tpu.models.flat import FlatIndex
from gulon_tpu.models.ivf import IVFIndex, LimitGroups, Strategy
from gulon_tpu.models.keyindex import GroupedKeyIndex, SortedKeyIndex
from gulon_tpu.models.metric import Metric
from gulon_tpu.ops.kmeans import KMeansConfig, fit_kmeans
from gulon_tpu.ops.pq import PQConfig, train_product_quantizer
from gulon_tpu.utils.native import Word2VecStream

_DEFAULT_CHUNK = 1 << 18


@dataclasses.dataclass
class StreamProgress:
    """Per-chunk pipeline report (rows encoded so far)."""

    rows_done: int
    total_rows: int

    @property
    def percentage(self) -> float:
        return 100.0 * self.rows_done / max(self.total_rows, 1)


def _train_sample(
    stream: Word2VecStream,
    config: PQConfig,
    normalized: bool,
    order: Optional[np.ndarray] = None,
):
    """Training rows, sampled exactly like ``train_product_quantizer``
    samples an in-memory corpus presented in ``order`` (seed-identical, so
    streaming and in-memory builds train byte-identical codebooks).

    Returns (vectors, file-row ids).
    """
    n = stream.num_rows
    sample_n = min(config.train_sample or n, n)
    if sample_n < n:
        rng = np.random.default_rng(config.seed)
        ids = np.sort(rng.choice(n, sample_n, replace=False))
    else:
        ids = np.arange(n)
    rows = ids if order is None else order[ids]
    x = stream.gather(rows)
    return (_normalize_np(x) if normalized else x), rows


def _pipeline(stream, n, chunk, normalized, consume, report_fn=None,
              stats=None):
    """Double-buffered parse->consume loop: the host parses chunk N+1 while
    ``consume(start, x_chunk)`` (typically a device encode) runs on N.

    ``stats`` (optional dict) accumulates the pipeline's time split:
    ``wait_s`` — main thread blocked on the parser (parse NOT hidden
    behind device work), ``consume_s`` — time in ``consume``, ``wall_s``
    — total. The hidden-parse/overlap fraction a benchmark reports is
    ``1 - wait_s / parse_only_s``."""
    import time as _time

    t_all = _time.monotonic()
    wait_s = consume_s = 0.0
    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(stream.rows, 0, min(chunk, n))
        start = 0
        while start < n:
            t0 = _time.monotonic()
            x = fut.result()
            wait_s += _time.monotonic() - t0
            nxt = start + len(x)
            if nxt < n:
                fut = pool.submit(stream.rows, nxt, min(chunk, n - nxt))
            if normalized:
                x = _normalize_np(x)
            t0 = _time.monotonic()
            consume(start, x)
            consume_s += _time.monotonic() - t0
            if report_fn is not None:
                report_fn(StreamProgress(rows_done=nxt, total_rows=n))
            start = nxt
    if stats is not None:
        stats["wait_s"] = stats.get("wait_s", 0.0) + wait_s
        stats["consume_s"] = stats.get("consume_s", 0.0) + consume_s
        stats["wall_s"] = stats.get("wall_s", 0.0) + (
            _time.monotonic() - t_all
        )


def build_flat_index_streaming(
    path: str,
    metric: Metric = Metric.L2,
    pq_config: PQConfig = PQConfig(),
    *,
    encode_chunk: int = _DEFAULT_CHUNK,
    num_threads: int = 0,
    report_fn=None,
    mesh=None,
    pipeline_stats: Optional[dict] = None,
) -> FlatIndex:
    """Linear build straight from a word2vec file, never holding the f32
    corpus in host memory (``BuildIndex.scala:84-93`` at streaming scale)."""
    with Word2VecStream(path, num_threads) as stream:
        n = stream.num_rows
        # the reference trains on the KEY-SORTED corpus
        # (BuildIndex.scala:84-93: vecs.sorted before quantizeVectors)
        order = np.argsort(stream.keys, kind="stable")
        train_x, _ = _train_sample(
            stream, pq_config, metric.normalized, order=order
        )
        pq = train_product_quantizer(
            train_x,
            pq_config._replace(train_sample=None),
            mesh=mesh,
        )
        del train_x

        codes = np.empty((n, pq.num_quantizers), pq.dtype_codes)

        if mesh is not None:
            from gulon_tpu.parallel.ops import sharded_encode

            def consume(start, x):
                codes[start : start + len(x)] = sharded_encode(
                    pq, x, mesh, chunk=len(x)
                )
        else:
            def consume(start, x):
                codes[start : start + len(x)] = np.asarray(pq.encode(x))

        _pipeline(
            stream, n, encode_chunk, metric.normalized, consume, report_fn,
            stats=pipeline_stats,
        )
        keys = stream.keys

    keys = keys[order]
    codes_dev = jnp.asarray(codes[order])
    return FlatIndex(
        _key_index=SortedKeyIndex(keys),
        pq=pq,
        codes=codes_dev,
        recon_norms=pq.reconstruction_norms(codes_dev),
        metric=metric,
    )


def build_ivf_index_streaming(
    path: str,
    metric: Metric = Metric.L2,
    pq_config: PQConfig = PQConfig(),
    *,
    num_partitions: Optional[int] = None,
    strategy: Optional[Strategy] = None,
    coarse_max_iters: int = 100,
    coarse_seed: int = 0,
    coarse_init: str = "sample",
    max_partition_size: Optional[int] = None,
    encode_chunk: int = _DEFAULT_CHUNK,
    num_threads: int = 0,
    report_fn=None,
    mesh=None,
) -> IVFIndex:
    """Sublinear build straight from a word2vec file with O(chunk) host RSS
    (``BuildIndex.scala:70-82`` at streaming scale).

    Two streamed passes: coarse-assign every row, then encode residuals;
    the grouping permutation is applied to the code matrix, not to the
    vectors.
    """
    import jax

    with Word2VecStream(path, num_threads) as stream:
        n = stream.num_rows
        if num_partitions is None:
            num_partitions = default_num_partitions(n)
        if strategy is None:
            strategy = LimitGroups(default_limit(num_partitions))

        # coarse quantizer trains on read-order rows, like the reference's
        # computePartitions over the unsorted corpus
        train_x, _ = _train_sample(stream, pq_config, metric.normalized)
        coarse_cfg = KMeansConfig(
            k=num_partitions, max_iters=coarse_max_iters, seed=coarse_seed,
            init=coarse_init,
        )
        if mesh is not None:
            from gulon_tpu.parallel.ops import sharded_fit_kmeans

            coarse = sharded_fit_kmeans(train_x, coarse_cfg, mesh)
        else:
            coarse = fit_kmeans(train_x, coarse_cfg, report_fn=report_fn)
        centroids_full = np.asarray(coarse.centroids)
        cent_dev = jnp.asarray(centroids_full)

        # Pass A: coarse-assign every row (streamed; device argmin).
        from gulon_tpu.ops.distance import assign_scores

        assign_fn = jax.jit(
            lambda xc: jnp.argmin(
                assign_scores(xc, cent_dev), axis=-1
            ).astype(jnp.int32)
        )
        assignments = np.empty(n, np.int32)

        def consume_assign(start, x):
            assignments[start : start + len(x)] = np.asarray(assign_fn(x))

        _pipeline(
            stream, n, encode_chunk, metric.normalized, consume_assign,
            report_fn,
        )

        del train_x

        if max_partition_size is not None:
            # split oversized partitions before grouping: only one
            # partition's vectors are ever gathered into host memory
            if max_partition_size < 1:
                raise ValueError("max_partition_size must be >= 1")
            from gulon_tpu.models.build import _split_oversized_partitions

            def fetch(rows):
                xp = stream.gather(rows)
                return _normalize_np(xp) if metric.normalized else xp

            assignments, centroids_full = _split_oversized_partitions(
                fetch, assignments, centroids_full, max_partition_size,
                coarse_seed,
            )
            assignments = assignments.astype(np.int32)
            num_partitions = len(centroids_full)

        # grouped (cluster, key) order is known from pass A; the residual
        # PQ trains on grouped-order residuals exactly like the in-memory
        # builder (grouped.residuals() -> train)
        order = np.lexsort((stream.keys, assignments))
        pq_x, pq_rows = _train_sample(
            stream, pq_config, metric.normalized, order=order
        )
        pq = train_product_quantizer(
            pq_x - centroids_full[assignments[pq_rows]],
            pq_config._replace(train_sample=None),
            mesh=mesh,
        )
        del pq_x

        # Pass B: residual-encode every row (streamed, double-buffered).
        codes = np.empty((n, pq.num_quantizers), pq.dtype_codes)

        if mesh is not None:
            from gulon_tpu.parallel.ops import sharded_encode

            def consume_encode(start, x):
                res = x - centroids_full[assignments[start : start + len(x)]]
                codes[start : start + len(x)] = sharded_encode(
                    pq, res, mesh, chunk=len(x)
                )
        else:
            def consume_encode(start, x):
                res = x - centroids_full[assignments[start : start + len(x)]]
                codes[start : start + len(x)] = np.asarray(pq.encode(res))

        _pipeline(
            stream, n, encode_chunk, metric.normalized, consume_encode,
            report_fn,
        )
        keys = stream.keys

    # Group rows by (cluster, key), dropping empty clusters
    # (WordVectors.scala:24-58) — permutation applied to codes only.
    sorted_assign = assignments[order]
    used = np.unique(sorted_assign)
    relabel = np.full(num_partitions, -1, np.int32)
    relabel[used] = np.arange(len(used), dtype=np.int32)
    group_ids = relabel[sorted_assign]
    centroids = centroids_full[used]
    group_offsets = np.searchsorted(
        group_ids, np.arange(1, len(used))
    ).astype(np.int32)
    codes = codes[order]
    keys = keys[order]

    # row_const = ||r^||^2 + 2<c_g, r^> from codes alone, via per-partition
    # LUT gathers (centroid_code_dot) — no corpus reconstruction.
    codes_dev = jnp.asarray(codes)
    rnorm = np.asarray(pq.reconstruction_norms(codes_dev))
    crdot = pq.centroid_code_dot(codes, centroids, group_ids)

    return IVFIndex(
        _key_index=GroupedKeyIndex(keys, group_offsets),
        pq=pq,
        codes=codes_dev,
        row_const=jnp.asarray(rnorm + 2.0 * crdot),
        group_ids=jnp.asarray(group_ids),
        centroids=jnp.asarray(centroids),
        metric=metric,
        strategy=strategy,
    )
