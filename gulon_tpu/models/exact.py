"""Exact brute-force index over raw float vectors.

The reference exposes exact search only internally (ground truth + coarse
centroid ranking, ``exactNearestNeighbours`` at ``Index.scala:209-229``).
On TPU an unquantized full scan is itself a production-grade serving path —
one MXU matmul per row tile (the BASELINE "fastText crawl 300d exact scan"
configuration: 2M x 300d at ~15 us/query on one v5e chip via the fused
dense kernel) — so it gets a first-class index with the same API as the
PQ indices.

Persistence is npz (raw vectors have no reference wire format to match).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gulon_tpu.models.index import Index, Result
from gulon_tpu.models.keyindex import SortedKeyIndex
from gulon_tpu.models.metric import Metric
from gulon_tpu.ops import scan as scan_ops
from gulon_tpu.ops.distance import normalize_rows, sq_norms


@dataclasses.dataclass
class ExactIndex(Index):
    _key_index: SortedKeyIndex
    vectors: jax.Array  # [N, D] f32 (normalized at build for Cosine)
    metric: Metric
    tile_rows: int = scan_ops.DEFAULT_TILE_ROWS
    precision: str = "default"
    topk_impl: str = "approx"
    recall_target: float = 0.95
    # "auto" (default): fused dense kernel on TPU within its envelope
    # (bf16-scored block winners + a rescore re-rank of 4k candidates),
    # XLA exact_scan otherwise; "xla"/"pallas" force a path.
    scan_strategy: str = "auto"
    rescore_factor: int = 4
    # True (default): gather f32 rows and re-rank at full precision —
    # an index named Exact keeps exact reported distances (the
    # restructured rescore costs +0.81 ms/1024-batch at 2M x 300d).
    # False: rescore from the bf16 kernel operand already in HBM (half
    # the gather bytes, +0.40 ms; distances carry ~2^-9 bf16 rounding) —
    # the max-throughput setting.
    exact_rescore: bool = True
    # Kernel operand precision: "bf16" (default) or "int8". The int8
    # operand (centered-norm digit-pair encoding, prepare_data_i8)
    # HALVES the operand HBM bytes — a capacity option for corpora that
    # would not otherwise fit — with candidate coverage measured equal
    # to bf16 under the same exact f32 rescore on realistic corpora and
    # exact distances via exact_rescore. It is NOT a latency option: on
    # v5e the i8 x i8 -> i32 matmul measured SLOWER than bf16 (20.6 vs
    # 16.8 ms/batch at 2M x 300d, 38.3 vs 15.0 at 4M x 96d) — this
    # toolchain does not realize the int8 MXU rate (matches the round-3
    # i8-decode null result). Falls back to bf16 when the corpus norms
    # do not fit the encoding.
    operand: str = "bf16"
    _data_t: Optional[jax.Array] = None  # lazy [N, Dp] bf16 kernel operand
    _data_i8: Optional[tuple] = None  # lazy (data_i8, meta) int8 operand
    _norms: Optional[jax.Array] = None  # lazy [N] f32 ||x||^2 (hoisted: a
    # per-call sq_norms would re-stream the full f32 corpus from HBM)

    @property
    def key_index(self) -> SortedKeyIndex:
        return self._key_index

    @property
    def dimension(self) -> int:
        return int(self.vectors.shape[1])

    @property
    def size(self) -> int:
        return int(self.vectors.shape[0])

    def batch_query(self, k: int, vectors) -> List[Result]:
        return self._make_results(*self.query_arrays(k, vectors))

    def query_arrays(self, k: int, vectors):
        scan_ops.resolve_precision(self.precision)
        q = jnp.asarray(vectors, jnp.float32)
        if q.ndim != 2 or q.shape[1] != self.dimension:
            raise ValueError(
                f"queries must be [Q, {self.dimension}], got {q.shape}"
            )
        if self.metric.normalized:
            q = normalize_rows(q)
        k_eff = min(k, self.size)
        strategy = self.scan_strategy
        if strategy == "auto":
            strategy = (
                "pallas"
                if (
                    jax.default_backend() == "tpu"
                    and k_eff <= 128
                    and self.size >= 256 * k_eff
                )
                else "xla"
            )
        if strategy == "pallas":
            from gulon_tpu.ops.pallas.dense import (
                dense_scan_pallas,
                dense_scan_pallas_i8,
                prepare_data,
                prepare_data_i8,
            )

            if self.exact_rescore and self.rescore_factor < 1:
                # rescore=0 disables the re-rank entirely, which would
                # silently turn exact_rescore into a no-op: an index
                # named Exact would report dequantized int8 / raw-bf16
                # approximate distances (ADVICE r4)
                raise ValueError(
                    "exact_rescore=True requires rescore_factor >= 1 "
                    "(rescore_factor=0 disables re-ranking; set "
                    "exact_rescore=False for raw kernel distances)"
                )

            if self._norms is None:
                self._norms = sq_norms(self.vectors)
            operand = self.operand
            if operand == "int8" and self._data_i8 is None:
                try:
                    d8, meta, _ = prepare_data_i8(
                        self.vectors, self._norms
                    )
                    self._data_i8 = (d8, meta)
                except ValueError:
                    # wild-norm corpus: remember the fallback — the
                    # attempt is a full-corpus reduction, not per-query
                    self._data_i8 = (None, None)
            if operand == "int8" and self._data_i8[0] is None:
                operand = "bf16"
            if operand == "int8":
                d8, meta = self._data_i8
                return dense_scan_pallas_i8(
                    q,
                    d8,
                    meta,
                    self._norms,
                    k=k_eff,
                    interpret=jax.default_backend() != "tpu",
                    rescore_rows=(
                        self.vectors if self.exact_rescore else None
                    ),
                    rescore=self.rescore_factor,
                )
            if self._data_t is None:
                # pass the norms in: prepare_data would otherwise run its
                # own einsum — a second full pass over the f32 corpus
                self._data_t = prepare_data(self.vectors, self._norms)
            return dense_scan_pallas(
                q,
                self._data_t,
                self._norms,
                k=k_eff,
                interpret=jax.default_backend() != "tpu",
                rescore_rows=self.vectors if self.exact_rescore else None,
                rescore=self.rescore_factor,
            )
        if strategy != "xla":
            raise ValueError(
                f"unknown exact scan strategy {self.scan_strategy!r} "
                "(expected auto|xla|pallas)"
            )
        dists, ids = scan_ops.exact_scan(
            q,
            self.vectors,
            k=k_eff,
            tile_rows=self.tile_rows,
            precision=self.precision,
            topk_impl=self.topk_impl,
            recall_target=self.recall_target,
        )
        return dists, ids

    def lookup(self, word: str) -> Optional[np.ndarray]:
        row = self._key_index.lookup(word)
        if row is None:
            return None
        return np.asarray(self.vectors[row])

    def add(self, keys, vectors) -> "ExactIndex":
        """Return a new index with ``(keys, vectors)`` appended (an extra
        over the reference; see ``models/update.py``). The lazy dense-
        kernel operand rebuilds on the new index's first query."""
        from gulon_tpu.models import update as up
        from gulon_tpu.ops.distance import normalize_rows

        keys_new, x = up.validate_add(keys, vectors, self.dimension)
        xd = jnp.asarray(x)
        if self.metric.normalized:
            xd = normalize_rows(xd)
        merged_keys, order = up.merge_sorted_order(
            self._key_index.keys, keys_new
        )
        merged = jnp.take(
            jnp.concatenate([self.vectors, xd], axis=0),
            jnp.asarray(order),
            axis=0,
        )
        return self._replace_rows(merged_keys, merged)

    def remove(self, keys) -> "ExactIndex":
        """Return a new index without the given keys (all occurrences);
        ``KeyError`` for absent keys, ``ValueError`` on emptying."""
        from gulon_tpu.models import update as up

        keep = up.removal_mask(self._key_index.keys, keys)
        return self._replace_rows(
            self._key_index.keys[keep],
            jnp.take(self.vectors, jnp.asarray(np.flatnonzero(keep)), axis=0),
        )

    def _replace_rows(
        self, keys: np.ndarray, vectors: jax.Array
    ) -> "ExactIndex":
        return dataclasses.replace(
            self,
            _key_index=SortedKeyIndex(keys),
            vectors=vectors,
            _data_t=None,
            _data_i8=None,
            _norms=None,
        )

    def save(self, path) -> None:
        # write through an open handle: np.savez appends ".npz" to bare
        # string paths, which would break save(path)->load(path) round-trips
        with open(path, "wb") as f:
            np.savez_compressed(
                f,
                keys=np.asarray(self.key_index.keys, dtype=np.str_),
                vectors=np.asarray(self.vectors),
                metric=np.int32(self.metric.proto_value),
            )

    @staticmethod
    def load(path) -> "ExactIndex":
        with np.load(path, allow_pickle=False) as z:
            keys = z["keys"].astype(object)
            vectors = jnp.asarray(z["vectors"])
            metric = Metric.from_proto(int(z["metric"]))
        return ExactIndex(SortedKeyIndex(keys), vectors, metric)


def build_exact_index(
    keys, vectors, metric: Metric = Metric.L2
) -> ExactIndex:
    """Sort keys and place the raw vectors on device."""
    x = np.asarray(vectors, np.float32)
    keys = np.asarray(keys, dtype=object)
    if len(keys) != len(x):
        raise ValueError("keys and vectors must have equal length")
    if metric.normalized:
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        x = np.where(norms > 0, x / np.where(norms > 0, norms, 1.0), x)
    order = np.argsort(keys, kind="stable")
    return ExactIndex(
        _key_index=SortedKeyIndex(keys[order]),
        vectors=jnp.asarray(x[order]),
        metric=metric,
    )
