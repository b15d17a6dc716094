"""Flat full-scan PQ index (counterpart of ``SortedIndex``, ``Index.scala:310-337``).

Keys are globally sorted; the whole code matrix is scanned per query batch.
Two device scan strategies (see ``gulon_tpu.ops.scan``):

- ``"decode"`` (default): gather-decode + MXU matmul — fastest for batched
  queries, the TPU-native ADC formulation;
- ``"lut"``: per-query lookup-table scan, the direct analog of the
  reference's hot loop — lighter for tiny batches;
- ``"auto"``: picks by batch size.
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
from gulon_tpu.ops.distance import normalize_rows
from gulon_tpu.ops.pq import ProductQuantizer

# Below this many queries the LUT scan moves less data than decode.
_AUTO_LUT_MAX_QUERIES = 4


@dataclasses.dataclass
class FlatIndex(Index):
    _key_index: SortedKeyIndex
    pq: ProductQuantizer
    codes: jax.Array  # [N, m] uint
    recon_norms: jax.Array  # [N] f32
    metric: Metric
    scan_strategy: str = "auto"  # "auto" | "decode" | "lut"
    tile_rows: int = scan_ops.DEFAULT_TILE_ROWS
    # "default" = fast MXU (bf16 passes), "highest" = full-f32 parity mode
    precision: str = "default"
    # "approx" = hardware PartialReduce per-tile top-k; "exact" = TopKHeap-
    # faithful concat+top_k. approx falls back to exact on CPU.
    topk_impl: str = "approx"
    recall_target: float = 0.95

    @property
    def key_index(self) -> SortedKeyIndex:
        return self._key_index

    @property
    def dimension(self) -> int:
        return self.pq.dimension

    @property
    def size(self) -> int:
        return int(self.codes.shape[0])

    def _prepare_queries(self, vectors) -> jax.Array:
        q = jnp.asarray(vectors, jnp.float32)
        if q.ndim != 2 or q.shape[1] != self.dimension:
            raise ValueError(
                f"queries must be [Q, {self.dimension}], got {q.shape}"
            )
        if self.metric.normalized:
            q = normalize_rows(q)  # Index.scala:324-331
        return q

    def batch_query(self, k: int, vectors) -> List[Result]:
        scan_ops.resolve_precision(self.precision)  # validate even on paths
        q = self._prepare_queries(vectors)          # that ignore it (lut)
        k_eff = min(k, self.size)
        strategy = self.scan_strategy
        if strategy == "auto":
            strategy = "lut" if q.shape[0] <= _AUTO_LUT_MAX_QUERIES else "decode"
        if strategy == "decode":
            dists, ids = scan_ops.adc_scan_decode(
                q,
                self.pq.codebooks,
                self.codes,
                self.recon_norms,
                bounds=self.pq.bounds,
                k=k_eff,
                tile_rows=self.tile_rows,
                precision=self.precision,
                topk_impl=self.topk_impl,
                recall_target=self.recall_target,
            )
        elif strategy == "lut":
            lut = self.pq.lut(q)
            dists, ids = scan_ops.adc_scan_lut(
                lut,
                self.codes,
                jnp.ones((self.size,), jnp.bool_),
                k=k_eff,
                tile_rows=self.tile_rows,
                topk_impl=self.topk_impl,
                recall_target=self.recall_target,
            )
        else:
            raise ValueError(f"unknown scan strategy {strategy!r}")
        return self._make_results(dists, ids)

    def lookup(self, word: str) -> Optional[np.ndarray]:
        row = self._key_index.lookup(word)
        if row is None:
            return None
        rec = self.pq.decode(self.codes[row : row + 1])
        return np.asarray(rec)[0]
