"""Flat full-scan PQ index (counterpart of ``SortedIndex``, ``Index.scala:310-337``).

Keys are globally sorted; the whole code matrix is scanned per query batch.
Scan strategies (see ``gulon_tpu.ops.scan`` / ``gulon_tpu.ops.pallas.adc``):

- ``"pallas"``: the fused single-kernel scan (transposed decode + distances
  + block-min selection in VMEM) — the fastest code-resident batched scan
  on TPU (~2.3x the decode strategy at batch 1024 on v5e) at ``m``
  bytes/vector;
- ``"decode"``: one-hot decode + MXU matmul in XLA — code-resident, runs
  everywhere, no kernel constraints;
- ``"lut"``: per-query lookup-table scan, the direct analog of the
  reference's hot loop; the cheapest path for tiny query batches;
- ``"cached"``: scan a cached (bf16) decode of the code matrix — pure MXU
  matmul per batch, the throughput ceiling, at ``2*m*dsub`` bytes/vector of
  HBM (call :meth:`enable_cache` or just use the strategy; the cache builds
  lazily). On TPU this routes through the fused dense kernel
  (``ops/pallas/dense.py``) so score tiles never round-trip HBM — at deep
  ``m*dsub`` (e.g. glove300's 304) the code-resident pallas scan is
  decode-bound and the cached kernel is the latency winner;
- ``"auto"`` (default): tiny batches -> lut; a built cache -> cached; TPU
  within kernel limits -> pallas; otherwise decode.
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


def _augment_cache(cache: jax.Array, norms: jax.Array) -> jax.Array:
    """Dense-kernel operand over a decoded cache: ``[N, D] -> [N,
    padded_dim(D)]`` bf16 with hi/lo norm lanes; device-side."""
    from gulon_tpu.ops.pallas.dense import prepare_data

    return prepare_data(cache, norms)


@dataclasses.dataclass
class FlatIndex(Index):
    _key_index: SortedKeyIndex
    pq: ProductQuantizer
    codes: jax.Array  # [N, m] uint
    recon_norms: jax.Array  # [N] f32
    metric: Metric
    scan_strategy: str = "auto"  # "auto"|"decode"|"lut"|"cached"|"pallas"
    tile_rows: int = scan_ops.DEFAULT_TILE_ROWS
    # "default" = fast MXU (bf16 passes), "highest" = full-f32 parity mode
    precision: str = "default"
    # "approx" = hardware PartialReduce per-tile top-k; "exact" = TopKHeap-
    # faithful concat+top_k. approx falls back to exact on CPU.
    topk_impl: str = "approx"
    recall_target: float = 0.95
    # >1: pallas/cached scans over-fetch k*rerank_factor candidates and
    # rescore them exactly in f32 (recall-then-rerank); 1 disables. 0
    # (default) = AUTO: resolved once per row set from a distinct-code
    # degeneracy statistic (see resolved_rerank_factor) — healthy corpora
    # stay at 1 (the fused kernel's full-precision block minima already
    # rank at decode-path quality; rerank measured +~1% scan efficiency
    # for +~1.3 ms/1024-batch on v5e), code-collapsed corpora (many rows
    # sharing one code tuple => equal-distance cohorts spanning selection
    # blocks) get an over-fetch so the default config expresses what its
    # codes can (VERDICT r3 item 3).
    rerank_factor: int = 0
    # ranked candidates the fused kernel keeps per 128-row block (1..4).
    # 1 is the throughput setting; 2-4 repairs the case where several
    # true top-k members share one 128-row block (pinned by the
    # constructed-tie test in tests/test_pallas.py). On degenerate
    # corpora that collapse onto few distinct codes the measured loss
    # mechanism is CROSS-block candidate coverage instead — there
    # rerank_factor is the knob (benchmarks/g300_quality.py: winners=2
    # null, fetch=120 + exact rerank recovers ~70% of the gap; bf16
    # score noise measured null on the same corpus). 0 (default) = AUTO:
    # expected equal-distance cohort members per 128-row block is
    # ~128*dup/N — negligible at corpus scale (resolves to 1, no cost),
    # decisive on small collapsed corpora (resolves up to 4).
    pallas_winners: int = 0
    decoded_cache: Optional[jax.Array] = None  # [N, m*dsub], see enable_cache
    # 0 = codes are [N, m] uint; 2/4 = row-packed uint8 (see pack_memory)
    packed_width: int = 0
    # [D, D] learned OPQ rotation (ops/opq.py): codes quantize x @ rotation,
    # queries rotate in _prepare_queries, lookup un-rotates. None = plain PQ
    # (the reference's fixed coordinate split). Orthogonal, so reported L2
    # distances are unchanged.
    rotation: Optional[jax.Array] = None
    # query-invariant [m, N] i32 relayout for the pallas kernel, built lazily
    _pallas_codes_t: Optional[jax.Array] = None
    # lazy dense-kernel operand over the decoded cache (norm lanes
    # appended): on TPU the cached strategy runs the fused dense kernel
    # instead of the XLA tile scan — at deep m*dsub the scan is
    # matmul-bound and the kernel keeps scores in VMEM
    _cache_aug: Optional[jax.Array] = None
    # memoized auto knobs (rerank_factor/pallas_winners == 0); reset on
    # row change. _auto_dup is the measured duplication factor itself.
    _auto_rerank: Optional[int] = None
    _auto_dup: Optional[float] = None

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
        if self.rotation is not None:
            q = jnp.matmul(
                q, self.rotation, precision=jax.lax.Precision.HIGHEST
            )
        return q

    def batch_query(self, k: int, vectors) -> List[Result]:
        return self._make_results(*self.query_arrays(k, vectors))

    def query_arrays(self, k: int, vectors):
        scan_ops.resolve_precision(self.precision)  # validate even on paths
        q = self._prepare_queries(vectors)          # that ignore it (lut)
        k_eff = min(k, self.size)
        strategy = self.scan_strategy
        if strategy == "auto":
            small = q.shape[0] <= _AUTO_LUT_MAX_QUERIES
            if small and not self.packed_width:
                # lut needs unpacked codes; packed indices stay on decode
                strategy = "lut"
            elif self._has_cache():
                strategy = "cached"
            elif self._pallas_eligible(k_eff):
                strategy = "pallas"
            else:
                strategy = "decode"
        # bf16-ranked strategies over-fetch, then rescore exactly below.
        # The degeneracy statistic resolves lazily and ONLY on the
        # strategies that consume it (it costs a 65536-row readback once)
        k_scan = k_eff
        rerank = 1
        if strategy in ("pallas", "cached"):
            rerank = self.resolved_rerank_factor()
        if strategy in ("pallas", "cached") and rerank > 1:
            k_scan = min(self.size, k_eff * rerank)
            if strategy == "pallas":
                # stay inside the kernel's k <= 128 / n >= 256*k envelope
                k_scan = min(k_scan, 128, max(k_eff, self.size // 256))
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
                packed_width=self.packed_width,
            )
        elif strategy == "lut":
            if self.packed_width:
                raise ValueError(
                    "lut strategy needs unpacked codes (index.pack_memory()"
                    " was called); use scan_strategy='decode'"
                )
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
        elif strategy == "cached":
            if self.packed_width and not self._has_cache():
                raise ValueError(
                    "cached strategy needs unpacked codes; build the cache "
                    "before pack_memory()"
                )
            q_pad = self._q_pad(q)
            if (
                jax.default_backend() == "tpu"
                and self.topk_impl != "exact"  # block-min granularity;
                # "exact" keeps the every-row XLA ranking below
                and k_scan <= 128
                and self.size >= 256 * k_scan
            ):
                # fused dense kernel over the cached reconstruction: the
                # scores never round-trip HBM (at glove300 the XLA tile
                # scan is bound by the [Q, T] tiles it materializes).
                # Operand rescore (x4 over-fetch) repairs 128-row block
                # collisions; the operand IS the cache, so the re-rank
                # matches cached_scan's bf16 distance class.
                from gulon_tpu.ops.pallas.dense import dense_scan_pallas

                if self._cache_aug is None:
                    if self.decoded_cache is None:
                        self.enable_cache()
                    self._cache_aug = _augment_cache(
                        self.decoded_cache, self.recon_norms
                    )
                    # don't hold two ~2*m*dsub B/row copies: the aug IS
                    # the cache now; the XLA fallback rebuilds from codes
                    self.decoded_cache = None
                dists, ids = dense_scan_pallas(
                    q_pad,
                    self._cache_aug,
                    self.recon_norms,
                    k=k_scan,
                    rescore=max(rerank, 4),
                )
            else:
                if self.decoded_cache is None:
                    self.enable_cache()
                dists, ids = scan_ops.cached_scan(
                    q_pad,
                    self.decoded_cache,
                    self.recon_norms,
                    k=k_scan,
                    tile_rows=self.tile_rows,
                    topk_impl=self.topk_impl,
                    recall_target=self.recall_target,
                )
        elif strategy == "pallas":
            from gulon_tpu.ops.pallas.adc import adc_scan_pallas

            if self.packed_width:
                raise ValueError(
                    "pallas strategy needs unpacked codes; use "
                    "scan_strategy='decode' after pack_memory()"
                )

            if not self._kernel_bounds_ok(k_scan):
                # kernel constraints (tiny corpus / large k / large K):
                # fall back to the XLA decode path
                return dataclasses.replace(
                    self, scan_strategy="decode"
                ).query_arrays(k, vectors)
            if self._pallas_codes_t is None:
                from gulon_tpu.ops.pallas.adc import pack_codes_t

                self._pallas_codes_t = pack_codes_t(
                    self.codes, self.pq.num_clusters
                )
            dists, ids = adc_scan_pallas(
                q,
                self.pq.codebooks,
                self._pallas_codes_t,
                self.recon_norms,
                bounds=self.pq.bounds,
                k=k_scan,
                num_rows=self.size,
                interpret=jax.default_backend() != "tpu",
                winners=self.resolved_pallas_winners(),
            )
        else:
            raise ValueError(f"unknown scan strategy {strategy!r}")
        if k_scan > k_eff:
            dists, ids = scan_ops.rescore_exact(
                q,
                self.pq.codebooks,
                self.codes,
                self.recon_norms,
                ids,
                bounds=self.pq.bounds,
                k=k_eff,
                packed_width=self.packed_width,
            )
        return dists, ids

    def resolved_rerank_factor(self) -> int:
        """The effective rerank factor: the explicit knob, or (at 0) an
        auto value from code degeneracy, memoized per row set.

        Statistic: distinct-code fraction over a row sample. Rows sharing
        one code tuple have EXACTLY equal scan distances, and the fused
        kernel's block-granular selection returns at most
        ``pallas_winners`` of an equal-distance cohort per 128-row block —
        on corpora that collapse onto few distinct codes the true top-k's
        cohort spans blocks, and only over-fetch + exact rescore restores
        the decode-scan ceiling (``Index.scala:393-409`` +
        ``TopKHeap.scala:69-79``: the scan must express what the codes
        can). Healthy corpora (duplication ~1) resolve to 1 — no latency
        cost.
        """
        if self.rerank_factor:
            return self.rerank_factor
        if self._auto_rerank is None:
            dup = self._code_duplication()
            if dup <= 1.25:
                self._auto_rerank = 1
            else:
                # fetch ~ the duplication factor (cohort width), inside
                # the kernel's k<=128 envelope; floor 4 so the rescore
                # has slack, cap 12 (~the fetch=128 ceiling at k=10)
                self._auto_rerank = int(min(12, max(4, round(dup))))
        return self._auto_rerank

    def resolved_pallas_winners(self) -> int:
        """Effective per-block winner count: explicit knob, or (at 0) an
        auto value. Expected equal-distance cohort members sharing one
        128-row selection block is ~``128 * dup / N``; at corpus scale
        this is << 1 (resolve to 1 — the throughput setting), on small
        code-collapsed corpora it is the loss mechanism the rescore alone
        cannot repair (a block emits at most ``winners`` of a cohort)."""
        if self.pallas_winners:
            return self.pallas_winners
        dup = self._code_duplication()
        if dup <= 1.25 or self.size == 0:
            return 1
        per_block = 128.0 * dup / self.size
        return int(min(4, max(1, -(-per_block // 1))))

    def _code_duplication(self) -> float:
        """Rows-per-distinct-code over a row sample (memoized)."""
        if self._auto_dup is None:
            n = self.size
            if n == 0:
                self._auto_dup = 1.0
            else:
                sample = min(n, 65536)
                if self.packed_width:  # unpack only the sampled rows
                    codes = np.asarray(
                        scan_ops.unpack_tile(
                            self.codes[:sample],
                            self.pq.num_quantizers,
                            self.packed_width,
                        )
                    )
                else:
                    codes = np.asarray(self.codes[:sample])
                distinct = np.unique(codes, axis=0).shape[0]
                self._auto_dup = sample / max(distinct, 1)
        return self._auto_dup

    def _has_cache(self) -> bool:
        """Either cache representation counts: the raw decoded matrix or
        the dense-kernel augmented operand it converts into on TPU."""
        return self.decoded_cache is not None or self._cache_aug is not None

    def _kernel_bounds_ok(self, k_eff: int) -> bool:
        return (
            self.size >= 256 * min(k_eff, 128)
            and k_eff <= 128
            and self.pq.num_clusters <= 1024
        )

    def _pallas_eligible(self, k_eff: int) -> bool:
        return (
            jax.default_backend() == "tpu"
            and not self.packed_width
            and self._kernel_bounds_ok(k_eff)
        )

    def _q_pad(self, q: jax.Array) -> jax.Array:
        from gulon_tpu.ops.pq import split_subspaces

        qs = split_subspaces(q, self.pq.bounds, self.pq.pad_width)
        return jnp.transpose(qs, (1, 0, 2)).reshape(
            q.shape[0], self.pq.num_quantizers * self.pq.pad_width
        )

    def enable_cache(self, dtype=None, chunk: int = 16384) -> None:
        """Materialize the decoded corpus for the ``"cached"`` strategy.

        bf16 on TPU (2 bytes/dim), f32 elsewhere (CPU lacks bf16 matmul).
        """
        if dtype is None:
            dtype = (
                jnp.bfloat16
                if jax.default_backend() == "tpu"
                else jnp.float32
            )
        m, dsub = self.pq.num_quantizers, self.pq.pad_width
        parts = []
        codes = np.asarray(self._unpacked_codes())
        for start in range(0, self.size, chunk):
            ci = jnp.asarray(codes[start : start + chunk], jnp.int32)
            # "auto": one-hot only while the [chunk, m, K] operand is sane
            dec = scan_ops.decode_tile(self.pq.codebooks, ci, "auto")
            parts.append(dec.astype(dtype))
        self.decoded_cache = (
            jnp.concatenate(parts, axis=0)
            if parts
            else jnp.zeros((0, m * dsub), dtype)
        )
        self._cache_aug = None  # dense-kernel operand rebuilds lazily

    def pack_memory(self) -> None:
        """Pack sub-byte codes in HBM (width 2/4 only): 2-4x less memory,
        unpacking fused into the scan. Only the "decode" strategy reads
        packed codes; lut/cached/pallas require unpacked (ValueError)."""
        width = self.pq.code_bits
        if self.packed_width:
            return
        if width > 4:
            raise ValueError(
                f"in-memory packing needs code width <= 4 bits, got {width}"
            )
        width = 4 if width > 2 else 2
        self.codes = scan_ops.pack_rows(self.codes, width)
        self.packed_width = width
        self.scan_strategy = "decode"

    def _unpacked_codes(self) -> jax.Array:
        if not self.packed_width:
            return self.codes
        return scan_ops.unpack_tile(
            self.codes, self.pq.num_quantizers, self.packed_width
        )

    def add(self, keys, vectors) -> "FlatIndex":
        """Return a new index with ``(keys, vectors)`` appended.

        New rows are encoded with the EXISTING codebooks (frozen-PQ add;
        see ``models/update.py``) and merged into the global key sort.
        Lazy serving layouts (kernel operand, decoded cache) rebuild on
        first query of the new index. An extra over the reference, which
        only builds indices whole (``BuildIndex.scala:110-121``).
        """
        from gulon_tpu.models import update as up

        keys_new, x = up.validate_add(keys, vectors, self.dimension)
        xd = jnp.asarray(x)
        if self.metric.normalized:
            xd = normalize_rows(xd)
        if self.rotation is not None:
            xd = jnp.matmul(
                xd, self.rotation, precision=jax.lax.Precision.HIGHEST
            )
        codes_new = self.pq.encode(xd)
        merged_keys, order = up.merge_sorted_order(
            self._key_index.keys, keys_new
        )
        codes = jnp.take(
            jnp.concatenate([self._unpacked_codes(), codes_new], axis=0),
            jnp.asarray(order),
            axis=0,
        )
        norms_new = self.pq.reconstruction_norms(codes_new)
        norms = jnp.take(
            jnp.concatenate([self.recon_norms, norms_new]),
            jnp.asarray(order),
        )
        return self._replace_rows(merged_keys, codes, norms)

    def remove(self, keys) -> "FlatIndex":
        """Return a new index without the given keys (all occurrences).

        Raises ``KeyError`` for keys not present and ``ValueError`` if the
        removal would empty the index. See :meth:`add`.
        """
        from gulon_tpu.models import update as up

        keep = up.removal_mask(self._key_index.keys, keys)
        keep_dev = jnp.asarray(np.flatnonzero(keep))
        return self._replace_rows(
            self._key_index.keys[keep],
            jnp.take(self._unpacked_codes(), keep_dev, axis=0),
            jnp.take(self.recon_norms, keep_dev),
        )

    def _replace_rows(
        self, keys: np.ndarray, codes: jax.Array, norms: jax.Array
    ) -> "FlatIndex":
        packed = self.packed_width
        if packed:
            codes = scan_ops.pack_rows(codes, packed)
        return dataclasses.replace(
            self,
            _key_index=SortedKeyIndex(keys),
            codes=codes,
            recon_norms=norms,
            decoded_cache=None,  # caches cover the old row set; re-call
            _cache_aug=None,     # enable_cache() on the new index if used
            _pallas_codes_t=None,
            _auto_rerank=None,   # degeneracy stat covers the old rows
            _auto_dup=None,
        )

    def lookup(self, word: str) -> Optional[np.ndarray]:
        row = self._key_index.lookup(word)
        if row is None:
            return None
        if self.packed_width:
            ci = scan_ops.unpack_tile(
                self.codes[row : row + 1],
                self.pq.num_quantizers,
                self.packed_width,
            )
            rec = self.pq.decode(ci)
        else:
            rec = self.pq.decode(self.codes[row : row + 1])
        if self.rotation is not None:
            # codes live in the rotated basis; map the reconstruction back
            rec = jnp.matmul(
                rec, self.rotation.T, precision=jax.lax.Precision.HIGHEST
            )
        return np.asarray(rec)[0]
