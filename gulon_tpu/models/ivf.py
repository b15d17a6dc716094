"""IVF-style coarse-partitioned residual PQ index.

Counterpart of the reference ``GroupedIndex`` (``Index.scala:231-308``):
vectors are grouped by nearest coarse centroid, PQ encodes the *residuals*,
and a query probes the partitions picked by a strategy:

- ``LimitGroups(count)``: probe the ``count`` nearest centroids
  (``Index.scala:287-288``);
- ``LimitVectors(count)``: probe centroids in ascending-distance order while
  the cumulative candidate count is below ``count`` (``Index.scala:289-298``).

TPU-native redesign of the scan: the reference rebuilds a fresh ADC LUT per
probed partition because the residual query ``q - c_g`` differs per partition
(``Index.scala:273-281``). Expanding the residual distance instead:

    ||(q - c_g) - r^||^2 = ||q||^2
                         + (||c_g||^2 - 2<q, c_g>)      # per (query, group)
                         + (||r^||^2 + 2<c_g, r^>)      # per row, build-time
                         - 2<q, r^>                     # ONE matmul, partition-free

so the whole probed scan is a single gather-decode + MXU matmul over row
tiles — the partition structure only contributes a per-row constant
(precomputed at build time), a per-(query, group) term (already computed when
ranking centroids), and a probe mask. Batched queries jointly cover most
partitions, so the masked full scan runs at flat-scan MXU throughput while
returning exactly the reference's probed-partition results.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from gulon_tpu.models.index import Index, Result
from gulon_tpu.models.keyindex import GroupedKeyIndex
from gulon_tpu.models.metric import Metric
from gulon_tpu.ops import scan as scan_ops
from gulon_tpu.ops.distance import normalize_rows, sq_norms
from gulon_tpu.ops.pq import ProductQuantizer, split_subspaces
from gulon_tpu.ops.topk import smallest_k


@dataclasses.dataclass(frozen=True)
class LimitGroups:
    """Probe the ``count`` nearest partitions (proto Strategy LIMIT_GROUPS=0)."""

    count: int
    proto_value = 0


@dataclasses.dataclass(frozen=True)
class LimitVectors:
    """Probe nearest partitions until >= ``count`` candidate vectors
    (proto Strategy LIMIT_VECTORS=2)."""

    count: int
    proto_value = 2


Strategy = Union[LimitGroups, LimitVectors]


@functools.partial(jax.jit, static_argnames=("count",))
def _probe_mask_limit_groups(cdist: jax.Array, count: int) -> jax.Array:
    """[Q, P] bool: True for the ``count`` nearest centroids per query."""
    num_q, num_p = cdist.shape
    count = min(count, num_p)
    _, idx = smallest_k(cdist, count)
    mask = jnp.zeros((num_q, num_p), jnp.bool_)
    rows = jnp.arange(num_q)[:, None]
    return mask.at[rows, idx].set(True)


@functools.partial(jax.jit, static_argnames=("count",))
def _probe_mask_limit_vectors(
    cdist: jax.Array, sizes: jax.Array, count: int
) -> jax.Array:
    """Probe in ascending-distance order while cumulative size < count.

    Matches the prefix rule at ``Index.scala:289-298`` (the partition that
    crosses the threshold is included).
    """
    num_q = cdist.shape[0]
    order = jnp.argsort(cdist, axis=1)
    sz = sizes[order].astype(jnp.int32)
    cum_before = jnp.cumsum(sz, axis=1) - sz
    include = cum_before < count
    mask = jnp.zeros(cdist.shape, jnp.bool_)
    rows = jnp.arange(num_q)[:, None]
    return mask.at[rows, order].set(include)


@functools.partial(
    jax.jit,
    static_argnames=(
        "bounds", "k", "tile_rows", "precision", "topk_impl", "recall_target"
    ),
)
def _ivf_scan(
    queries: jax.Array,  # [Q, D]
    codebooks: jax.Array,  # [m, K, dsub]
    codes: jax.Array,  # [N, m]
    row_const: jax.Array,  # [N] = ||r^||^2 + 2<c_g, r^> (+inf padding)
    group_ids: jax.Array,  # [N] int32
    group_term: jax.Array,  # [Q, P] = ||c_g||^2 - 2<q, c_g>
    probe_mask: jax.Array,  # [Q, P] bool
    *,
    bounds,
    k: int,
    tile_rows: int,
    precision: str = "default",
    topk_impl: str = "approx",
    recall_target: float = 0.95,
):
    num_q = queries.shape[0]
    m, _, dsub = codebooks.shape
    tile_rows = min(tile_rows, max(codes.shape[0], 1))

    qs = split_subspaces(queries, bounds, dsub)
    q_pad = jnp.transpose(qs, (1, 0, 2)).reshape(num_q, m * dsub)
    qn = sq_norms(queries)

    code_tiles = scan_ops._tile(codes, tile_rows)
    const_tiles = scan_ops._tile(row_const, tile_rows, pad_value=jnp.inf)
    gid_tiles = scan_ops._tile(group_ids, tile_rows)

    def dist_tile(inp):
        ct, rc, gid = inp
        ci = ct.astype(jnp.int32)
        dec = scan_ops.decode_tile(codebooks, ci, "auto", precision)
        ip = jnp.matmul(
            q_pad,
            dec.T,
            preferred_element_type=jnp.float32,
            precision=scan_ops.resolve_precision(precision),
        )
        gt = jnp.take(group_term, gid, axis=1)  # [Q, T]
        pm = jnp.take(probe_mask, gid, axis=1)  # [Q, T]
        d = qn[:, None] + rc[None, :] + gt - 2.0 * ip
        return jnp.where(pm, d, jnp.inf)

    return scan_ops._streaming_topk(
        dist_tile,
        code_tiles.shape[0],
        tile_rows,
        num_q,
        k,
        (code_tiles, const_tiles, gid_tiles),
        topk_impl=topk_impl,
        recall_target=recall_target,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_probe", "pmax", "k", "topk_impl", "recall_target"),
)
def _ivf_scan_gathered(
    queries: jax.Array,      # [Q, D] f32 (already normalized)
    recon: jax.Array,        # [N + pmax, D] bf16/f32, padded reconstruction
    recon_norms: jax.Array,  # [N + pmax] f32, +inf on padding
    starts: jax.Array,       # [P] i32 partition start rows
    sizes: jax.Array,        # [P] i32 partition sizes
    probe_ids: jax.Array,    # [Q, L] i32 partitions to probe; -1 = unused
    *,
    num_probe: int,
    pmax: int,
    k: int,
    topk_impl: str = "exact",
    recall_target: float = 0.95,
):
    """Sublinear probed scan: per query, L contiguous partition slices.

    Partitions are contiguous row ranges (rows grouped at build), so a
    probe is one ``dynamic_slice`` of the cached reconstruction — the
    per-query work is O(L * pmax) rows regardless of corpus size. The win
    over the masked full scan (``_ivf_scan``) is the latency/small-batch
    regime; for large batches whose probes jointly cover the corpus the
    masked scan reads everything once and stays preferable.
    """
    num_q, d = queries.shape
    qn = sq_norms(queries)
    row_iota = jnp.arange(pmax, dtype=jnp.int32)

    def per_query(qv, qn_v, pids):
        def per_slot(p):
            active = p >= 0  # LimitVectors probe sets vary per query
            p_safe = jnp.maximum(p, 0)
            s = starts[p_safe]
            block = jax.lax.dynamic_slice(recon, (s, 0), (pmax, d))
            bn = jax.lax.dynamic_slice(recon_norms, (s,), (pmax,))
            valid = active & (row_iota < sizes[p_safe])
            return block, jnp.where(valid, bn, jnp.inf), s + row_iota

        blocks, bns, ids = jax.vmap(per_slot)(pids)  # [L, pmax, ...]
        flat = blocks.reshape(num_probe * pmax, d)
        ip = jnp.matmul(
            flat, qv.astype(flat.dtype)[:, None],
            preferred_element_type=jnp.float32,
        )[:, 0]
        dist = qn_v + bns.reshape(-1) - 2.0 * ip
        if topk_impl == "approx" and num_probe * pmax >= 256 * k:
            vals, pos = jax.lax.approx_min_k(
                dist[None], k, recall_target=recall_target
            )
        else:
            vals, pos = smallest_k(dist[None], k)
        return vals[0], ids.reshape(-1)[pos[0]]

    dists, ids = jax.vmap(per_query)(queries, qn, probe_ids)
    ids = jnp.where(jnp.isinf(dists), -1, ids)
    return dists, ids


@dataclasses.dataclass
class IVFIndex(Index):
    _key_index: GroupedKeyIndex
    pq: ProductQuantizer  # trained on residuals
    codes: jax.Array  # [N, m] uint (grouped row order)
    row_const: jax.Array  # [N] f32 = ||r^||^2 + 2<c_g, r^>
    group_ids: jax.Array  # [N] int32, partition of each row
    centroids: jax.Array  # [P, D] f32 coarse centroids (empty groups dropped)
    metric: Metric
    strategy: Strategy
    tile_rows: int = scan_ops.DEFAULT_TILE_ROWS
    precision: str = "default"
    topk_impl: str = "approx"
    recall_target: float = 0.95
    # "masked" = single masked full scan (default; best for large batches);
    # "gathered" = per-query partition slices over a cached reconstruction
    # (sublinear in corpus size; best for latency / small batches)
    scan_strategy: str = "masked"
    recon_cache: Optional[jax.Array] = None  # [N + pmax, D], see enable_cache
    recon_norms_cache: Optional[jax.Array] = None  # [N + pmax] f32

    @property
    def key_index(self) -> GroupedKeyIndex:
        return self._key_index

    @property
    def dimension(self) -> int:
        return self.pq.dimension

    @property
    def size(self) -> int:
        return int(self.codes.shape[0])

    @property
    def num_partitions(self) -> int:
        return int(self.centroids.shape[0])

    def partition_sizes(self) -> np.ndarray:
        offsets = self._key_index.group_offsets
        bounds = np.concatenate([[0], offsets, [self.size]])
        return np.diff(bounds).astype(np.int32)

    def batch_query(self, k: int, vectors) -> List[Result]:
        return self._make_results(*self.query_arrays(k, vectors))

    def query_arrays(self, k: int, vectors):
        q = jnp.asarray(vectors, jnp.float32)
        if q.ndim != 2 or q.shape[1] != self.dimension:
            raise ValueError(
                f"queries must be [Q, {self.dimension}], got {q.shape}"
            )
        if self.metric.normalized:
            q = normalize_rows(q)  # Index.scala:268-269

        # Rank coarse centroids: exactNearestNeighbours over centroids
        # (Index.scala:285-299), batched as one matmul.
        cn = sq_norms(self.centroids)
        qc_ip = jnp.matmul(
            q,
            self.centroids.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        group_term = cn[None, :] - 2.0 * qc_ip  # [Q, P]
        qn = sq_norms(q)
        cdist = group_term + qn[:, None]

        if isinstance(self.strategy, LimitGroups):
            probe_mask = _probe_mask_limit_groups(cdist, self.strategy.count)
        elif isinstance(self.strategy, LimitVectors):
            sizes = jnp.asarray(self.partition_sizes())
            probe_mask = _probe_mask_limit_vectors(
                cdist, sizes, self.strategy.count
            )
        else:
            raise ValueError(f"unknown strategy {self.strategy!r}")

        k_eff = min(k, self.size)
        if self.scan_strategy == "gathered":
            if self.recon_cache is None:
                self.enable_cache()
            sizes_np = self.partition_sizes()
            pmax = int(sizes_np.max())
            if isinstance(self.strategy, LimitGroups):
                num_probe = min(self.strategy.count, self.num_partitions)
            else:
                # LimitVectors: probe the mask's max set size. num_probe is
                # a static jit argument, so round up to the next power of
                # two — probe counts vary per batch and unbucketed values
                # would recompile the scan on every new maximum.
                raw = int(np.asarray(probe_mask.sum(axis=1)).max())
                num_probe = 1
                while num_probe < raw:
                    num_probe *= 2
                num_probe = min(num_probe, self.num_partitions)
            # the num_probe nearest centroids, best first; queries with
            # smaller probe sets (LimitVectors) mark unused slots -1
            masked_cdist = jnp.where(probe_mask, cdist, jnp.inf)
            probe_d, probe_ids = smallest_k(masked_cdist, num_probe)
            probe_ids = jnp.where(
                jnp.isinf(probe_d), -1, probe_ids
            ).astype(jnp.int32)
            starts = np.concatenate(
                [[0], np.cumsum(sizes_np)[:-1]]
            ).astype(np.int32)
            # the gathered candidate pool holds num_probe*pmax rows
            k_g = min(k_eff, num_probe * pmax)
            dists, ids = _ivf_scan_gathered(
                q,
                self.recon_cache,
                self.recon_norms_cache,
                jnp.asarray(starts),
                jnp.asarray(sizes_np),
                probe_ids,
                num_probe=num_probe,
                pmax=pmax,
                k=k_g,
                topk_impl=self.topk_impl,
                recall_target=self.recall_target,
            )
            if k_g < k_eff:  # pad to the requested width (inf/-1 slots)
                pad = k_eff - k_g
                dists = jnp.pad(dists, ((0, 0), (0, pad)),
                                constant_values=jnp.inf)
                ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
            return dists, ids
        if self.scan_strategy != "masked":
            raise ValueError(
                f"unknown ivf scan strategy {self.scan_strategy!r}"
            )
        dists, ids = _ivf_scan(
            q,
            self.pq.codebooks,
            self.codes,
            self.row_const,
            self.group_ids,
            group_term,
            probe_mask,
            bounds=self.pq.bounds,
            k=k_eff,
            tile_rows=self.tile_rows,
            precision=self.precision,
            topk_impl=self.topk_impl,
            recall_target=self.recall_target,
        )
        return dists, ids

    def enable_cache(self, dtype=None, chunk: int = 1 << 20) -> None:
        """Materialize the full reconstruction (residual decode + centroid)
        for the ``"gathered"`` strategy. bf16 on TPU, f32 elsewhere. The
        buffer is padded by one max-partition so probe slices never clamp.
        """
        if dtype is None:
            dtype = (
                jnp.bfloat16
                if jax.default_backend() == "tpu"
                else jnp.float32
            )
        sizes = self.partition_sizes()
        pmax = int(sizes.max()) if len(sizes) else 1
        gids = np.asarray(self.group_ids)
        cents = np.asarray(self.centroids)
        codes = np.asarray(self.codes)
        parts = []
        norms = []
        for start in range(0, self.size, chunk):
            sl = slice(start, min(start + chunk, self.size))
            dec = np.asarray(self.pq.decode(jnp.asarray(codes[sl])))
            rec = dec + cents[gids[sl]]
            norms.append((rec.astype(np.float64) ** 2).sum(1).astype(np.float32))
            parts.append(rec.astype(np.float32))
        rec_full = (
            np.concatenate(parts, axis=0)
            if parts
            else np.zeros((0, self.dimension), np.float32)
        )
        pad = np.zeros((pmax, self.dimension), np.float32)
        self.recon_cache = jnp.asarray(
            np.concatenate([rec_full, pad], axis=0)
        ).astype(dtype)
        norms_full = (
            np.concatenate(norms) if norms else np.zeros(0, np.float32)
        )
        self.recon_norms_cache = jnp.asarray(
            np.concatenate([norms_full, np.full(pmax, np.inf, np.float32)])
        )

    def lookup(self, word: str) -> Optional[np.ndarray]:
        """Decode residual + add partition centroid (``Index.scala:247-254``)."""
        row = self._key_index.lookup(word)
        if row is None:
            return None
        g = self._key_index.group_of(row)
        residual = np.asarray(self.pq.decode(self.codes[row : row + 1]))[0]
        return residual + np.asarray(self.centroids[g])
