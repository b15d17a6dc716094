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


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_probe", "pmax", "qcap", "k", "part_chunk",
        "topk_impl", "recall_target",
    ),
)
def _ivf_scan_bucketed(
    queries: jax.Array,      # [Q, D] f32 (already normalized)
    recon: jax.Array,        # [N + pmax, D] bf16/f32, padded reconstruction
    recon_norms: jax.Array,  # [N + pmax] f32, +inf on padding
    starts: jax.Array,       # [P] i32 partition start rows
    sizes: jax.Array,        # [P] i32 partition sizes
    probe_ids: jax.Array,    # [Q, L] i32 partitions to probe; -1 = unused
    *,
    num_probe: int,
    pmax: int,
    qcap: int,
    k: int,
    part_chunk: int = 64,
    topk_impl: str = "exact",
    recall_target: float = 0.95,
):
    """Partition-centric probed scan: queries grouped BY partition.

    The gathered scan (`_ivf_scan_gathered`) duplicates partition reads per
    probing query; here the (query, probe) pairs are inverted into
    per-partition query buckets, so every probed partition is read once per
    batch and scanned against all its queries in one MXU matmul — the
    FAISS-GPU-style schedule, expressed with static shapes:

      pairs sorted by partition -> rank within partition -> scatter into a
      [P, qcap] bucket matrix -> chunked scan over partitions ->
      candidates regrouped per query -> final exact top-k.

    ``qcap`` caps queries per partition per batch; overflow pairs (beyond
    qcap, counted in the returned overflow scalar) are dropped — size qcap
    at ~4x the mean pairs/partition to make overflow negligible.

    Returns ([Q, k] dists asc, [Q, k] global ids, overflow count).
    """
    num_q, d = queries.shape
    num_parts = starts.shape[0]
    qn = sq_norms(queries)

    # --- schedule: invert (query, probe-slot) pairs to partition buckets ---
    ql = num_q * num_probe
    q_of_pair = jnp.repeat(jnp.arange(num_q, dtype=jnp.int32), num_probe)
    p_of_pair = probe_ids.reshape(-1)
    order = jnp.argsort(p_of_pair, stable=True)
    p_s = p_of_pair[order]
    q_s = q_of_pair[order]
    first_occ = jnp.searchsorted(p_s, p_s, side="left")
    rank = jnp.arange(ql, dtype=jnp.int32) - first_occ.astype(jnp.int32)
    valid_pair = (p_s >= 0) & (rank < qcap)
    overflow = jnp.sum((p_s >= 0) & (rank >= qcap))

    # bucket matrix [P, qcap]: query id probing partition p at slot r
    buckets = jnp.full((num_parts, qcap), -1, jnp.int32)
    scat_p = jnp.where(valid_pair, p_s, num_parts)  # OOB -> dropped
    scat_r = jnp.where(valid_pair, rank, qcap)
    buckets = buckets.at[scat_p, scat_r].set(q_s, mode="drop")

    # --- chunked partition-centric scan ---
    n_pad_parts = (-num_parts) % part_chunk
    starts_p = jnp.pad(starts, (0, n_pad_parts))
    sizes_p = jnp.pad(sizes, (0, n_pad_parts))
    buckets_p = jnp.pad(
        buckets, ((0, n_pad_parts), (0, 0)), constant_values=-1
    )
    n_chunks = buckets_p.shape[0] // part_chunk
    row_iota = jnp.arange(pmax, dtype=jnp.int32)
    q_safe = jnp.concatenate(
        [queries, jnp.zeros((1, d), queries.dtype)], axis=0
    )
    qn_safe = jnp.concatenate([qn, jnp.zeros((1,), qn.dtype)])

    def scan_chunk(carry, inp):
        st_c, sz_c, bk_c = inp  # [C], [C], [C, qcap]

        def one_partition(st, sz, bucket):
            block = jax.lax.dynamic_slice(recon, (st, 0), (pmax, d))
            bn = jax.lax.dynamic_slice(recon_norms, (st,), (pmax,))
            qidx = jnp.where(bucket >= 0, bucket, num_q)  # safe gather
            qb = q_safe[qidx]  # [qcap, D]
            ip = jnp.matmul(
                qb.astype(block.dtype),
                block.T,
                preferred_element_type=jnp.float32,
            )  # [qcap, pmax]
            dist = qn_safe[qidx][:, None] + bn[None, :] - 2.0 * ip
            col_ok = row_iota[None, :] < sz
            row_ok = (bucket >= 0)[:, None]
            dist = jnp.where(col_ok & row_ok, dist, jnp.inf)
            kk_p = min(k, pmax)
            if topk_impl == "approx" and pmax >= 256:
                kv, kp = jax.lax.approx_min_k(
                    dist, kk_p, recall_target=recall_target
                )
                kp = kp.astype(jnp.int32)
            else:
                kv, kp = smallest_k(dist, kk_p)
            return kv, st + kp  # global ids

        kv, ki = jax.vmap(one_partition)(st_c, sz_c, bk_c)
        return carry, (kv, ki)

    st_c = starts_p.reshape(n_chunks, part_chunk)
    sz_c = sizes_p.reshape(n_chunks, part_chunk)
    bk_c = buckets_p.reshape(n_chunks, part_chunk, qcap)
    _, (all_v, all_i) = jax.lax.scan(scan_chunk, None, (st_c, sz_c, bk_c))
    kk = min(k, pmax)
    # [n_chunks, C, qcap, kk] -> flat bucket-slot candidates
    cand_v = all_v.reshape(num_parts + n_pad_parts, qcap, kk)
    cand_i = all_i.reshape(num_parts + n_pad_parts, qcap, kk)

    # --- regroup candidates per query ---
    inv_order = jnp.argsort(order)  # original pair -> sorted position
    slot_flat = jnp.where(
        valid_pair, p_s * qcap + rank, num_parts * qcap
    )  # invalid -> OOB sentinel
    pair_slots = slot_flat[inv_order].reshape(num_q, num_probe)
    cv_flat = jnp.concatenate(
        [
            cand_v.reshape(-1, kk),
            jnp.full((1, kk), jnp.inf, jnp.float32),
        ]
    )
    ci_flat = jnp.concatenate(
        [cand_i.reshape(-1, kk), jnp.full((1, kk), -1, jnp.int32)]
    )
    safe_slots = jnp.where(
        pair_slots >= (num_parts + n_pad_parts) * qcap,
        cv_flat.shape[0] - 1,
        pair_slots,
    )
    per_q_v = cv_flat[safe_slots].reshape(num_q, num_probe * kk)
    per_q_i = ci_flat[safe_slots].reshape(num_q, num_probe * kk)
    kf = min(k, num_probe * kk)
    best_d, pos = smallest_k(per_q_v, kf)
    best_i = jnp.take_along_axis(per_q_i, pos, axis=1)
    if kf < k:
        best_d = jnp.pad(
            best_d, ((0, 0), (0, k - kf)), constant_values=jnp.inf
        )
        best_i = jnp.pad(best_i, ((0, 0), (0, k - kf)), constant_values=-1)
    best_i = jnp.where(jnp.isinf(best_d), -1, best_i)
    return best_d, best_i, overflow


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
    # (sublinear in corpus size; best for latency / small batches);
    # "bucketed" = partition-centric schedule: every probed partition read
    # once per batch and matmul'd against all its probing queries — the
    # large-batch sublinear path (overflowed pairs counted in
    # self.last_overflow; near-exact at the default qcap)
    scan_strategy: str = "masked"
    last_overflow: int = 0
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
        if self.scan_strategy in ("gathered", "bucketed"):
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
            if self.scan_strategy == "bucketed":
                num_q = int(q.shape[0])
                mean_pairs = max(
                    1, (num_q * num_probe) // max(self.num_partitions, 1)
                )
                qcap = min(max(8, 4 * mean_pairs), num_q)
                qcap = -(-qcap // 8) * 8  # sublane multiple
                dists, ids, overflow = _ivf_scan_bucketed(
                    q,
                    self.recon_cache,
                    self.recon_norms_cache,
                    jnp.asarray(starts),
                    jnp.asarray(sizes_np),
                    probe_ids,
                    num_probe=num_probe,
                    pmax=pmax,
                    qcap=qcap,
                    k=k_g,
                    topk_impl=self.topk_impl,
                    recall_target=self.recall_target,
                )
                self.last_overflow = int(overflow)
            else:
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
                f"unknown ivf scan strategy {self.scan_strategy!r} "
                "(expected masked|gathered|bucketed)"
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
