"""Mesh-sharded index wrappers: serve indices bigger than one chip's HBM.

The reference never distributes queries (single JVM process; SURVEY §2.3).
These classes are the scale-out path of the rebuild: the code matrix (and
IVF row metadata) shards row-wise across a ``Mesh``; queries and codebooks
replicate; every ``batch_query`` is one SPMD launch whose only cross-device
traffic is the O(Q·k·shards) all-gather top-k merge over ICI.

Results are identical to the single-chip classes (same math, same ids), so
``shard_index`` is a pure placement transform.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gulon_tpu.models.exact import ExactIndex
from gulon_tpu.models.flat import FlatIndex
from gulon_tpu.models.index import Index, Result
from gulon_tpu.models.ivf import (
    IVFIndex,
    LimitGroups,
    LimitVectors,
    _probe_mask_limit_groups,
    _probe_mask_limit_vectors,
)
from gulon_tpu.ops import scan as scan_ops
from gulon_tpu.ops.distance import normalize_rows, sq_norms
from gulon_tpu.ops.pq import split_subspaces
from gulon_tpu.parallel import ops as pops
from gulon_tpu.parallel.mesh import (
    ROWS,
    pad_rows_to_shards,
    place_global,
    replicate,
    shard_rows,
)


def _global_queries(q: jax.Array, mesh: Mesh) -> jax.Array:
    """Replicate a prepared query batch across the mesh for SPMD entry.

    Single-process this is a no-op (jit replicates uncommitted arrays
    itself). Multi-process, every jit argument must be a GLOBAL array:
    each process holds the same query batch (the multi-host serving
    contract) and contributes its addressable replicas via
    ``parallel.mesh.replicate``.
    """
    if jax.process_count() == 1:
        return q
    return replicate(np.asarray(q), mesh)


@dataclasses.dataclass
class ShardedFlatIndex(Index):
    """Row-sharded counterpart of :class:`FlatIndex` (same query results).

    When the base index has a decoded cache (``enable_cache``), it is
    sharded too and ``scan_strategy="cached"`` on the base selects the
    pure-matmul sharded scan.
    """

    base: FlatIndex
    mesh: Mesh
    codes_sharded: jax.Array  # [N', m] padded + row-sharded
    norms_sharded: jax.Array  # [N'] padded with +inf, row-sharded
    codebooks_rep: jax.Array  # [m, K, dsub] replicated
    cache_sharded: Optional[jax.Array] = None  # [N', m*dsub] row-sharded
    # pretransposed minimal-width kernel operand [m, N'], sharded on dim 1
    # (built on TPU at shard time, like FlatIndex._pallas_codes_t): the
    # fused per-shard scan reads it directly instead of relaying out
    # [n_loc, m] -> [m, n_loc] i32 every query batch
    codes_t_sharded: Optional[jax.Array] = None
    # lazy [N', Dp] bf16 dense-kernel operand over the sharded cache
    # (built from cache_sharded on first dense cached query)
    cache_aug_sharded: Optional[jax.Array] = None
    # cached-strategy scan: None = auto (fused dense kernel per shard on
    # TPU within its envelope, XLA tile scan otherwise); True/False force
    dense_cached: Optional[bool] = None

    @staticmethod
    def shard(index: FlatIndex, mesh: Mesh) -> "ShardedFlatIndex":
        # the sharded scan reads logical [N, m] codes; in-memory packing
        # (pack_memory) is a single-chip layout, so unpack when sharding
        codes = (
            index._unpacked_codes() if index.packed_width else index.codes
        )
        codes_np = np.asarray(codes)
        if index.decoded_cache is None and index._cache_aug is not None:
            # the single-chip dense route converted the cache into its
            # augmented operand; rebuild the raw decode for sharding
            index.enable_cache()
        codes_t_sharded = None
        if jax.default_backend() == "tpu":
            from jax.sharding import NamedSharding
            from gulon_tpu.ops.pallas.adc import pack_codes_t

            padded, _ = pad_rows_to_shards(codes_np, mesh, 0)
            codes_t_sharded = jax.device_put(
                pack_codes_t(padded, index.pq.num_clusters),
                NamedSharding(mesh, P(None, ROWS)),
            )
        return ShardedFlatIndex(
            base=index,
            mesh=mesh,
            codes_sharded=shard_rows(codes_np, mesh, 0),
            norms_sharded=shard_rows(
                np.asarray(index.recon_norms), mesh, np.inf
            ),
            codebooks_rep=replicate(np.asarray(index.pq.codebooks), mesh),
            cache_sharded=(
                shard_rows(np.asarray(index.decoded_cache), mesh, 0)
                if index.decoded_cache is not None
                else None
            ),
            codes_t_sharded=codes_t_sharded,
        )

    @property
    def key_index(self):
        return self.base.key_index

    @property
    def dimension(self) -> int:
        return self.base.dimension

    @property
    def size(self) -> int:
        return self.base.size

    @property
    def metric(self):
        return self.base.metric

    def add(self, keys, vectors):
        """Functional update: add to the base index, re-shard on the same
        mesh (``models/update.py``; layouts/shardings rebuild)."""
        return shard_index(self.base.add(keys, vectors), self.mesh)

    def remove(self, keys):
        """Functional update: remove from the base index, re-shard."""
        return shard_index(self.base.remove(keys), self.mesh)

    def batch_query(self, k: int, vectors) -> List[Result]:
        return self._make_results(*self.query_arrays(k, vectors))

    def query_arrays(self, k: int, vectors):
        q = _global_queries(
            self.base._prepare_queries(vectors), self.mesh
        )
        k_eff = min(k, self.size)
        if self.base.scan_strategy == "cached":
            if self.cache_sharded is None:
                raise ValueError(
                    "sharded cached strategy needs enable_cache() before "
                    "shard_index()"
                )
            local_n = self.cache_sharded.shape[0] // self.mesh.shape[ROWS]
            use_dense = (
                self.dense_cached
                if self.dense_cached is not None
                else (
                    jax.default_backend() == "tpu"
                    and self.base.topk_impl != "exact"  # block-min
                    # granularity; "exact" keeps the every-row XLA rank
                    and k_eff <= 128
                    and local_n >= 256 * k_eff
                )
            )
            if use_dense:
                # per-shard fused dense kernel; its internal over-fetch
                # rescore (bf16-operand re-rank) plays the rerank_factor
                # role within each shard, so distances stay in the bf16
                # class here (the single-chip path's exact-f32 rescore
                # needs the global code matrix)
                return pops.sharded_dense_scan(
                    self.base._q_pad(q),
                    self._dense_cache_operand(),
                    self.norms_sharded,
                    mesh=self.mesh,
                    k=k_eff,
                    rescore=max(self.base.resolved_rerank_factor(), 4),
                )
            q_pad = self.base._q_pad(q).astype(self.cache_sharded.dtype)
            return pops.sharded_exact_scan(
                q_pad,
                self.cache_sharded,
                self.norms_sharded,
                mesh=self.mesh,
                k=k_eff,
                tile_rows=self.base.tile_rows,
                precision="default",
                topk_impl=self.base.topk_impl,
                recall_target=self.base.recall_target,
            )
        # mirror the single-chip kernel knobs (models/flat.py:146-151):
        # block-winner count and the rerank over-fetch, clamped to the
        # per-shard kernel envelope
        rerank_k = 0
        rerank = self.base.resolved_rerank_factor()
        if rerank > 1:
            local_n = self.codes_sharded.shape[0] // self.mesh.shape[ROWS]
            rerank_k = min(
                local_n,
                k_eff * rerank,
                128,
                max(k_eff, local_n // 256),
            )
            if rerank_k <= k_eff:
                rerank_k = 0
        dists, ids = pops.sharded_adc_scan(
            q,
            self.codebooks_rep,
            self.codes_sharded,
            self.norms_sharded,
            self.codes_t_sharded,
            mesh=self.mesh,
            bounds=self.base.pq.bounds,
            k=k_eff,
            tile_rows=self.base.tile_rows,
            precision=self.base.precision,
            topk_impl=self.base.topk_impl,
            recall_target=self.base.recall_target,
            winners=self.base.resolved_pallas_winners(),
            rerank_k=rerank_k,
        )
        return dists, ids

    def _dense_cache_operand(self) -> jax.Array:
        """[N', Dp] bf16 dense-kernel operand over the sharded cache.

        Built device-side from ``cache_sharded`` (sharding preserved);
        the +inf norm padding becomes ~_BIG — finite, so the kernel's
        lane-packed float min never sees a NaN — while still losing
        every block.
        """
        if self.cache_aug_sharded is None:
            from jax.sharding import NamedSharding

            from gulon_tpu.models.flat import _augment_cache
            from gulon_tpu.ops.pallas.dense import _BIG

            norms_fin = jnp.where(
                jnp.isinf(self.norms_sharded),
                jnp.float32(_BIG),
                self.norms_sharded,
            )
            self.cache_aug_sharded = jax.device_put(
                _augment_cache(self.cache_sharded, norms_fin),
                NamedSharding(self.mesh, P(ROWS, None)),
            )
        return self.cache_aug_sharded

    def lookup(self, word: str) -> Optional[np.ndarray]:
        return self.base.lookup(word)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "bounds", "k", "tile_rows", "precision",
        "topk_impl", "recall_target",
    ),
)
def _sharded_ivf_scan(
    queries: jax.Array,  # [Q, D] replicated
    codebooks: jax.Array,  # [m, K, dsub] replicated
    codes: jax.Array,  # [S, n_loc, m] partition-aware row layout
    row_const: jax.Array,  # [S, n_loc] (+inf padding)
    group_ids: jax.Array,  # [S, n_loc]
    loc2glob: jax.Array,  # [S, n_loc] i32 local row -> original row id
    group_term: jax.Array,  # [Q, P] replicated
    probe_mask: jax.Array,  # [Q, P] replicated
    *,
    mesh: Mesh,
    bounds,
    k: int,
    tile_rows: int,
    precision: str = "default",
    topk_impl: str = "approx",
    recall_target: float = 0.95,
):
    from gulon_tpu.models.ivf import _ivf_scan

    def shard_fn(q, cb, codes_loc, rc_loc, gid_loc, l2g, gt, pm):
        # the single-chip masked scan runs per shard (jit-in-shard_map
        # inlines); only the id globalization + ICI merge are added here
        d, ids = _ivf_scan(
            q, cb, codes_loc[0], rc_loc[0], gid_loc[0], gt, pm,
            bounds=bounds, k=k, tile_rows=tile_rows,
            precision=precision, topk_impl=topk_impl,
            recall_target=recall_target,
        )
        gids = jnp.where(ids >= 0, l2g[0][jnp.maximum(ids, 0)], -1)
        return pops._merge_over_rows(d, gids, k)

    return pops.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(), P(), P(ROWS, None, None), P(ROWS, None), P(ROWS, None),
            P(ROWS, None), P(), P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )(
        queries, codebooks, codes, row_const, group_ids, loc2glob,
        group_term, probe_mask,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "bounds", "k", "num_rows", "topk_impl", "recall_target",
        "interpret", "winners", "rescore",
    ),
)
def _sharded_ivf_pallas(
    queries: jax.Array,      # [Q, D] replicated
    qn: jax.Array,           # [Q] replicated
    codebooks: jax.Array,    # [m, K, dsub] replicated
    codes_palT: jax.Array,   # [S, m, npad] per-shard partition-padded
    rc_pal: jax.Array,       # [S, npad] (sentinel > _INVALID_MIN padding)
    row_map: jax.Array,      # [S, npad] i32 padded row -> GLOBAL row (-1)
    col_part: jax.Array,     # [S, NW] i32 winner column -> GLOBAL part id
    group_term: jax.Array,   # [Q, P] replicated
    probe_mask: jax.Array,   # [Q, P] replicated
    *,
    mesh: Mesh,
    bounds,
    k: int,
    num_rows: int,
    topk_impl: str,
    recall_target: float,
    interpret: bool,
    winners: int,
    rescore: int = 0,
):
    """Per-shard fused-kernel IVF scan + ICI top-k merge.

    Each shard runs the partition-padded block-min kernel over its local
    rows; the block-constant group term / probe mask apply to the local
    winners via the shard's static column->partition map, then local
    top-k results (already carrying global row ids) merge with one
    all-gather. ``rescore > 0`` re-ranks each shard's over-fetched
    winners with exact f32 ADC distances before the merge (the sharded
    counterpart of ``IVFIndex.pallas_rescore`` — exact local values make
    the merged global top-k exact too).
    """
    from gulon_tpu.ops.pallas.adc import _INVALID_MIN, adc_block_scan_pallas
    from gulon_tpu.ops.topk import smallest_k as _sk

    def shard_fn(q, qn_, cb, ct, rc, rmap, colp, gt, pm):
        bv, bi = adc_block_scan_pallas(
            q, cb, ct[0], rc[0],
            bounds=bounds, num_rows=num_rows, winners=winners,
            interpret=interpret,
        )
        gtw = jnp.take(gt, colp[0], axis=1)
        pmw = jnp.take(pm, colp[0], axis=1)
        valid = (bv < _INVALID_MIN) & pmw
        d = jnp.where(valid, bv + gtw + qn_[:, None], jnp.inf)
        kk = min(k, d.shape[1])
        fetch = min(rescore * kk, d.shape[1]) if rescore else kk
        best, pos = _sk(d, fetch)
        rows = jnp.take_along_axis(bi, pos, axis=1)
        if rescore:
            best, rows = scan_ops.ivf_block_rescore(
                q, qn_, cb, ct[0], rc[0],
                best, rows, jnp.take_along_axis(gtw, pos, axis=1),
                bounds=bounds, k=kk,
            )
        gids = jnp.where(
            jnp.isinf(best), -1, rmap[0][jnp.maximum(rows, 0)]
        )
        if kk < k:
            best = jnp.pad(
                best, ((0, 0), (0, k - kk)), constant_values=jnp.inf
            )
            gids = jnp.pad(
                gids, ((0, 0), (0, k - kk)), constant_values=-1
            )
        return pops._merge_over_rows(best, gids, k)

    return pops.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(ROWS, None, None), P(ROWS, None),
            P(ROWS, None), P(ROWS, None), P(), P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )(
        queries, qn, codebooks, codes_palT, rc_pal, row_map, col_part,
        group_term, probe_mask,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "bounds", "k", "rcap", "qcap", "kk", "chunk",
        "precision", "topk_impl", "recall_target",
    ),
)
def _sharded_ivf_bucketed(
    q_sub: jax.Array,  # [Q, m*dsub] replicated (subspace layout)
    qn: jax.Array,  # [Q] replicated
    group_term: jax.Array,  # [Q, P] replicated
    codebooks: jax.Array,  # [m, K, dsub] replicated
    codes: jax.Array,  # [S, n_loc, m] partition-aware layout (slice-padded)
    row_const: jax.Array,  # [S, n_loc] (+inf padding)
    loc2glob: jax.Array,  # [S, n_loc] i32
    e_start: jax.Array,  # [S, E] per-shard schedules (common static shapes)
    e_size: jax.Array,  # [S, E]
    e_part: jax.Array,  # [S, E] GLOBAL partition ids
    e_bucket: jax.Array,  # [S, E, qcap]
    pair_slots: jax.Array,  # [S, Q, W]
    *,
    mesh: Mesh,
    bounds,
    k: int,
    rcap: int,
    qcap: int,
    kk: int,
    chunk: int,
    precision: str = "default",
    topk_impl: str = "approx",
    recall_target: float = 0.95,
):
    """Per-shard exact bucketed entry scan + ICI top-k merge.

    Each (query, partition) probe pair lives on exactly one shard (whole
    partitions per shard), so per-shard regrouped results are disjoint;
    the all-gather merge is the functional ``TopKHeap.merge`` across
    shards. Code-resident: probed row chunks decode in-flight.
    """
    from gulon_tpu.models.ivf import _regroup_pairs, _scan_entries_codes

    def shard_fn(qs, qn_, gt, cb, codes_loc, rc_loc, l2g,
                 es, esz, ep, eb, psl):
        cand_v, cand_i = _scan_entries_codes(
            qs, qn_, gt, cb, codes_loc[0], rc_loc[0],
            es[0], esz[0], ep[0], eb[0],
            rcap=rcap, qcap=qcap, kk=kk, chunk=chunk,
            precision=precision, topk_impl=topk_impl,
            recall_target=recall_target,
        )
        d, ids = _regroup_pairs(cand_v, cand_i, psl[0], k=k)
        gids = jnp.where(ids >= 0, l2g[0][jnp.maximum(ids, 0)], -1)
        return pops._merge_over_rows(d, gids, k)

    return pops.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(),
            P(ROWS, None, None), P(ROWS, None), P(ROWS, None),
            P(ROWS, None), P(ROWS, None), P(ROWS, None),
            P(ROWS, None, None), P(ROWS, None, None),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )(
        q_sub, qn, group_term, codebooks, codes, row_const, loc2glob,
        e_start, e_size, e_part, e_bucket, pair_slots,
    )


@dataclasses.dataclass
class ShardedIVFIndex(Index):
    """Partition-aware sharded counterpart of :class:`IVFIndex`.

    Whole partitions are placed per shard (greedy size balancing), so both
    the masked full scan and the sublinear ``"bucketed"`` entry scan run
    shard-locally with one all-gather top-k merge over ICI. Query results
    match the single-chip class.
    """

    base: IVFIndex
    mesh: Mesh
    codes_sharded: jax.Array  # [S, n_loc, m]
    row_const_sharded: jax.Array  # [S, n_loc]
    group_ids_sharded: jax.Array  # [S, n_loc]
    loc2glob_sharded: jax.Array  # [S, n_loc]
    codebooks_rep: jax.Array
    centroids_rep: jax.Array
    part_shard: np.ndarray  # [P] shard owning each partition
    local_starts: np.ndarray  # [P] start row of partition p on its shard
    # lazy per-shard partition-padded kernel layout:
    # (codes_palT [S, m, npad], rc_pal [S, npad], row_map [S, npad],
    #  blk_gpid host [S, NB], npad)
    _pallas_sh: Optional[tuple] = None
    _colpart_cache: dict = dataclasses.field(default_factory=dict)

    @staticmethod
    def shard(index: IVFIndex, mesh: Mesh) -> "ShardedIVFIndex":
        from jax.sharding import NamedSharding

        sizes = index.partition_sizes().astype(np.int64)
        num_p = len(sizes)
        n_shards = mesh.shape[ROWS]
        # greedy balance: biggest partitions first onto the lightest shard
        order = np.argsort(-sizes, kind="stable")
        part_shard = np.zeros(num_p, np.int32)
        local_starts = np.zeros(num_p, np.int64)
        load = np.zeros(n_shards, np.int64)
        for p in order:
            s = int(np.argmin(load))
            part_shard[p] = s
            local_starts[p] = load[s]
            load[s] += sizes[p]
        pad_rows = max(int(sizes.max()) if num_p else 1, 512)
        n_loc = int(load.max()) + pad_rows

        g_starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        codes_np = np.asarray(index.codes)
        rc_np = np.asarray(index.row_const)
        m = codes_np.shape[1]
        codes_s = np.zeros((n_shards, n_loc, m), codes_np.dtype)
        rc_s = np.full((n_shards, n_loc), np.inf, np.float32)
        gid_s = np.zeros((n_shards, n_loc), np.int32)
        l2g_s = np.full((n_shards, n_loc), -1, np.int32)
        for p in range(num_p):
            s, ls, gs, sz = (
                int(part_shard[p]), int(local_starts[p]),
                int(g_starts[p]), int(sizes[p]),
            )
            codes_s[s, ls : ls + sz] = codes_np[gs : gs + sz]
            rc_s[s, ls : ls + sz] = rc_np[gs : gs + sz]
            gid_s[s, ls : ls + sz] = p
            l2g_s[s, ls : ls + sz] = np.arange(gs, gs + sz, dtype=np.int32)

        row_sh = NamedSharding(mesh, P(ROWS, None, None))
        row_sh2 = NamedSharding(mesh, P(ROWS, None))
        return ShardedIVFIndex(
            base=index,
            mesh=mesh,
            codes_sharded=place_global(codes_s, row_sh),
            row_const_sharded=place_global(rc_s, row_sh2),
            group_ids_sharded=place_global(gid_s, row_sh2),
            loc2glob_sharded=place_global(l2g_s, row_sh2),
            codebooks_rep=replicate(np.asarray(index.pq.codebooks), mesh),
            centroids_rep=replicate(np.asarray(index.centroids), mesh),
            part_shard=part_shard,
            local_starts=local_starts,
        )

    @property
    def key_index(self):
        return self.base.key_index

    @property
    def dimension(self) -> int:
        return self.base.dimension

    @property
    def size(self) -> int:
        return self.base.size

    @property
    def metric(self):
        return self.base.metric

    def add(self, keys, vectors):
        """Functional update: add to the base index, re-shard on the same
        mesh (``models/update.py``; layouts/shardings rebuild)."""
        return shard_index(self.base.add(keys, vectors), self.mesh)

    def remove(self, keys):
        """Functional update: remove from the base index, re-shard."""
        return shard_index(self.base.remove(keys), self.mesh)

    def batch_query(self, k: int, vectors) -> List[Result]:
        return self._make_results(*self.query_arrays(k, vectors))

    def query_arrays(self, k: int, vectors):
        # normalize + OPQ rotation, same prep as the single-chip path
        q = _global_queries(
            self.base._prepare_queries(vectors), self.mesh
        )

        cn = sq_norms(self.centroids_rep)
        qc_ip = jnp.matmul(
            q, self.centroids_rep.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        group_term = cn[None, :] - 2.0 * qc_ip
        qn = sq_norms(q)
        cdist = group_term + qn[:, None]
        strategy = self.base.strategy
        if isinstance(strategy, LimitGroups):
            probe_mask = _probe_mask_limit_groups(cdist, strategy.count)
        elif isinstance(strategy, LimitVectors):
            sizes = jnp.asarray(self.base.partition_sizes())
            probe_mask = _probe_mask_limit_vectors(cdist, sizes, strategy.count)
        else:
            raise ValueError(f"unknown strategy {strategy!r}")

        k_eff = min(k, self.size)
        scan_strategy = self.base.scan_strategy
        if scan_strategy == "auto":
            # same policy as the single-chip index (probed work vs corpus
            # size, estimated per chip — each shard scans size/devices rows)
            scan_strategy = self.base._resolve_auto(int(q.shape[0]), k_eff)
        if scan_strategy == "pallas" and self.base._pallas_eligible(k_eff):
            return self._pallas_arrays(q, qn, group_term, probe_mask, k_eff)
        if scan_strategy in ("bucketed", "gathered"):
            # sublinear probing scales out like the masked path: gathered
            # requests also run the (strictly more general) bucketed scan
            return self._bucketed_arrays(
                q, qn, cdist, group_term, probe_mask, k_eff
            )
        dists, ids = _sharded_ivf_scan(
            q,
            self.codebooks_rep,
            self.codes_sharded,
            self.row_const_sharded,
            self.group_ids_sharded,
            self.loc2glob_sharded,
            group_term,
            probe_mask,
            mesh=self.mesh,
            bounds=self.base.pq.bounds,
            k=k_eff,
            tile_rows=self.base.tile_rows,
            precision=self.base.precision,
            topk_impl=self.base.topk_impl,
            recall_target=self.base.recall_target,
        )
        return dists, ids

    def _pallas_shard_operands(self):
        """Per-shard partition-padded kernel layouts (built once).

        Mirrors ``IVFIndex._pallas_operands`` per shard, with a uniform
        ``npad`` across shards so one shard_map covers all of them; row
        maps carry GLOBAL row ids so merged results need no globalization.
        """
        if self._pallas_sh is None:
            from jax.sharding import NamedSharding

            sizes = self.base.partition_sizes().astype(np.int64)
            num_p = len(sizes)
            n_shards = self.mesh.shape[ROWS]
            g_starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
            psz = -(-sizes // 128) * 128
            order = np.argsort(self.local_starts, kind="stable")
            pstart = np.zeros(num_p, np.int64)
            fill = np.zeros(n_shards, np.int64)
            for p in order:
                s = int(self.part_shard[p])
                pstart[p] = fill[s]
                fill[s] += psz[p]
            npad = max(int(fill.max()) if num_p else 128, 128)
            m = self.base.pq.num_quantizers
            codes_np = np.asarray(self.base.codes, np.int32)
            rc_np = np.asarray(self.base.row_const, np.float32)
            codes_pal = np.zeros((n_shards, npad, m), np.int32)
            rc_pal = np.full((n_shards, npad), 2.0e38, np.float32)
            rmap = np.full((n_shards, npad), -1, np.int32)
            nb = npad // 128
            blk_gpid = np.zeros((n_shards, nb), np.int32)
            for p in range(num_p):
                s, ls = int(self.part_shard[p]), int(pstart[p])
                gs, sz = int(g_starts[p]), int(sizes[p])
                codes_pal[s, ls : ls + sz] = codes_np[gs : gs + sz]
                rc_pal[s, ls : ls + sz] = rc_np[gs : gs + sz]
                rmap[s, ls : ls + sz] = np.arange(gs, gs + sz, dtype=np.int32)
                blk_gpid[s, ls // 128 : (ls + int(psz[p])) // 128] = p
            k_codes = self.base.pq.num_clusters
            if k_codes <= 256:  # minimal-width operand (see pack_codes_t)
                ctT = (codes_pal.astype(np.int16) - 128).astype(
                    np.int8
                ).transpose(0, 2, 1)
            elif k_codes <= 32768:
                ctT = codes_pal.astype(np.int16).transpose(0, 2, 1)
            else:
                ctT = codes_pal.transpose(0, 2, 1)
            row3 = NamedSharding(self.mesh, P(ROWS, None, None))
            row2 = NamedSharding(self.mesh, P(ROWS, None))
            self._pallas_sh = (
                jax.device_put(np.ascontiguousarray(ctT), row3),
                jax.device_put(rc_pal, row2),
                jax.device_put(rmap, row2),
                blk_gpid,
                npad,
            )
        return self._pallas_sh

    def _pallas_arrays(self, q, qn, group_term, probe_mask, k_eff):
        from gulon_tpu.ops.pallas.adc import block_layout, padded_depth

        ctT, rc_pal, rmap, blk_gpid, npad = self._pallas_shard_operands()
        num_q = q.shape[0]
        if num_q not in self._colpart_cache:
            from jax.sharding import NamedSharding

            m = self.base.pq.num_quantizers
            mdp = padded_depth(m, self.base.pq.pad_width)
            w = self.base.pallas_winners
            _, _, n_rt, nblk = block_layout(
                num_q, self.base.pq.num_clusters, mdp, npad, winners=w
            )
            nb = blk_gpid.shape[1]
            col = np.arange(n_rt * w * nblk, dtype=np.int64)
            col_blk = np.minimum(
                (col // (w * nblk)) * nblk + (col % (w * nblk)) % nblk,
                nb - 1,
            )
            self._colpart_cache[num_q] = jax.device_put(
                blk_gpid[:, col_blk].astype(np.int32),
                NamedSharding(self.mesh, P(ROWS, None)),
            )
        return _sharded_ivf_pallas(
            q, qn, self.codebooks_rep, ctT, rc_pal, rmap,
            self._colpart_cache[num_q], group_term, probe_mask,
            mesh=self.mesh,
            bounds=self.base.pq.bounds,
            k=k_eff,
            num_rows=npad,
            topk_impl=self.base.topk_impl,
            recall_target=self.base.recall_target,
            interpret=jax.default_backend() != "tpu",
            winners=self.base.pallas_winners,
            rescore=self.base.pallas_rescore,
        )

    def _bucketed_arrays(self, q, qn, cdist, group_term, probe_mask, k_eff):
        from gulon_tpu.models.ivf import _next_pow2, _plan_entry_schedule
        from gulon_tpu.ops.topk import smallest_k
        from jax.sharding import NamedSharding

        strategy = self.base.strategy
        sizes_np = self.base.partition_sizes()
        num_p = len(sizes_np)
        if isinstance(strategy, LimitGroups):
            num_probe = min(strategy.count, num_p)
        else:
            raw = int(np.asarray(probe_mask.sum(axis=1)).max())
            num_probe = min(_next_pow2(max(raw, 1)), num_p)
        masked_cdist = jnp.where(probe_mask, cdist, jnp.inf)
        probe_d, probe_ids = smallest_k(masked_cdist, num_probe)
        probe_np = np.asarray(
            jnp.where(jnp.isinf(probe_d), -1, probe_ids)
        ).astype(np.int32)

        pmax = int(sizes_np.max()) if num_p else 1
        rcap = min(512, _next_pow2(pmax))
        flat_p = probe_np[probe_np >= 0]
        max_occ = int(np.bincount(flat_p).max()) if flat_p.size else 1
        qcap = min(64, max(8, _next_pow2(max_occ)))
        kk = min(k_eff, rcap)

        # one schedule per shard over ITS partitions; a probe pair lives on
        # exactly one shard, so regrouped shard results are disjoint
        n_shards = self.mesh.shape[ROWS]
        plans = []
        for s in range(n_shards):
            on_s = (probe_np >= 0) & (
                self.part_shard[np.maximum(probe_np, 0)] == s
            )
            probe_s = np.where(on_s, probe_np, -1)
            plans.append(
                _plan_entry_schedule(
                    probe_s, sizes_np.astype(np.int64),
                    self.local_starts, rcap, qcap, kk,
                )
            )
        e_max = max(p[0].shape[0] for p in plans)
        w_max = max(p[4].shape[1] for p in plans)
        num_q = probe_np.shape[0]
        st = np.zeros((n_shards, e_max), np.int32)
        sz = np.zeros((n_shards, e_max), np.int32)
        pt = np.zeros((n_shards, e_max), np.int32)
        bk = np.full((n_shards, e_max, qcap), -1, np.int32)
        ps = np.full((n_shards, num_q, w_max), e_max * qcap, np.int32)
        for s, (es_, esz_, ep_, eb_, psl_) in enumerate(plans):
            e_s = es_.shape[0]
            st[s, :e_s], sz[s, :e_s], pt[s, :e_s] = es_, esz_, ep_
            bk[s, :e_s] = eb_
            w_s = psl_.shape[1]
            ps[s, :, :w_s] = np.where(
                psl_ >= e_s * qcap, e_max * qcap, psl_
            )

        sh2 = NamedSharding(self.mesh, P(ROWS, None))
        sh3 = NamedSharding(self.mesh, P(ROWS, None, None))
        dists, ids = _sharded_ivf_bucketed(
            self.base._q_subspace(q),
            qn,
            group_term,
            self.codebooks_rep,
            self.codes_sharded,
            self.row_const_sharded,
            self.loc2glob_sharded,
            jax.device_put(st, sh2),
            jax.device_put(sz, sh2),
            jax.device_put(pt, sh2),
            jax.device_put(bk, sh3),
            jax.device_put(ps, sh3),
            mesh=self.mesh,
            bounds=self.base.pq.bounds,
            k=k_eff,
            rcap=rcap, qcap=qcap, kk=kk, chunk=min(64, e_max),
            precision=self.base.precision,
            topk_impl=self.base.topk_impl,
            recall_target=self.base.recall_target,
        )
        return dists, ids

    def lookup(self, word: str) -> Optional[np.ndarray]:
        return self.base.lookup(word)


@dataclasses.dataclass
class ShardedExactIndex(Index):
    """Row-sharded counterpart of :class:`ExactIndex`.

    On TPU (or with ``scan_strategy="pallas"`` forced on the base) the
    per-shard scan is the fused dense kernel over a pre-augmented bf16
    operand built at shard time — the single-chip serving path at mesh
    scale; otherwise the XLA tile scan.
    """

    base: ExactIndex
    mesh: Mesh
    vectors_sharded: jax.Array  # [N', D] padded + row-sharded
    norms_sharded: jax.Array  # [N'] +inf padding
    # [N', Dp] bf16 prepare_data operand, row-sharded. Padding rows get a
    # ~_BIG (finite) norm lane: +inf would turn the kernel's lane-packed
    # score into NaN, _BIG just loses every block min.
    data_aug_sharded: Optional[jax.Array] = None

    @staticmethod
    def shard(index: ExactIndex, mesh: Mesh) -> "ShardedExactIndex":
        x = np.asarray(index.vectors)
        norms = (x * x).sum(1).astype(np.float32)
        # the bf16 kernel operand ([N', Dp], a full extra corpus copy) is
        # only built when the dense-kernel path can actually run — off-TPU
        # with the default strategy it would be dead memory + a dead
        # corpus pass (the XLA shard scan reads vectors_sharded directly);
        # _dense_operand() builds it lazily if the strategy changes later
        sharded = ShardedExactIndex(
            base=index,
            mesh=mesh,
            vectors_sharded=shard_rows(x, mesh, 0),
            norms_sharded=shard_rows(norms, mesh, np.inf),
        )
        if (
            jax.default_backend() == "tpu"
            or index.scan_strategy == "pallas"
        ):
            sharded._dense_operand()
        return sharded

    def _dense_operand(self) -> jax.Array:
        """[N', Dp] bf16 kernel operand, built once device-side.

        Padding rows (norm +inf in ``norms_sharded``) get a ~_BIG finite
        norm lane: +inf would make the kernel's lane-packed score NaN,
        _BIG just loses every block min.
        """
        if self.data_aug_sharded is None:
            from jax.sharding import NamedSharding

            from gulon_tpu.ops.pallas.dense import _BIG, prepare_data

            norms_fin = jnp.where(
                jnp.isinf(self.norms_sharded),
                jnp.float32(_BIG),
                self.norms_sharded,
            )
            self.data_aug_sharded = jax.device_put(
                prepare_data(self.vectors_sharded, norms_fin),
                NamedSharding(self.mesh, P(ROWS, None)),
            )
        return self.data_aug_sharded

    @property
    def key_index(self):
        return self.base.key_index

    @property
    def dimension(self) -> int:
        return self.base.dimension

    @property
    def size(self) -> int:
        return self.base.size

    @property
    def metric(self):
        return self.base.metric

    def add(self, keys, vectors):
        """Functional update: add to the base index, re-shard on the same
        mesh (``models/update.py``; layouts/shardings rebuild)."""
        return shard_index(self.base.add(keys, vectors), self.mesh)

    def remove(self, keys):
        """Functional update: remove from the base index, re-shard."""
        return shard_index(self.base.remove(keys), self.mesh)

    def batch_query(self, k: int, vectors) -> List[Result]:
        return self._make_results(*self.query_arrays(k, vectors))

    def query_arrays(self, k: int, vectors):
        q = jnp.asarray(vectors, jnp.float32)
        if q.ndim != 2 or q.shape[1] != self.dimension:
            raise ValueError(
                f"queries must be [Q, {self.dimension}], got {q.shape}"
            )
        if self.base.metric.normalized:
            q = normalize_rows(q)
        q = _global_queries(q, self.mesh)
        k_eff = min(k, self.size)
        local_n = self.vectors_sharded.shape[0] // self.mesh.shape[ROWS]
        strategy = self.base.scan_strategy
        if strategy == "auto":
            # same envelope as the single-chip auto gate, per shard
            strategy = (
                "pallas"
                if (
                    jax.default_backend() == "tpu"
                    and k_eff <= 128
                    and local_n >= 256 * k_eff
                )
                else "xla"
            )
        if strategy == "pallas":
            return pops.sharded_dense_scan(
                q,
                self._dense_operand(),
                self.norms_sharded,
                rescore_rows=(
                    self.vectors_sharded
                    if self.base.exact_rescore
                    else None
                ),
                mesh=self.mesh,
                k=k_eff,
                rescore=self.base.rescore_factor,
            )
        if strategy != "xla":
            raise ValueError(
                f"unknown exact scan strategy {self.base.scan_strategy!r}"
                " (expected auto|xla|pallas)"
            )
        dists, ids = pops.sharded_exact_scan(
            q,
            self.vectors_sharded,
            self.norms_sharded,
            mesh=self.mesh,
            k=k_eff,
            tile_rows=self.base.tile_rows,
            precision=self.base.precision,
            topk_impl=self.base.topk_impl,
            recall_target=self.base.recall_target,
        )
        return dists, ids

    def lookup(self, word: str) -> Optional[np.ndarray]:
        return self.base.lookup(word)


def shard_index(
    index: Union[FlatIndex, IVFIndex, ExactIndex], mesh: Mesh
) -> Union[ShardedFlatIndex, ShardedIVFIndex, "ShardedExactIndex"]:
    """Place an index row-sharded on a mesh. Query results are unchanged."""
    if isinstance(index, FlatIndex):
        return ShardedFlatIndex.shard(index, mesh)
    if isinstance(index, IVFIndex):
        return ShardedIVFIndex.shard(index, mesh)
    if isinstance(index, ExactIndex):
        return ShardedExactIndex.shard(index, mesh)
    raise TypeError(f"cannot shard {type(index)!r}")
