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
from gulon_tpu.parallel.mesh import ROWS, replicate, shard_rows


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

    @staticmethod
    def shard(index: FlatIndex, mesh: Mesh) -> "ShardedFlatIndex":
        # the sharded scan reads logical [N, m] codes; in-memory packing
        # (pack_memory) is a single-chip layout, so unpack when sharding
        codes = (
            index._unpacked_codes() if index.packed_width else index.codes
        )
        return ShardedFlatIndex(
            base=index,
            mesh=mesh,
            codes_sharded=shard_rows(np.asarray(codes), mesh, 0),
            norms_sharded=shard_rows(
                np.asarray(index.recon_norms), mesh, np.inf
            ),
            codebooks_rep=replicate(np.asarray(index.pq.codebooks), mesh),
            cache_sharded=(
                shard_rows(np.asarray(index.decoded_cache), mesh, 0)
                if index.decoded_cache is not None
                else None
            ),
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

    def batch_query(self, k: int, vectors) -> List[Result]:
        return self._make_results(*self.query_arrays(k, vectors))

    def query_arrays(self, k: int, vectors):
        q = self.base._prepare_queries(vectors)
        k_eff = min(k, self.size)
        if self.base.scan_strategy == "cached":
            if self.cache_sharded is None:
                raise ValueError(
                    "sharded cached strategy needs enable_cache() before "
                    "shard_index()"
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
        dists, ids = pops.sharded_adc_scan(
            q,
            self.codebooks_rep,
            self.codes_sharded,
            self.norms_sharded,
            mesh=self.mesh,
            bounds=self.base.pq.bounds,
            k=k_eff,
            tile_rows=self.base.tile_rows,
            precision=self.base.precision,
            topk_impl=self.base.topk_impl,
            recall_target=self.base.recall_target,
        )
        return dists, ids

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
    codes: jax.Array,  # [N', m] row-sharded
    row_const: jax.Array,  # [N'] row-sharded (+inf padding)
    group_ids: jax.Array,  # [N'] row-sharded
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

    local_n = codes.shape[0] // mesh.shape[ROWS]

    def shard_fn(q, cb, codes_loc, rc_loc, gid_loc, gt, pm):
        # the single-chip masked scan runs per shard (jit-in-shard_map
        # inlines); only the id globalization + ICI merge are added here
        d, ids = _ivf_scan(
            q, cb, codes_loc, rc_loc, gid_loc, gt, pm,
            bounds=bounds, k=k, tile_rows=tile_rows,
            precision=precision, topk_impl=topk_impl,
            recall_target=recall_target,
        )
        return pops._merge_over_rows(
            d, pops._globalize_ids(ids, local_n), k
        )

    return pops.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(ROWS, None), P(ROWS), P(ROWS), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, codebooks, codes, row_const, group_ids, group_term, probe_mask)


@dataclasses.dataclass
class ShardedIVFIndex(Index):
    """Row-sharded counterpart of :class:`IVFIndex` (same query results)."""

    base: IVFIndex
    mesh: Mesh
    codes_sharded: jax.Array
    row_const_sharded: jax.Array
    group_ids_sharded: jax.Array
    codebooks_rep: jax.Array
    centroids_rep: jax.Array

    @staticmethod
    def shard(index: IVFIndex, mesh: Mesh) -> "ShardedIVFIndex":
        return ShardedIVFIndex(
            base=index,
            mesh=mesh,
            codes_sharded=shard_rows(np.asarray(index.codes), mesh, 0),
            row_const_sharded=shard_rows(
                np.asarray(index.row_const), mesh, np.inf
            ),
            group_ids_sharded=shard_rows(
                np.asarray(index.group_ids), mesh, 0
            ),
            codebooks_rep=replicate(np.asarray(index.pq.codebooks), mesh),
            centroids_rep=replicate(np.asarray(index.centroids), mesh),
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

        cn = sq_norms(self.centroids_rep)
        qc_ip = jnp.matmul(
            q, self.centroids_rep.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        group_term = cn[None, :] - 2.0 * qc_ip
        cdist = group_term + sq_norms(q)[:, None]
        strategy = self.base.strategy
        if isinstance(strategy, LimitGroups):
            probe_mask = _probe_mask_limit_groups(cdist, strategy.count)
        elif isinstance(strategy, LimitVectors):
            sizes = jnp.asarray(self.base.partition_sizes())
            probe_mask = _probe_mask_limit_vectors(cdist, sizes, strategy.count)
        else:
            raise ValueError(f"unknown strategy {strategy!r}")

        k_eff = min(k, self.size)
        dists, ids = _sharded_ivf_scan(
            q,
            self.codebooks_rep,
            self.codes_sharded,
            self.row_const_sharded,
            self.group_ids_sharded,
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

    def lookup(self, word: str) -> Optional[np.ndarray]:
        return self.base.lookup(word)


@dataclasses.dataclass
class ShardedExactIndex(Index):
    """Row-sharded counterpart of :class:`ExactIndex`."""

    base: ExactIndex
    mesh: Mesh
    vectors_sharded: jax.Array  # [N', D] padded + row-sharded
    norms_sharded: jax.Array  # [N'] +inf padding

    @staticmethod
    def shard(index: ExactIndex, mesh: Mesh) -> "ShardedExactIndex":
        x = np.asarray(index.vectors)
        return ShardedExactIndex(
            base=index,
            mesh=mesh,
            vectors_sharded=shard_rows(x, mesh, 0),
            norms_sharded=shard_rows((x * x).sum(1), mesh, np.inf),
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
        dists, ids = pops.sharded_exact_scan(
            q,
            self.vectors_sharded,
            self.norms_sharded,
            mesh=self.mesh,
            k=min(k, self.size),
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
