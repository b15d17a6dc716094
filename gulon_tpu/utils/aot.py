"""AOT-exported serving artifacts (``jax.export``): load -> query, zero jit.

The reference serves immediately after ``Index.read`` (``Index.scala:147-149``,
plain JVM bytecode). A JAX process normally pays a trace+compile on the first
query instead. This module closes that gap: the query computation is exported
as serialized StableHLO at standard (batch, k) shapes and stored in a sidecar
next to the index file, so a fresh serving process with a cold compile cache
answers its first query at steady-state latency.

Artifacts embed only the *computation*; index arrays (codes, codebooks,
norms, ...) stay in the index file and are passed as call operands, so the
sidecar stays tiny (~10-100 KB per shape) regardless of corpus size.

Usage::

    bundle = export_serving(index, shapes=[(1024, 10), (1, 10)])
    save_serving("idx.pb.aot", bundle)
    ...
    serving = load_serving("idx.pb.aot", load_index("idx.pb"))
    dists, ids = serving.query_arrays(10, queries)   # no jit, first call fast

Queries pad up to the nearest exported batch; shapes with no artifact fall
back to the index's jitted path.
"""

from __future__ import annotations

import dataclasses
import functools
import io
import json
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_VERSION = 1


def _flat_callable(index, k: int):
    """(traceable fn, operands) for a FlatIndex query at top-k ``k``."""
    from gulon_tpu.models.flat import FlatIndex  # noqa: F401
    from gulon_tpu.ops import scan as scan_ops
    from gulon_tpu.ops.distance import normalize_rows
    from gulon_tpu.ops.pallas.adc import adc_scan_pallas

    normalized = index.metric.normalized
    bounds = index.pq.bounds
    k_eff = min(k, index.size)
    has_rot = index.rotation is not None

    def prep(q, rot):
        if normalized:
            q = normalize_rows(q)
        if rot is not None:
            # OPQ: codes live in the rotated basis (models/flat.py)
            q = jnp.matmul(q, rot, precision=jax.lax.Precision.HIGHEST)
        return q

    if index._pallas_eligible(k_eff):
        if index._pallas_codes_t is None:
            from gulon_tpu.ops.pallas.adc import pack_codes_t

            index._pallas_codes_t = pack_codes_t(
                index.codes, index.pq.num_clusters
            )
        n = index.size
        # mirror the live path's serving knobs (models/flat.py:146-151,
        # 253-276): block-winner count and the exact-rescore over-fetch —
        # an AOT artifact must return the same results as the jitted path
        winners = index.resolved_pallas_winners()
        k_scan = k_eff
        rerank = index.resolved_rerank_factor()
        if rerank > 1:
            k_scan = min(n, k_eff * rerank)
            k_scan = min(k_scan, 128, max(k_eff, n // 256))

        if k_scan > k_eff:

            def fn(q, cb, codes_t, norms, codes, *rot):
                q = prep(q, rot[0] if rot else None)
                _, cand = adc_scan_pallas(
                    q, cb, codes_t, norms, bounds=bounds, k=k_scan,
                    num_rows=n, winners=winners,
                )
                return scan_ops.rescore_exact(
                    q, cb, codes, norms, cand, bounds=bounds, k=k_eff
                )

            ops = (
                index.pq.codebooks,
                index._pallas_codes_t,
                index.recon_norms,
                index.codes,
            )
            return fn, ops + ((index.rotation,) if has_rot else ())

        def fn(q, cb, codes_t, norms, *rot):
            q = prep(q, rot[0] if rot else None)
            return adc_scan_pallas(
                q, cb, codes_t, norms, bounds=bounds, k=k_eff, num_rows=n,
                winners=winners,
            )

        ops = (index.pq.codebooks, index._pallas_codes_t, index.recon_norms)
        return fn, ops + ((index.rotation,) if has_rot else ())

    tile_rows, precision = index.tile_rows, index.precision
    topk_impl, rt = index.topk_impl, index.recall_target
    packed = index.packed_width

    def fn(q, cb, codes, norms, *rot):
        q = prep(q, rot[0] if rot else None)
        return scan_ops.adc_scan_decode(
            q, cb, codes, norms, bounds=bounds, k=k_eff,
            tile_rows=tile_rows, precision=precision,
            topk_impl=topk_impl, recall_target=rt, packed_width=packed,
        )

    ops = (index.pq.codebooks, index.codes, index.recon_norms)
    return fn, ops + ((index.rotation,) if has_rot else ())


def _ivf_callable(index, k: int):
    """(traceable fn, operands) for an IVFIndex masked query at ``k``."""
    from gulon_tpu.models.ivf import (
        LimitGroups,
        LimitVectors,
        _ivf_scan,
        _probe_mask_limit_groups,
        _probe_mask_limit_vectors,
    )
    from gulon_tpu.ops.distance import normalize_rows, sq_norms

    normalized = index.metric.normalized
    bounds = index.pq.bounds
    k_eff = min(k, index.size)
    strategy = index.strategy
    tile_rows, precision = index.tile_rows, index.precision
    topk_impl, rt = index.topk_impl, index.recall_target
    sizes = jnp.asarray(index.partition_sizes())
    has_rot = index.rotation is not None

    def fn(q, cb, codes, row_const, group_ids, centroids, *rot):
        if normalized:
            q = normalize_rows(q)
        if rot:  # OPQ global basis change (models/ivf.py)
            q = jnp.matmul(q, rot[0], precision=jax.lax.Precision.HIGHEST)
        cn = sq_norms(centroids)
        ip = jnp.matmul(
            q, centroids.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        group_term = cn[None, :] - 2.0 * ip
        cdist = group_term + sq_norms(q)[:, None]
        if isinstance(strategy, LimitGroups):
            pm = _probe_mask_limit_groups(cdist, strategy.count)
        elif isinstance(strategy, LimitVectors):
            pm = _probe_mask_limit_vectors(cdist, sizes, strategy.count)
        else:
            raise ValueError(f"unknown strategy {strategy!r}")
        return _ivf_scan(
            q, cb, codes, row_const, group_ids, group_term, pm,
            bounds=bounds, k=k_eff, tile_rows=tile_rows,
            precision=precision, topk_impl=topk_impl, recall_target=rt,
        )

    ops = (
        index.pq.codebooks, index.codes, index.row_const,
        index.group_ids, index.centroids,
    )
    return fn, ops + ((index.rotation,) if has_rot else ())


def _ivf_gathered_callable(index, k: int):
    """(traceable fn, operands) for the code-resident gathered IVF scan.

    The sublinear serving path: per-query partition slices over the padded
    ``[N + pmax, m]`` code matrix. Fully static-shaped (``num_probe`` from
    the LimitGroups strategy, ``pmax`` from the partition layout — bound it
    at build time with ``max_partition_size``), so it exports like any
    other computation. LimitVectors is not exportable on this path: its
    probe-set width is data-dependent (host-rounded per batch).
    """
    from gulon_tpu.models.ivf import (
        LimitGroups,
        _ivf_scan_gathered,
        _probe_mask_limit_groups,
    )
    from gulon_tpu.ops.distance import normalize_rows, sq_norms
    from gulon_tpu.ops.pq import split_subspaces
    from gulon_tpu.ops.topk import smallest_k

    if not isinstance(index.strategy, LimitGroups):
        raise ValueError(
            "AOT export of scan_strategy='gathered' requires a LimitGroups "
            "strategy (LimitVectors probe widths are data-dependent)"
        )
    normalized = index.metric.normalized
    bounds, pad_width = index.pq.bounds, index.pq.pad_width
    k_eff = min(k, index.size)
    sizes_np = index.partition_sizes()
    pmax = int(sizes_np.max()) if len(sizes_np) else 1
    num_probe = min(index.strategy.count, index.num_partitions)
    k_g = min(k_eff, num_probe * pmax)
    starts = np.concatenate([[0], np.cumsum(sizes_np)[:-1]]).astype(np.int32)
    precision, topk_impl, rt = (
        index.precision, index.topk_impl, index.recall_target,
    )
    codes_pad, rc_pad = index._code_operands()
    has_rot = index.rotation is not None

    def fn(q, cb, codes_pad, rc_pad, starts, sizes, centroids, *rot):
        if normalized:
            q = normalize_rows(q)
        if rot:  # OPQ global basis change (models/ivf.py)
            q = jnp.matmul(q, rot[0], precision=jax.lax.Precision.HIGHEST)
        cn = sq_norms(centroids)
        ip = jnp.matmul(
            q, centroids.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        group_term = cn[None, :] - 2.0 * ip
        qn = sq_norms(q)
        cdist = group_term + qn[:, None]
        pm = _probe_mask_limit_groups(cdist, num_probe)
        masked_cdist = jnp.where(pm, cdist, jnp.inf)
        probe_d, probe_ids = smallest_k(masked_cdist, num_probe)
        probe_ids = jnp.where(
            jnp.isinf(probe_d), -1, probe_ids
        ).astype(jnp.int32)
        qs = split_subspaces(q, bounds, pad_width)
        qs = jnp.transpose(qs, (1, 0, 2)).reshape(q.shape[0], -1)
        dists, ids = _ivf_scan_gathered(
            qs, qn, group_term, cb, codes_pad, rc_pad, starts, sizes,
            probe_ids, mode="codes", num_probe=num_probe, pmax=pmax, k=k_g,
            precision=precision, topk_impl=topk_impl, recall_target=rt,
        )
        if k_g < k_eff:
            pad = k_eff - k_g
            dists = jnp.pad(dists, ((0, 0), (0, pad)),
                            constant_values=jnp.inf)
            ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        return dists, ids

    ops = (
        index.pq.codebooks, codes_pad, rc_pad, jnp.asarray(starts),
        jnp.asarray(sizes_np), index.centroids,
    )
    return fn, ops + ((index.rotation,) if has_rot else ())


def _exact_callable(index, k: int):
    """(traceable fn, operands) for an ExactIndex query at ``k``."""
    from gulon_tpu.ops import scan as scan_ops
    from gulon_tpu.ops.distance import normalize_rows, sq_norms

    normalized = index.metric.normalized
    k_eff = min(k, index.size)
    use_pallas = (
        jax.default_backend() == "tpu"
        and index.scan_strategy in ("auto", "pallas")
        and k_eff <= 128
        and index.size >= 256 * k_eff
    )
    if use_pallas:
        from gulon_tpu.ops.pallas.dense import (
            dense_scan_pallas,
            prepare_data,
        )

        if index._data_t is None:
            index._data_t = prepare_data(index.vectors)
        rescore = index.rescore_factor

        if index.exact_rescore:

            def fn(q, data_t, norms, rows):
                if normalized:
                    q = normalize_rows(q)
                return dense_scan_pallas(
                    q, data_t, norms, k=k_eff,
                    rescore_rows=rows, rescore=rescore,
                )

            return fn, (
                index._data_t, sq_norms(index.vectors), index.vectors
            )

        # operand rescore: the f32 corpus never ships into the bundle
        def fn(q, data_t, norms):
            if normalized:
                q = normalize_rows(q)
            return dense_scan_pallas(
                q, data_t, norms, k=k_eff, rescore=rescore,
            )

        return fn, (index._data_t, sq_norms(index.vectors))

    tile_rows, precision = index.tile_rows, index.precision
    topk_impl, rt = index.topk_impl, index.recall_target

    def fn(q, rows):
        if normalized:
            q = normalize_rows(q)
        return scan_ops.exact_scan(
            q, rows, k=k_eff, tile_rows=tile_rows, precision=precision,
            topk_impl=topk_impl, recall_target=rt,
        )

    return fn, (index.vectors,)


def _ivf_pallas_callable(index, k: int):
    """(traceable fn, operands) for the fused-kernel IVF strategy."""
    from gulon_tpu.models.ivf import (
        LimitGroups,
        LimitVectors,
        _pallas_ivf_query,
        _rank_and_probe,
    )
    from gulon_tpu.ops.distance import normalize_rows
    from gulon_tpu.ops.pallas.adc import block_layout, padded_depth

    normalized = index.metric.normalized
    k_eff = min(k, index.size)
    if isinstance(index.strategy, LimitGroups):
        kind = "groups"
    elif isinstance(index.strategy, LimitVectors):
        kind = "vectors"
    else:
        raise ValueError(f"unknown strategy {index.strategy!r}")
    count = index.strategy.count
    codes_t, rc_pal, blk_part, row_map, npad = index._pallas_operands()
    m = index.pq.num_quantizers
    mdp = padded_depth(m, index.pq.pad_width)
    k_codes = index.pq.num_clusters
    nb = len(blk_part)
    sizes = jnp.asarray(index.partition_sizes())
    bounds = index.pq.bounds
    topk_impl, rt = index.topk_impl, index.recall_target
    interpret = jax.default_backend() != "tpu"

    w = index.pallas_winners
    has_rot = index.rotation is not None

    def fn(q, centroids, sizes, cb, codes_t, rc_pal, row_map, *rot):
        # winner-column -> partition map: tile layout (and so the map)
        # depends on the traced batch size; computed host-side at trace
        # time and embedded as a small constant (NW int32s)
        _, _, n_rt, nblk = block_layout(
            q.shape[0], k_codes, mdp, npad, winners=w
        )
        col = np.arange(n_rt * w * nblk, dtype=np.int64)
        col_blk = (col // (w * nblk)) * nblk + (col % (w * nblk)) % nblk
        col_part = jnp.asarray(
            blk_part[np.minimum(col_blk, nb - 1)].astype(np.int32)
        )
        if normalized:
            q = normalize_rows(q)
        if rot:  # OPQ global basis change (models/ivf.py)
            q = jnp.matmul(q, rot[0], precision=jax.lax.Precision.HIGHEST)
        group_term, qn, _cd, pm = _rank_and_probe(
            q, centroids, sizes, kind=kind, count=count
        )
        return _pallas_ivf_query(
            q, qn, group_term, pm, cb, codes_t, rc_pal, col_part, row_map,
            bounds=bounds, num_rows=npad, k=k_eff,
            topk_impl=topk_impl, recall_target=rt, interpret=interpret,
            winners=w, rescore=index.pallas_rescore,
        )

    ops = (
        index.centroids, sizes, index.pq.codebooks, codes_t, rc_pal,
        row_map,
    )
    return fn, ops + ((index.rotation,) if has_rot else ())


def _callable_for(index, k: int, batch: int = 1):
    from gulon_tpu.models.exact import ExactIndex
    from gulon_tpu.models.flat import FlatIndex
    from gulon_tpu.models.ivf import IVFIndex, LimitGroups

    if isinstance(index, ExactIndex):
        return _exact_callable(index, k)
    if isinstance(index, FlatIndex):
        return _flat_callable(index, k)
    if isinstance(index, IVFIndex):
        strategy = index.scan_strategy
        if strategy == "auto":
            # resolve for THIS export shape, like the live path does per
            # batch — an artifact must serve what the default serves
            strategy = index._resolve_auto(batch, min(k, index.size))
            if strategy in ("gathered", "bucketed"):
                # gathered is the exportable sublinear form (static
                # shapes); it needs a LimitGroups probe width. Bucketed's
                # host-planned schedule and LimitVectors' data-dependent
                # widths fall back to the masked scan.
                strategy = (
                    "gathered"
                    if isinstance(index.strategy, LimitGroups)
                    else "masked"
                )
        if strategy == "pallas" and index._pallas_eligible(
            min(k, index.size)
        ):
            return _ivf_pallas_callable(index, k)
        if strategy == "gathered":
            return _ivf_gathered_callable(index, k)
        if strategy == "bucketed":
            raise ValueError(
                "scan_strategy='bucketed' plans its entry schedule host-"
                "side per batch and cannot be AOT-exported; use 'gathered' "
                "(sublinear, exportable) or 'masked'"
            )
        return _ivf_callable(index, k)
    raise TypeError(f"cannot export serving for {type(index)!r}")


@dataclasses.dataclass
class ServingBundle:
    """Serialized query computations keyed by (batch, k)."""

    platform: str
    dimension: int
    artifacts: Dict[Tuple[int, int], bytes]


def export_serving(
    index,
    shapes: Sequence[Tuple[int, int]] = ((1, 10), (1024, 10)),
    *,
    warm_cache: bool = True,
) -> ServingBundle:
    """Export the index's query computation at the given (batch, k) shapes.

    Artifacts skip *tracing* at serving time; XLA still compiles the
    StableHLO once per process. With ``warm_cache`` (and the persistent
    compilation cache enabled, ``utils.cache.enable_persistent_cache``) the
    export step also populates the compile cache, so a fresh serving
    process on the same machine answers its first query with a cached
    executable — load-then-serve like ``Index.read`` (``Index.scala:147-149``).
    """
    artifacts = {}
    for batch, k in shapes:
        fn, operands = _callable_for(index, k, batch=batch)
        q_spec = jax.ShapeDtypeStruct((batch, index.dimension), jnp.float32)
        exp = jax.export.export(jax.jit(fn))(q_spec, *operands)
        blob = exp.serialize()
        artifacts[(int(batch), int(k))] = blob
        if warm_cache:
            q0 = jnp.zeros((batch, index.dimension), jnp.float32)
            jax.block_until_ready(
                jax.export.deserialize(blob).call(q0, *operands)
            )
    return ServingBundle(
        platform=jax.default_backend(),
        dimension=index.dimension,
        artifacts=artifacts,
    )


def save_serving(path: str, bundle: ServingBundle) -> None:
    """Write a bundle as one npz sidecar (tiny: computation only)."""
    arrays = {
        f"a_{b}_{k}": np.frombuffer(blob, np.uint8)
        for (b, k), blob in bundle.artifacts.items()
    }
    meta = json.dumps(
        {
            "version": _VERSION,
            "platform": bundle.platform,
            "dimension": bundle.dimension,
            "shapes": sorted(bundle.artifacts),
        }
    )
    arrays["meta"] = np.frombuffer(meta.encode(), np.uint8)
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


@dataclasses.dataclass
class AOTServing:
    """An index plus its deserialized AOT query functions.

    ``query_arrays``/``batch_query`` pad the query batch up to the nearest
    exported batch size; (batch, k) combinations with no artifact fall back
    to the index's jitted path.
    """

    index: object
    platform: str
    _fns: Dict[Tuple[int, int], object]
    _operands: Dict[int, tuple] = dataclasses.field(default_factory=dict)

    def _pick(self, k: int, num_q: int) -> Optional[Tuple[int, int]]:
        # an exported k' >= k serves k by truncation (results are ranked
        # ascending, so the top-k prefix is identical). Prefer the
        # tightest BATCH first, then the smallest k': padding dominates
        # device cost (a 1-query request padded to a 1024-row artifact is
        # ~1000x the work), while a larger k' only widens the top-k
        if self.platform != jax.default_backend():
            return None
        fits = [
            (b, kk) for (b, kk) in self._fns if kk >= k and b >= num_q
        ]
        return min(fits) if fits else None

    def query_arrays(self, k: int, vectors):
        q = jnp.asarray(vectors, jnp.float32)
        key = self._pick(k, q.shape[0]) if q.ndim == 2 else None
        if key is None:
            return self.index.query_arrays(k, vectors)
        batch, kk = key
        num_q = q.shape[0]
        if num_q < batch:
            q = jnp.pad(q, ((0, batch - num_q), (0, 0)))
        if key not in self._operands:
            # keyed by the full (batch, k): with scan_strategy="auto" the
            # resolved strategy — and thus the operand set — can differ
            # per exported batch size
            _, ops = _callable_for(self.index, kk, batch=batch)
            self._operands[key] = ops
        d, ids = self._fns[key].call(q, *self._operands[key])
        return d[:num_q, :k], ids[:num_q, :k]

    def batch_query(self, k: int, vectors) -> List:
        return self.index._make_results(*self.query_arrays(k, vectors))

    def query(self, k: int, vector):
        return self.batch_query(k, np.asarray(vector)[None, :])[0]

    # --- passthroughs so AOTServing is a drop-in for the Index API ---

    @property
    def key_index(self):
        return self.index.key_index

    @property
    def dimension(self) -> int:
        return self.index.dimension

    @property
    def size(self) -> int:
        return self.index.size

    @property
    def metric(self):
        return self.index.metric

    def lookup(self, word: str):
        return self.index.lookup(word)

    def query_by_word(self, k: int, word: str):
        vec = self.index.lookup(word)
        if vec is None:
            return None
        return self.query(k, vec)


def load_serving(path: str, index) -> AOTServing:
    """Attach a saved sidecar's AOT functions to a loaded index."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"].tobytes()).decode())
        if meta["version"] != _VERSION:
            raise ValueError(
                f"serving artifact version {meta['version']} unsupported"
            )
        if meta["dimension"] != index.dimension:
            raise ValueError(
                "serving artifacts were exported for dimension "
                f"{meta['dimension']}, index has {index.dimension}"
            )
        fns = {}
        for b, k in meta["shapes"]:
            blob = z[f"a_{b}_{k}"].tobytes()
            fns[(int(b), int(k))] = jax.export.deserialize(blob)
    return AOTServing(index=index, platform=meta["platform"], _fns=fns)
