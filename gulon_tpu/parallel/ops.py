"""Sharded compute: shard_map'd scans and distributed k-means.

The TPU-native replacement for every parallel construct in the reference
(SURVEY §2.3, P1-P6): rows shard across the ``"rows"`` mesh axis, PQ
subspaces across ``"sub"``, queries/codebooks replicate, and the collectives
are XLA's (``psum`` for segment sums, ``all_gather`` + ``top_k`` as the
functional ``TopKHeap.merge`` of reference ``TopKHeap.scala:44-53``).

Everything here is SPMD under one jit: per-shard scans compute local top-k
with *global* row ids, then one all-gather over ICI merges k·S candidates
per query — the only cross-device traffic, O(Q·k·S) bytes, independent of
corpus size.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gulon_tpu.ops import scan as scan_ops
from gulon_tpu.ops.distance import sq_norms
from gulon_tpu.ops.kmeans import KMeansConfig, KMeansResult, init_centroids
from gulon_tpu.ops.pq import split_subspaces
from gulon_tpu.ops.topk import smallest_k
from gulon_tpu.parallel.mesh import ROWS, SUB

shard_map = jax.shard_map


def _merge_over_rows(local_d, local_ids, k):
    """All-gather per-shard top-k and reduce to the global k smallest."""
    all_d = jax.lax.all_gather(local_d, ROWS, axis=1, tiled=True)  # [Q, S*k]
    all_i = jax.lax.all_gather(local_ids, ROWS, axis=1, tiled=True)
    vals, pos = smallest_k(all_d, k)
    return vals, jnp.take_along_axis(all_i, pos, axis=1)


def _globalize_ids(local_ids, local_n):
    """Local row ids -> global, preserving the -1 'empty slot' sentinel."""
    offset = jax.lax.axis_index(ROWS) * local_n
    return jnp.where(local_ids >= 0, local_ids + offset, -1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "bounds", "k", "tile_rows", "precision",
        "topk_impl", "recall_target", "winners", "rerank_k",
        "force_pallas",
    ),
)
def sharded_adc_scan(
    queries: jax.Array,  # [Q, D] replicated
    codebooks: jax.Array,  # [m, K, dsub] replicated
    codes: jax.Array,  # [N', m] row-sharded (padded to shard multiple)
    recon_norms: jax.Array,  # [N'] row-sharded, +inf on padding
    codes_t: Optional[jax.Array] = None,  # [m, N'] minimal-width
    #   pretransposed kernel operand, sharded on dim 1 (pack_codes_t per
    #   shard) — skips the per-call [n_loc, m] -> [m, n_loc] i32 relayout
    *,
    mesh: Mesh,
    bounds,
    k: int,
    tile_rows: int = scan_ops.DEFAULT_TILE_ROWS,
    precision: str = "default",
    topk_impl: str = "approx",
    recall_target: float = 0.95,
    winners: int = 1,  # per-128-row-block winner count (FlatIndex
    #   pallas_winners): same-block collision repair on the kernel path
    rerank_k: int = 0,  # >k: per-shard kernel over-fetch width, exactly
    #   rescored (f32 ADC) to k inside each shard before the ICI merge —
    #   the sharded counterpart of FlatIndex.rerank_factor
    force_pallas: bool = False,  # run the kernel branch in interpret mode
    #   off-TPU (tests exercise the winners/rerank plumbing on a CPU mesh)
) -> Tuple[jax.Array, jax.Array]:
    """Row-sharded ADC scan: per-shard fused-kernel (TPU) or decode-matmul
    scan + ICI top-k merge.

    Returns replicated ([Q, k] distances, [Q, k] global row ids).
    """
    local_n = codes.shape[0] // mesh.shape[ROWS]
    m, k_codes, _ = codebooks.shape
    k_scan = rerank_k if rerank_k > k else k
    interpret = jax.default_backend() != "tpu"
    use_pallas = (
        (not interpret or force_pallas)
        and k_scan <= 128
        and k_codes <= 1024
        and local_n >= 256 * k_scan
    )
    if not use_pallas:
        k_scan = k  # the rerank over-fetch is a kernel-path repair only

    def _local_topk(q, cb, codes_loc, norms_loc, d, ids):
        """Per-shard exact rescore (if over-fetched) + ICI merge."""
        if k_scan > k:
            # per-shard exact top-k == global exact top-k after the merge:
            # every shard contributes its k best exact distances
            d, ids = scan_ops.rescore_exact(
                q, cb, codes_loc, norms_loc, ids, bounds=bounds, k=k
            )
        return _merge_over_rows(d, _globalize_ids(ids, local_n), k)

    if use_pallas and codes_t is not None:
        from gulon_tpu.ops.pallas.adc import adc_scan_pallas

        def shard_fn_t(q, cb, ct_loc, norms_loc, codes_loc):
            d, ids = adc_scan_pallas(
                q, cb, ct_loc, norms_loc, bounds=bounds, k=k_scan,
                num_rows=local_n, winners=winners, interpret=interpret,
            )
            return _local_topk(q, cb, codes_loc, norms_loc, d, ids)

        return shard_map(
            shard_fn_t,
            mesh=mesh,
            in_specs=(P(), P(), P(None, ROWS), P(ROWS), P(ROWS, None)),
            out_specs=(P(), P()),
            check_vma=False,
        )(queries, codebooks, codes_t, recon_norms, codes)

    def shard_fn(q, cb, codes_loc, norms_loc):
        if use_pallas:
            from gulon_tpu.ops.pallas.adc import adc_scan_pallas

            # per-call [n_loc, m] -> [m, n_loc] relayout inside the shard
            # (~codes bytes of HBM traffic; noise next to the scan matmul)
            d, ids = adc_scan_pallas(
                q, cb, codes_loc, norms_loc, bounds=bounds, k=k_scan,
                winners=winners, interpret=interpret,
            )
        else:
            d, ids = scan_ops.adc_scan_decode(
                q, cb, codes_loc, norms_loc, bounds=bounds, k=k,
                tile_rows=tile_rows, precision=precision,
                topk_impl=topk_impl, recall_target=recall_target,
            )
        return _local_topk(q, cb, codes_loc, norms_loc, d, ids)

    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(ROWS, None), P(ROWS)),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, codebooks, codes, recon_norms)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "k", "tile_rows", "precision", "topk_impl", "recall_target"
    ),
)
def sharded_exact_scan(
    queries: jax.Array,  # [Q, D] replicated
    data: jax.Array,  # [N', D] row-sharded
    data_norms: jax.Array,  # [N'] row-sharded, +inf on padding
    *,
    mesh: Mesh,
    k: int,
    tile_rows: int = scan_ops.DEFAULT_TILE_ROWS,
    precision: str = "highest",
    topk_impl: str = "exact",
    recall_target: float = 0.95,
) -> Tuple[jax.Array, jax.Array]:
    """Row-sharded brute-force top-k (the Deep10M-on-a-pod configuration)."""
    local_n = data.shape[0] // mesh.shape[ROWS]
    qn = sq_norms(queries)

    def shard_fn(q, qn_, x_loc, xn_loc):
        num_q = q.shape[0]
        tr = min(tile_rows, max(x_loc.shape[0], 1))
        x_tiles = scan_ops._tile(x_loc, tr)
        n_tiles = scan_ops._tile(xn_loc, tr, pad_value=jnp.inf)

        def dist_tile(inp):
            xt, xn = inp
            ip = jnp.matmul(
                q, xt.T,
                preferred_element_type=jnp.float32,
                precision=scan_ops.resolve_precision(precision),
            )
            return qn_[:, None] + xn[None, :] - 2.0 * ip

        d, ids = scan_ops._streaming_topk(
            dist_tile, x_tiles.shape[0], tr, num_q, k, (x_tiles, n_tiles),
            topk_impl=topk_impl, recall_target=recall_target,
        )
        return _merge_over_rows(d, _globalize_ids(ids, local_n), k)

    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(ROWS, None), P(ROWS)),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, qn, data, data_norms)


def sharded_dense_scan(
    queries: jax.Array,  # [Q, D] f32 replicated (subspace-padded layout
    #   for cached-decode scans, raw vectors for exact scans)
    data_aug: jax.Array,  # [N', Dp] bf16 row-sharded kernel operand
    #   (prepare_data / _augment_cache; padding rows carry a ~_BIG norm
    #   lane, NOT +inf — inf would NaN under the lane-packed selection)
    norms: jax.Array,  # [N'] f32 row-sharded (only the exact-f32 rescore
    #   reads it; padding entries are never gathered)
    rescore_rows: Optional[jax.Array] = None,  # [N', D] f32 row-sharded:
    #   exact-f32 re-rank rows (ExactIndex.exact_rescore)
    *,
    mesh: Mesh,
    k: int,
    rescore: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """Row-sharded fused dense scan: per-shard Pallas kernel + ICI merge.

    The mesh-scale counterpart of the single-chip dense-kernel serving
    modes (``ExactIndex`` "pallas", ``FlatIndex`` "cached" on TPU): each
    shard runs the matmul-bound kernel over its row slice — including its
    internal over-fetch rescore — and the only cross-device traffic is
    the O(Q·k·shards) all-gather top-k merge (the ``TopKHeap.scala:44-53``
    role). Interpret mode runs the kernel per shard on CPU meshes (tests).

    Requires ``local_n >= 256 * min(k, 128)`` per shard and ``k <= 128``
    (the kernel's envelope); callers gate and fall back to the XLA
    ``sharded_exact_scan`` outside it.
    """
    from gulon_tpu.ops.pallas.dense import dense_scan_pallas

    local_n = data_aug.shape[0] // mesh.shape[ROWS]
    interpret = jax.default_backend() != "tpu"

    def shard_fn(q, da_loc, n_loc, *rr):
        d, ids = dense_scan_pallas(
            q,
            da_loc,
            n_loc,
            k=k,
            rescore=rescore,
            rescore_rows=rr[0] if rr else None,
            interpret=interpret,
        )
        return _merge_over_rows(d, _globalize_ids(ids, local_n), k)

    in_specs = [P(), P(ROWS, None), P(ROWS)]
    operands = [queries, data_aug, norms]
    if rescore_rows is not None:
        in_specs.append(P(ROWS, None))
        operands.append(rescore_rows)
    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )(*operands)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "bounds", "block_rows", "precision"),
)
def _sharded_encode_jit(
    x: jax.Array,  # [N', D] row-sharded over every mesh device
    codebooks: jax.Array,  # [m, K, dsub] replicated
    *,
    mesh: Mesh,
    bounds,
    block_rows: int,
    precision: str,
):
    pad_width = max(w for _, w in bounds)

    def shard_fn(x_loc, cb):
        from gulon_tpu.ops.pq import _encode_stacked

        xs = split_subspaces(x_loc, bounds, pad_width)
        return _encode_stacked(xs, cb, block_rows, precision)

    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P((ROWS, SUB), None), P()),
        out_specs=P((ROWS, SUB), None),
        check_vma=False,
    )(x, codebooks)


def sharded_encode(
    pq,
    x,
    mesh: Mesh,
    *,
    chunk: int = 1 << 20,
    block_rows: int = 65536,
    precision: str = "default",
) -> np.ndarray:
    """Mesh-parallel bulk encode: rows shard over EVERY device.

    The distributed counterpart of the reference's per-subspace encode
    fan-out (P3, ``ProductQuantizer.scala:25-35``) along the bigger axis:
    each device encodes its row shard with replicated codebooks (vmapped
    argmin over all m subspaces at once), so a v5e-8 build encodes 8x the
    rows per step. Host input streams through the mesh in ``chunk``-row
    slices; never funnels the corpus through one device.
    """
    from jax.sharding import NamedSharding

    n_dev = mesh.devices.size
    sharding = NamedSharding(mesh, P((ROWS, SUB), None))
    out = np.empty((len(x), pq.num_quantizers), pq.dtype_codes)
    for start in range(0, len(x), chunk):
        xc = np.asarray(x[start : start + chunk], np.float32)
        n_pad = (-len(xc)) % n_dev
        if n_pad:
            xc = np.pad(xc, ((0, n_pad), (0, 0)))
        codes = _sharded_encode_jit(
            jax.device_put(xc, sharding),
            pq.codebooks,
            mesh=mesh,
            bounds=pq.bounds,
            block_rows=block_rows,
            precision=precision,
        )
        out[start : start + len(xc) - n_pad] = np.asarray(
            codes[: len(xc) - n_pad]
        ).astype(pq.dtype_codes)
    return out


# ---------------------------------------------------------------------------
# Distributed k-means: rows sharded (dp) x subspaces sharded (mp)
# ---------------------------------------------------------------------------


class _ShardedLoopState(NamedTuple):
    centroids: jax.Array  # [m_loc, k, d]
    assignments: jax.Array  # [m_loc, n_loc]
    iteration: jax.Array  # i32
    done: jax.Array  # [m_loc] bool
    all_done: jax.Array  # bool — global across SUB (collectives live in body)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "k", "max_iters", "block_rows", "precision"),
)
def _sharded_fit(
    x: jax.Array,  # [m, N', d] sharded (SUB, ROWS, None)
    valid: jax.Array,  # [m, N'] bool, same sharding (False on padding)
    init: jax.Array,  # [m, k, d] sharded (SUB, None, None)
    *,
    mesh: Mesh,
    k: int,
    max_iters: int,
    block_rows: int,
    precision: str = "default",
):
    def shard_fn(x_loc, valid_loc, c_init):
        m_loc, n_loc, d = x_loc.shape

        def assign_all(cs):
            def one(xs, c):
                cn = sq_norms(c)
                block = min(block_rows, n_loc)
                xp, _ = _pad_rows_jnp(xs, block)
                tiles = xp.reshape(-1, block, d)

                def one_tile(xt):
                    s = cn[None, :] - 2.0 * jnp.matmul(
                        xt, c.T,
                        preferred_element_type=jnp.float32,
                        precision=scan_ops.resolve_precision(precision),
                    )
                    return jnp.argmin(s, axis=-1).astype(jnp.int32)

                return jax.lax.map(one_tile, tiles).reshape(-1)[:n_loc]

            return jax.vmap(one)(x_loc, cs)

        def update_all(assigns):
            # Masked one-hot segment sums, psum'd over the row axis (the
            # distributed counterpart of KMeans.fromAssignment).
            ids = jnp.arange(k, dtype=jnp.int32)

            def one(xs, a, v):
                onehot = (
                    (a[:, None] == ids[None, :]) & v[:, None]
                ).astype(jnp.float32)
                sums = jnp.matmul(
                    onehot.T, xs,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                counts = jnp.sum(onehot, axis=0)
                return sums, counts

            sums, counts = jax.vmap(one)(x_loc, assigns, valid_loc)
            sums = jax.lax.psum(sums, ROWS)
            counts = jax.lax.psum(counts, ROWS)
            safe = jnp.maximum(counts, 1.0)
            return jnp.where(
                counts[..., None] > 0, sums / safe[..., None], 0.0
            )

        def global_unchanged(new_a, old_a):
            local = jnp.sum(
                ((new_a == old_a) & valid_loc).astype(jnp.int32), axis=1
            )
            total_valid = jax.lax.psum(
                jnp.sum(valid_loc.astype(jnp.int32), axis=1), ROWS
            )
            return jax.lax.psum(local, ROWS) == total_valid  # [m_loc]

        a0 = assign_all(c_init)
        st0 = _ShardedLoopState(
            centroids=c_init,
            assignments=a0,
            iteration=jnp.int32(0),
            done=jnp.zeros((m_loc,), jnp.bool_),
            all_done=jnp.bool_(False),
        )

        def cond(st):
            return jnp.logical_and(~st.all_done, st.iteration < max_iters)

        def body(st):
            new_c = update_all(st.assignments)
            new_c = jnp.where(st.done[:, None, None], st.centroids, new_c)
            new_a = assign_all(new_c)
            new_a = jnp.where(st.done[:, None], st.assignments, new_a)
            done = st.done | global_unchanged(new_a, st.assignments)
            all_done = (
                jax.lax.psum(jnp.sum((~done).astype(jnp.int32)), SUB) == 0
            )
            return _ShardedLoopState(
                new_c, new_a, st.iteration + 1, done, all_done
            )

        final = jax.lax.while_loop(cond, body, st0)
        return final.centroids, final.assignments, final.iteration, final.done

    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(SUB, ROWS, None), P(SUB, ROWS), P(SUB, None, None)),
        out_specs=(P(SUB, None, None), P(SUB, ROWS), P(), P(SUB)),
        check_vma=False,
    )(x, valid, init)


def _pad_rows_jnp(x, block):
    n = x.shape[0]
    n_pad = (-n) % block
    if n_pad:
        x = jnp.pad(x, ((0, n_pad),) + ((0, 0),) * (x.ndim - 1))
    return x, n_pad


def sharded_fit_kmeans(
    x,
    config: KMeansConfig,
    mesh: Mesh,
) -> KMeansResult:
    """Distributed Lloyd over a (rows x sub) mesh.

    ``x`` is ``[n, d]`` or stacked ``[m, n, d]``. Rows shard over ``"rows"``
    (data parallel, the mesh analog of the reference's 25k-row fan-out at
    ``KMeans.scala:57-68``); stacked subspaces shard over ``"sub"`` (model
    parallel, the analog of per-subspace tasks at
    ``ProductQuantizer.scala:130-145``). Centroid updates psum partial
    segment-sums over ICI; semantics (empty-cluster zeros, convergence =
    assignment fixpoint) match the single-chip engine exactly.
    """
    x = np.asarray(x, np.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    m, n, d = x.shape

    if m % mesh.shape[SUB] != 0:
        # subspace count doesn't split over the sub axis (e.g. the single
        # coarse k-means, m=1): flatten the mesh so every device
        # data-parallels rows instead
        mesh = Mesh(mesh.devices.reshape(-1, 1), (ROWS, SUB))
    m_shards = mesh.shape[SUB]
    r_shards = mesh.shape[ROWS]

    # initial centroids host-side: materializing the full stacked tensor on
    # one device just for seeding would defeat mesh builds. kmeans++ seeds
    # from a bounded row subsample (D^2 seeding quality is insensitive to
    # subsampling at these sizes) so its O(k·n·d) pass stays cheap.
    if config.init == "kmeans++":
        from gulon_tpu.ops.kmeans import init_centroids_pp

        cap = min(n, max(config.k * 64, 65536))
        sub = x
        if cap < n:
            rng = np.random.default_rng(config.seed)
            rows = np.sort(rng.choice(n, size=cap, replace=False))
            sub = x[:, rows]
        init = np.asarray(
            init_centroids_pp(jnp.asarray(sub), config.k, config.seed)
        )
    else:
        init = np.asarray(
            init_centroids(x, config.k, config.seed, backend="host")
        )

    n_pad = (-n) % r_shards
    valid = np.ones((m, n), bool)
    if n_pad:
        x = np.pad(x, ((0, 0), (0, n_pad), (0, 0)))
        valid = np.pad(valid, ((0, 0), (0, n_pad)))

    from jax.sharding import NamedSharding

    x_sh = jax.device_put(x, NamedSharding(mesh, P(SUB, ROWS, None)))
    valid_sh = jax.device_put(valid, NamedSharding(mesh, P(SUB, ROWS)))
    init_sh = jax.device_put(init, NamedSharding(mesh, P(SUB, None, None)))

    cents, assigns, iters, done = _sharded_fit(
        x_sh,
        valid_sh,
        init_sh,
        mesh=mesh,
        k=config.k,
        max_iters=config.max_iters,
        block_rows=config.block_rows,
        precision=config.precision,
    )
    assigns = assigns[:, :n]
    if squeeze:
        return KMeansResult(cents[0], assigns[0], iters, done[0])
    return KMeansResult(cents, assigns, iters, done)
