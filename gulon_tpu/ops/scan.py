"""Streaming ADC / exact scans with fused top-k.

The query hot path of the reference is a per-query LUT build followed by a
code-gather + accumulate scan over 4096-row blocks feeding a bounded heap
(``Index.scala:352-440``). On TPU that decomposes into three jitted,
row-tiled scan strategies, all sharing one streaming top-k skeleton (carry
the best (distance, row-id) pairs across tiles, concat + top_k per tile —
the functional ``TopKHeap``):

- ``adc_scan_decode`` — the MXU formulation of ADC. Mathematically identical
  to the LUT scan: ``||q - x^||^2 = ||q||^2 + ||x^||^2 - 2<q, x^>`` where
  ``x^`` is the PQ reconstruction. Per tile: gather-decode codes to
  ``[T, m*dsub]`` (amortized over ALL queries in the batch, unlike per-query
  LUT gathers), then one queries x tile matmul on the MXU with precomputed
  reconstruction norms. The preferred strategy for batched queries.
- ``adc_scan_lut`` — classic asymmetric-distance scan: per-subspace gathers
  into the ``[Q, m, K]`` LUT. Cheaper per tile for tiny query batches
  (moves ~d/m x less data than decoding), and the direct analog of
  ``Index.scala:393-409``.
- ``exact_scan`` — brute force over raw vectors (matmul + norms), the
  counterpart of ``exactNearestNeighbours`` (``Index.scala:209-229``); also
  the ground-truth engine for the recall harness.

All scans return squared-L2 distances ascending plus global row ids.
Padded rows carry +inf norms so they can never enter the top-k.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from gulon_tpu.ops.distance import sq_norms
from gulon_tpu.ops.pq import split_subspaces
from gulon_tpu.ops.topk import smallest_k

DEFAULT_TILE_ROWS = 16384

# Scan matmul precision. "default" lets the MXU run at full bf16-pass
# throughput (~6x HIGHEST on v5e) with ~1e-2 relative error on distance
# values -- immaterial for top-k ranking quality. "highest" forces full-f32
# MXU passes for exact-parity comparisons (tests, recall audits).
_PRECISIONS = {
    "default": None,
    "highest": jax.lax.Precision.HIGHEST,
}


def resolve_precision(name: str):
    try:
        return _PRECISIONS[name]
    except KeyError:
        raise ValueError(
            f"unknown precision {name!r} (expected default|highest)"
        ) from None


def _tile(arr: jax.Array, tile_rows: int, pad_value=0):
    """Pad rows to a multiple of tile_rows and reshape to [n_tiles, T, ...]."""
    n = arr.shape[0]
    n_pad = (-n) % tile_rows
    if n_pad:
        pad_cfg = ((0, n_pad),) + ((0, 0),) * (arr.ndim - 1)
        arr = jnp.pad(arr, pad_cfg, constant_values=pad_value)
    return arr.reshape((-1, tile_rows) + arr.shape[1:])


def _streaming_topk(
    dist_tile_fn,
    n_tiles,
    tile_rows,
    num_queries,
    k,
    xs,
    topk_impl: str = "approx",
    recall_target: float = 0.95,
):
    """Fold tiles, keeping the k best (distance, global row id) per query.

    ``topk_impl="approx"`` selects per-tile winners with
    ``lax.approx_min_k`` — TPU's hardware PartialReduce, ~100x faster than
    ``lax.top_k`` on wide tiles — then reduces the n_tiles*k survivors with
    one exact top-k. Per-tile recall is ``recall_target``; on CPU the op
    falls back to exact. ``"exact"`` carries an exact concat+top_k per tile
    (the literal functional ``TopKHeap``).
    """

    if topk_impl == "approx":
        kk = min(k, tile_rows)  # per-tile winners from the PartialReduce
        stack_bytes = n_tiles * num_queries * kk * 8

        if stack_bytes <= 64 * 1024 * 1024:
            # fast path: stack every tile's winners, one exact reduce at
            # the end (a per-tile merge costs ~2x in scan throughput)
            def body(_, inp):
                tile_idx, tile_xs = inp
                d = dist_tile_fn(tile_xs)  # [Q, T]
                vals, pos = jax.lax.approx_min_k(
                    d, kk, recall_target=recall_target
                )
                ids = tile_idx * tile_rows + pos.astype(jnp.int32)
                return None, (vals, ids)

            tile_indices = jnp.arange(n_tiles, dtype=jnp.int32)
            _, (all_vals, all_ids) = jax.lax.scan(
                body, None, (tile_indices, xs)
            )
            width = n_tiles * kk
            cand_d = jnp.transpose(all_vals, (1, 0, 2)).reshape(
                num_queries, width
            )
            cand_i = jnp.transpose(all_ids, (1, 0, 2)).reshape(
                num_queries, width
            )
            kf = min(k, width)  # k can exceed a small shard's candidates
            best_d, pos = smallest_k(cand_d, kf)
            best_i = jnp.take_along_axis(cand_i, pos, axis=1)
            if kf < k:
                pad = k - kf
                best_d = jnp.pad(
                    best_d, ((0, 0), (0, pad)), constant_values=jnp.inf
                )
                best_i = jnp.pad(
                    best_i, ((0, 0), (0, pad)), constant_values=-1
                )
            best_i = jnp.where(jnp.isinf(best_d), -1, best_i)
            return best_d, best_i

        # huge corpora: O(Q*k) carry, merging each tile's winners (memory
        # stays corpus-size independent at ~2x scan-cost)
        def body(carry, inp):
            best_d, best_i = carry
            tile_idx, tile_xs = inp
            d = dist_tile_fn(tile_xs)  # [Q, T]
            vals, pos = jax.lax.approx_min_k(
                d, kk, recall_target=recall_target
            )
            ids = tile_idx * tile_rows + pos.astype(jnp.int32)
            cand_d = jnp.concatenate([best_d, vals], axis=1)
            cand_i = jnp.concatenate([best_i, ids], axis=1)
            mv, mp = smallest_k(cand_d, k)
            mi = jnp.take_along_axis(cand_i, mp, axis=1)
            return (mv, mi), None

        init = (
            jnp.full((num_queries, k), jnp.inf, jnp.float32),
            jnp.full((num_queries, k), -1, jnp.int32),
        )
        tile_indices = jnp.arange(n_tiles, dtype=jnp.int32)
        (best_d, best_i), _ = jax.lax.scan(
            body, init, (tile_indices, xs)
        )
        best_i = jnp.where(jnp.isinf(best_d), -1, best_i)
        return best_d, best_i

    if topk_impl != "exact":
        raise ValueError(f"unknown topk impl {topk_impl!r}")

    def body(carry, inp):
        best_d, best_i = carry
        tile_idx, tile_xs = inp
        d = dist_tile_fn(tile_xs)  # [Q, T]
        row_ids = tile_idx * tile_rows + jax.lax.broadcasted_iota(
            jnp.int32, (num_queries, tile_rows), 1
        )
        cand_d = jnp.concatenate([best_d, d], axis=1)
        cand_i = jnp.concatenate([best_i, row_ids], axis=1)
        vals, pos = smallest_k(cand_d, k)
        ids = jnp.take_along_axis(cand_i, pos, axis=1)
        return (vals, ids), None

    init = (
        jnp.full((num_queries, k), jnp.inf, jnp.float32),
        jnp.full((num_queries, k), -1, jnp.int32),
    )
    tile_indices = jnp.arange(n_tiles, dtype=jnp.int32)
    (best_d, best_i), _ = jax.lax.scan(body, init, (tile_indices, xs))
    return best_d, best_i


def ivf_block_rescore(
    queries: jax.Array,  # [Q, D] f32 (rotated/normalized residual basis)
    q_norms: jax.Array,  # [Q] f32 ||q||^2 (precomputed by the callers)
    codebooks: jax.Array,  # [m, K, dsub] f32 residual codebooks
    codes_t: jax.Array,  # [m, Npad] kernel code operand (i8 offset or uint)
    rc: jax.Array,  # [Npad] f32 residual reconstruction norms
    cand_vals: jax.Array,  # [Q, F] block-min values (inf = invalid slot)
    cand_rows: jax.Array,  # [Q, F] padded-layout row ids of the winners
    cand_gt: jax.Array,  # [Q, F] per-candidate group term (already selected)
    *,
    bounds,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Exact f32 ADC re-rank of IVF fused-kernel block winners.

    The one epilogue shared by the single-chip pallas strategy
    (``models/ivf.py``) and its per-shard twin (``parallel/index.py``) —
    the expanded residual distance ``||q||^2 + rc + group_term - 2<q,
    dec(row)>`` recomputed at HIGHEST precision for the over-fetched
    candidates, so block-min granularity and bf16 matmul noise cannot
    reorder the final top-k. Returns ``([Q, k] exact dists, [Q, k]
    re-ranked padded-layout rows)``.
    """
    num_q, fetch = cand_rows.shape
    m, _, dsub = codebooks.shape
    invalid = jnp.isinf(cand_vals)
    safe = jnp.where(invalid, 0, cand_rows)
    sel = jnp.take(codes_t, safe.reshape(-1), axis=1)  # [m, Q*F]
    if codes_t.dtype == jnp.int8:  # undo the offset encoding
        sel = sel.astype(jnp.int32) + 128
    sel = jnp.transpose(sel.astype(jnp.int32), (1, 0))  # [Q*F, m]
    # exact residual decode via the one-hot MXU formulation (the 3-axis
    # LUT gather lowers to ~7 ms of scalar gathers on TPU; one-hot x f32
    # codebook is exact and ~0.2 ms — same trick as rescore_exact)
    dec = decode_tile(
        codebooks.astype(jnp.float32), sel, "auto", "highest"
    ).reshape(num_q, fetch, m * dsub)
    qs = split_subspaces(queries, bounds, dsub)  # [m, Q, dsub]
    q_pad = jnp.transpose(qs, (1, 0, 2)).reshape(num_q, m * dsub)
    ip = jnp.einsum(
        "qd,qfd->qf",
        q_pad,
        dec,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Q, F]
    exact = q_norms[:, None] + jnp.take(rc, safe) + cand_gt - 2.0 * ip
    exact = jnp.where(invalid, jnp.inf, exact)
    best, pos2 = smallest_k(exact, min(k, fetch))
    rows = jnp.take_along_axis(cand_rows, pos2, axis=1)
    return best, rows


@functools.partial(jax.jit, static_argnames=("bounds", "k", "packed_width"))
def rescore_exact(
    queries: jax.Array,  # [Q, D] f32
    codebooks: jax.Array,  # [m, K, dsub] f32
    codes: jax.Array,  # [N, m] uint (or [N, B] packed uint8, see packed_width)
    recon_norms: jax.Array,  # [N] f32
    cand_ids: jax.Array,  # [Q, C] i32 candidate rows (-1 = empty slot)
    *,
    bounds,
    k: int,
    packed_width: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Exact f32 ADC rescore of per-query candidate sets.

    The fast scans (fused Pallas kernel, cached bf16 scan) rank with bf16
    matmuls whose ~1e-2 relative noise can reorder tightly-clustered
    corpora. Standard ANN practice applies: over-fetch candidates from the
    approximate scan, then rescore the handful of survivors exactly. Cost
    is O(Q * C * D) — noise-free top-k at a rounding error's price.

    Returns ([Q, k] exact dists ascending, [Q, k] ids).
    """
    num_q, c = cand_ids.shape
    m, _, dsub = codebooks.shape
    safe = jnp.maximum(cand_ids, 0)
    gathered = codes[safe.reshape(-1)]  # [Q*C, m] (or packed [Q*C, B])
    if packed_width:
        flat = unpack_tile(gathered, m, packed_width)
    else:
        flat = gathered.astype(jnp.int32)
    # exact decode via the one-hot MXU formulation at HIGHEST precision
    # (one-hot x f32 codebook is exact; scalar gathers here cost ~3 ms/batch
    # on TPU, the one-hot matmul ~0.1 ms). "auto" falls back to gathers
    # only for very large codebooks where the one-hot operand won't fit.
    dec = decode_tile(codebooks, flat, "auto", "highest").reshape(
        num_q, c, m * dsub
    )
    qs = split_subspaces(queries, bounds, dsub)
    q_pad = jnp.transpose(qs, (1, 0, 2)).reshape(num_q, m * dsub)
    ip = jnp.einsum(
        "qd,qcd->qc", q_pad, dec,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = sq_norms(queries)[:, None] + recon_norms[safe] - 2.0 * ip
    d = jnp.where(cand_ids < 0, jnp.inf, d)
    kf = min(k, c)
    vals, pos = smallest_k(d, kf)
    ids = jnp.take_along_axis(cand_ids, pos, axis=1)
    ids = jnp.where(jnp.isinf(vals), -1, ids)
    if kf < k:
        vals = jnp.pad(
            vals, ((0, 0), (0, k - kf)), constant_values=jnp.inf
        )
        ids = jnp.pad(ids, ((0, 0), (0, k - kf)), constant_values=-1)
    return vals, ids


def pack_rows(codes, width: int):
    """Pack an ``[N, m]`` code matrix to ``[N, ceil(m*width/8)]`` uint8.

    Row-major in-memory packing for sub-byte code widths (2/4 bits): the
    reference stores packed codes in RAM too (``EncodedMatrix``); here the
    packed form halves/quarters HBM at scan time, with unpacking fused into
    the distance tile (a few VPU shifts). Distinct from the *wire* layout
    (``ops/coder.py``), which is quantizer-major for format compatibility.
    """
    if width not in (2, 4):
        raise ValueError(f"in-memory packing supports widths 2/4, got {width}")
    codes = jnp.asarray(codes, jnp.uint8)
    n, m = codes.shape
    per = 8 // width
    pad = (-m) % per
    if pad:
        codes = jnp.pad(codes, ((0, 0), (0, pad)))
    grouped = codes.reshape(n, -1, per).astype(jnp.uint32)
    shifts = (jnp.arange(per, dtype=jnp.uint32) * width)[None, None, :]
    return jnp.sum(grouped << shifts, axis=2).astype(jnp.uint8)


def unpack_tile(packed: jax.Array, m: int, width: int) -> jax.Array:
    """``[T, B] uint8 -> [T, m] int32`` (inverse of :func:`pack_rows`)."""
    per = 8 // width
    mask = (1 << width) - 1
    p32 = packed.astype(jnp.int32)
    cols = []
    for s_ in range(m):
        byte = s_ // per
        shift = (s_ % per) * width
        cols.append((p32[:, byte] >> shift) & mask)
    return jnp.stack(cols, axis=1)


# Above this codebook size the one-hot operand ([T, m, K]) outweighs the
# MXU win and the gather decode takes over (16-bit codes would need a
# [T, m, 65536] temp).
_ONEHOT_MAX_K = 512


def decode_tile(
    codebooks: jax.Array,  # [m, K, dsub]
    ci: jax.Array,  # [T, m] int32
    impl: str = "auto",
    precision: str = "default",
) -> jax.Array:
    """Decode a tile of PQ codes to ``[T, m*dsub]``.

    ``"onehot"`` reformulates the codeword gather as a batched one-hot x
    codebook matmul — the decode runs on the MXU instead of the scalar
    gather unit, ~10x faster on v5e for large tiles at K <= 256. At
    ``precision="default"`` the MXU runs bf16 passes; ``"highest"`` keeps
    exact f32. ``"gather"`` is the direct formulation, always exact, and
    the only viable one for large codebooks (the one-hot operand scales
    with K). ``"auto"`` (default) picks by K.
    """
    m, K, dsub = codebooks.shape
    t = ci.shape[0]
    if impl == "auto":
        impl = "onehot" if K <= _ONEHOT_MAX_K else "gather"
    if impl == "gather":
        dec = jax.vmap(lambda cb_s, c_s: cb_s[c_s], in_axes=(0, 1))(
            codebooks, ci
        )  # [m, T, dsub]
        return jnp.transpose(dec, (1, 0, 2)).reshape(t, m * dsub)
    if impl == "onehot":
        # f32 operands + DEFAULT precision run at bf16-pass MXU throughput
        # on TPU while staying portable (CPU lacks a bf16 dot kernel).
        iota = jax.lax.broadcasted_iota(jnp.int32, (t, m, K), 2)
        onehot = (ci[:, :, None] == iota).astype(jnp.float32)
        dec = jnp.einsum(
            "tmk,mkd->tmd",
            onehot,
            codebooks,
            preferred_element_type=jnp.float32,
            precision=resolve_precision(precision),
        )
        return dec.reshape(t, m * dsub)
    raise ValueError(f"unknown decode impl {impl!r}")


@functools.partial(
    jax.jit,
    static_argnames=(
        "bounds", "k", "tile_rows", "precision", "decode_impl",
        "topk_impl", "recall_target", "packed_width",
    ),
)
def adc_scan_decode(
    queries: jax.Array,  # [Q, D] f32
    codebooks: jax.Array,  # [m, K, dsub] f32 (zero-padded subspaces)
    codes: jax.Array,  # [N, m] uint
    recon_norms: jax.Array,  # [N] f32 = ||decode(codes)||^2
    *,
    bounds,
    k: int,
    tile_rows: int = DEFAULT_TILE_ROWS,
    precision: str = "default",
    decode_impl: str = "auto",
    topk_impl: str = "approx",
    recall_target: float = 0.95,
    packed_width: int = 0,  # 0 = unpacked [N, m]; 2/4 = row-packed uint8
) -> Tuple[jax.Array, jax.Array]:
    """Decode + MXU matmul ADC scan. Returns ([Q,k] dists, [Q,k] ids)."""
    num_q = queries.shape[0]
    m, _, dsub = codebooks.shape
    tile_rows = min(tile_rows, max(codes.shape[0], 1))

    # Queries in the padded subspace layout [Q, m*dsub]; zero padding on both
    # sides keeps inner products exact.
    qs = split_subspaces(queries, bounds, dsub)  # [m, Q, dsub]
    q_pad = jnp.transpose(qs, (1, 0, 2)).reshape(num_q, m * dsub)
    qn = sq_norms(queries)

    code_tiles = _tile(codes, tile_rows)  # [n_tiles, T, m]
    norm_tiles = _tile(recon_norms, tile_rows, pad_value=jnp.inf)

    def dist_tile(inp):
        ct, xt = inp
        if packed_width:
            ci = unpack_tile(ct, m, packed_width)
        else:
            ci = ct.astype(jnp.int32)
        # [T, m*dsub] decode, amortized across the whole query batch.
        dec = decode_tile(codebooks, ci, decode_impl, precision)
        ip = jnp.matmul(
            q_pad,
            dec.T,
            preferred_element_type=jnp.float32,
            precision=resolve_precision(precision),
        )
        return qn[:, None] + xt[None, :] - 2.0 * ip

    return _streaming_topk(
        dist_tile,
        code_tiles.shape[0],
        tile_rows,
        num_q,
        k,
        (code_tiles, norm_tiles),
        topk_impl=topk_impl,
        recall_target=recall_target,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_rows", "topk_impl", "recall_target"),
)
def adc_scan_lut(
    lut: jax.Array,  # [Q, m, K] f32 = ||q_sub - c||^2
    codes: jax.Array,  # [N, m] uint
    valid_rows: jax.Array,  # [N] bool (True = scannable)
    *,
    k: int,
    tile_rows: int = DEFAULT_TILE_ROWS,
    topk_impl: str = "approx",
    recall_target: float = 0.95,
) -> Tuple[jax.Array, jax.Array]:
    """Classic LUT gather-accumulate ADC scan (``Index.scala:393-409``)."""
    num_q, m, _ = lut.shape
    tile_rows = min(tile_rows, max(codes.shape[0], 1))
    code_tiles = _tile(codes, tile_rows)
    valid_tiles = _tile(valid_rows, tile_rows, pad_value=False)
    lut_t = jnp.transpose(lut, (1, 2, 0))  # [m, K, Q]

    def dist_tile(inp):
        ct, vt = inp
        ci = ct.astype(jnp.int32)
        acc = jnp.zeros((tile_rows, num_q), jnp.float32)
        for s in range(m):
            acc = acc + lut_t[s][ci[:, s]]  # [T, Q] gather from [K, Q]
        d = acc.T
        return jnp.where(vt[None, :], d, jnp.inf)

    return _streaming_topk(
        dist_tile,
        code_tiles.shape[0],
        tile_rows,
        num_q,
        k,
        (code_tiles, valid_tiles),
        topk_impl=topk_impl,
        recall_target=recall_target,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_rows", "topk_impl", "recall_target"),
)
def cached_scan(
    q_pad: jax.Array,  # [Q, mdsub] f32 — queries in padded subspace layout
    decoded: jax.Array,  # [N, mdsub] bf16/f32 — precomputed reconstructions
    recon_norms: jax.Array,  # [N] f32 (exact, not recomputed from bf16)
    *,
    k: int,
    tile_rows: int = DEFAULT_TILE_ROWS,
    topk_impl: str = "approx",
    recall_target: float = 0.95,
) -> Tuple[jax.Array, jax.Array]:
    """ADC scan over a *cached decode* of the code matrix.

    Serving-speed mode: the PQ reconstruction is materialized once
    (typically bf16, ~2 bytes/dim) so every query batch is a pure MXU
    matmul — no per-batch decode. Results are identical to the decode scan
    up to bf16 rounding of the stored reconstructions; memory cost is
    ``2 * m * dsub`` bytes/vector instead of ``m`` code bytes.
    """
    num_q = q_pad.shape[0]
    tile_rows = min(tile_rows, max(decoded.shape[0], 1))
    qn = sq_norms(q_pad)
    dec_tiles = _tile(decoded, tile_rows)
    norm_tiles = _tile(recon_norms, tile_rows, pad_value=jnp.inf)

    def dist_tile(inp):
        dt, nt = inp
        ip = jnp.matmul(
            q_pad.astype(dt.dtype),
            dt.T,
            preferred_element_type=jnp.float32,
        )
        return qn[:, None] + nt[None, :] - 2.0 * ip

    return _streaming_topk(
        dist_tile,
        dec_tiles.shape[0],
        tile_rows,
        num_q,
        k,
        (dec_tiles, norm_tiles),
        topk_impl=topk_impl,
        recall_target=recall_target,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_rows", "precision", "topk_impl", "recall_target"),
)
def exact_scan(
    queries: jax.Array,  # [Q, D] f32
    data: jax.Array,  # [N, D] f32
    *,
    k: int,
    tile_rows: int = DEFAULT_TILE_ROWS,
    precision: str = "highest",
    topk_impl: str = "exact",
    recall_target: float = 0.95,
) -> Tuple[jax.Array, jax.Array]:
    """Brute-force squared-L2 top-k (``exactNearestNeighbours``)."""
    num_q = queries.shape[0]
    tile_rows = min(tile_rows, max(data.shape[0], 1))
    qn = sq_norms(queries)
    data_tiles = _tile(data, tile_rows)
    norm_tiles = _tile(
        sq_norms(data), tile_rows, pad_value=jnp.inf
    )

    def dist_tile(inp):
        xt, xn = inp
        ip = jnp.matmul(
            queries,
            xt.T,
            preferred_element_type=jnp.float32,
            precision=resolve_precision(precision),
        )
        return qn[:, None] + xn[None, :] - 2.0 * ip

    return _streaming_topk(
        dist_tile,
        data_tiles.shape[0],
        tile_rows,
        num_q,
        k,
        (data_tiles, norm_tiles),
        topk_impl=topk_impl,
        recall_target=recall_target,
    )
