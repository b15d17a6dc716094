"""Fused Pallas dense (exact) scan: block-min over a streamed bf16 matrix.

The decode-free sibling of the ADC kernel (``ops/pallas/adc.py``): per grid
step one MXU matmul scores a row tile of the bf16 data matrix against a
query tile, and the same min-then-match sublane reduction emits one
(value, row) winner per 128-row block. Serves two roles:

- exact brute-force search over raw vectors (``ExactIndex``; the role of
  the reference's ``exactNearestNeighbours``, ``Index.scala:209-229``) —
  the XLA ``exact_scan`` materializes [Q, T] distance tiles through HBM and
  runs ~5x off the matmul bound at the fasttext shape; this kernel keeps
  the scores in VMEM;
- scans over any precomputed reconstruction (bf16 decoded matrices).

Layout (measured on v5e at 2M x 304): the data operand stays in its
NATURAL ``[N, Dp]`` row-major layout and the *queries* are transposed to
``[Dp, QT]`` once per batch, so the distance matmul is the canonical
``lhs [T, K] x rhs [K, QT]`` with zero per-step relayouts — 144 TF/s
effective vs 85 TF/s for the transposed-data formulation (``dataT [Dp, T]``
contracted on dim 0), a 1.7x kernel speedup when the contraction depth
exceeds one 128-wide MXU pass. (The ADC kernel keeps the transposed
orientation: its decode stage manufactures ``dec^T`` in exactly that
layout and its contraction depth ``m*dsub`` is typically <= 128, where the
penalty vanishes.)

Selection granularity is one winner per 128-row block (identical to the
ADC kernel / ``approx_min_k``); the ``rescore`` option re-ranks the block
winners with exact f32 rows, making reported results exact brute force
whenever two true top-k members rarely share a block (guaranteed exact for
top-1).

``prepare_data`` pads D up to a sublane multiple of 8 and converts to
bf16; N pads to the row-tile multiple inside the wrapper.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gulon_tpu.ops.distance import sq_norms
from gulon_tpu.ops.topk import smallest_k

_BIG = 3.0e38
_INVALID_MIN = 1.0e38
_LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tiles(num_q: int, dp: int) -> Tuple[int, int]:
    """(query tile, row tile): scores [T, QT] f32 + data block dominate."""
    budget = 14 * 1024 * 1024
    qt = min(_round_up(num_q, 16), 1024)
    for t in (4096, 2048, 1024):
        work = 4 * qt * t + 2 * t * dp + 2 * qt * dp
        if work < budget:
            return qt, t
    return qt, 1024


def _dense_kernel(data_ref, norms_ref, qT_ref, vals_ref, ids_ref, *,
                  tile_rows: int):
    t = tile_rows
    qt = qT_ref.shape[1]
    nblk = t // _LANES
    rt_idx = pl.program_id(0)

    # canonical orientation: data block [T, Dp] x qT [Dp, QT] -> [T, QT]
    ipt = jax.lax.dot_general(
        data_ref[:],
        qT_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = norms_ref[:, 0].reshape(t, 1) - 2.0 * ipt
    s3 = scores.reshape(nblk, _LANES, qt)
    vmin = jnp.min(s3, axis=1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (nblk, _LANES, qt), 1)
    cand = jnp.where(s3 == vmin[:, None, :], row_iota, jnp.int32(_LANES))
    # clamp: NaN scores match nothing, leaving cand all-_LANES; without the
    # clamp the emitted id would alias the first row of the next block
    lane = jnp.minimum(jnp.min(cand, axis=1), _LANES - 1)
    blk_base = jax.lax.broadcasted_iota(jnp.int32, (nblk, qt), 0)
    vals_ref[:] = vmin
    ids_ref[:] = rt_idx * t + blk_base * _LANES + lane


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_rows", "interpret", "rescore"),
)
def dense_scan_pallas(
    queries: jax.Array,  # [Q, D] f32
    data: jax.Array,  # [N', Dp] bf16 natural layout (see prepare_data)
    norms: jax.Array,  # [N] f32 = ||x||^2 per row
    *,
    k: int,
    tile_rows: int = 0,
    interpret: bool = False,
    rescore_rows: Optional[jax.Array] = None,  # [N, D] f32 for exact rescore
    rescore: int = 0,  # >0: over-fetch rescore*k block winners, re-rank f32
) -> Tuple[jax.Array, jax.Array]:
    """Fused exact scan. Returns ([Q, k] squared-L2 asc, [Q, k] row ids)."""
    num_q, d = queries.shape
    n, dp = data.shape
    if dp % 8 or dp < d:
        raise ValueError(
            f"data trailing dim must be round_up(D, 8), got {dp}"
        )
    kk = min(k, n)
    if kk > _LANES:
        raise ValueError(f"dense kernel supports k <= 128, got {k}")
    if n < 256 * kk:
        raise ValueError(
            f"dense kernel needs n >= 256*k rows (n={n}, k={kk}); use "
            "the XLA exact_scan for small corpora"
        )

    qt, t = _pick_tiles(num_q, dp)
    if tile_rows:
        if tile_rows % 1024:
            raise ValueError(
                f"tile_rows must be a 1024-multiple, got {tile_rows}"
            )
        t = tile_rows
    if n < t:
        t = _round_up(n, 1024)

    q_pad = queries
    if dp > d:
        q_pad = jnp.pad(q_pad, ((0, 0), (0, dp - d)))
    q_npad = (-num_q) % qt
    if q_npad:
        q_pad = jnp.pad(q_pad, ((0, q_npad), (0, 0)))
    qT = q_pad.astype(jnp.bfloat16).T  # [Dp, Q'] one relayout per batch

    dt = data
    if n % t:
        dt = jnp.pad(dt, ((0, (-n) % t), (0, 0)))
    norms_p = norms.astype(jnp.float32)
    if norms_p.shape[0] < dt.shape[0]:
        norms_p = jnp.pad(
            norms_p, (0, dt.shape[0] - norms_p.shape[0]),
            constant_values=_BIG,
        )
    n_rt = dt.shape[0] // t
    n_qt = qT.shape[1] // qt
    nblk = t // _LANES

    kernel = functools.partial(_dense_kernel, tile_rows=t)
    block_v, block_i = pl.pallas_call(
        kernel,
        grid=(n_rt, n_qt),
        in_specs=[
            pl.BlockSpec((t, dp), lambda r, q: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), lambda r, q: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, qt), lambda r, q: (0, q),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nblk, qt), lambda r, q: (r, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, qt), lambda r, q: (r, q),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_rt * nblk, qT.shape[1]), jnp.float32),
            jax.ShapeDtypeStruct((n_rt * nblk, qT.shape[1]), jnp.int32),
        ),
        interpret=interpret,
    )(dt, norms_p.reshape(-1, 1), qT)

    winners_v, winners_i = block_v.T[:num_q], block_i.T[:num_q]
    fetch = min(max(kk, rescore * kk if rescore else kk), _LANES)
    fetch = min(fetch, winners_v.shape[1])
    if fetch >= 32 and winners_v.shape[1] >= 4 * fetch:
        best_v, pos = jax.lax.approx_min_k(
            winners_v, fetch, recall_target=0.95
        )
        pos = pos.astype(jnp.int32)
    else:
        best_v, pos = smallest_k(winners_v, fetch)
    best_ids = jnp.take_along_axis(winners_i, pos, axis=1)
    invalid = best_v >= _INVALID_MIN

    qn = sq_norms(queries)
    if rescore and rescore_rows is not None:
        safe = jnp.where(invalid, 0, best_ids)
        rows = rescore_rows[safe]  # [Q, fetch, D] f32 gather
        exact = jnp.sum((rows - queries[:, None, :]) ** 2, axis=-1)
        exact = jnp.where(invalid, jnp.inf, exact)
        best_d, pos2 = smallest_k(exact, kk)
        best_ids = jnp.take_along_axis(
            jnp.where(invalid, -1, best_ids), pos2, axis=1
        )
    else:
        best_d = jnp.where(invalid, jnp.inf, best_v + qn[:, None])
        best_ids = jnp.where(invalid, -1, best_ids)
        best_d, best_ids = best_d[:, :kk], best_ids[:, :kk]
    if kk < k:
        best_d = jnp.pad(
            best_d, ((0, 0), (0, k - kk)), constant_values=jnp.inf
        )
        best_ids = jnp.pad(
            best_ids, ((0, 0), (0, k - kk)), constant_values=-1
        )
    return best_d, best_ids


def prepare_data(data) -> jax.Array:
    """Natural-layout bf16 operand: ``[N, D] -> [N, round_up(D, 8)]``."""
    x = np.asarray(data, np.float32)
    n, d = x.shape
    dp = _round_up(max(d, 8), 8)
    out = np.zeros((n, dp), np.float32)
    out[:, :d] = x
    return jnp.asarray(out, jnp.bfloat16)


def prepare_data_t(data) -> jax.Array:  # pragma: no cover - legacy alias
    """Deprecated: the kernel now takes the natural layout; use
    :func:`prepare_data`."""
    return prepare_data(data)
