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
exceeds one 128-wide MXU pass. (The ADC kernel adopts the same orientation
for deep contractions via an in-kernel dec^T transpose.)

v2 fuses the score epilogue into the matmul: ``prepare_data`` appends two
lanes holding a hi/lo bf16 split of each row's ``||x||^2`` (recovered to
~2^-17 relative by the f32 accumulator) and the query operand is scaled by
-2 with unit entries facing the norm lanes — the matmul emits
``||x||^2 - 2<x, q>`` directly, deleting the per-element ``norms - 2*ipt``
VPU passes that bounded v1 alongside the selection.

Selection granularity is one winner per 128-row block (identical to the
ADC kernel / ``approx_min_k``), found by the same lane-packed float min
as the v7 ADC kernel (row-in-block in the 7 low mantissa bits; one
sublane min, one packed output array, ids decoded from column + lane in
the epilogue). The ``rescore`` option re-ranks an over-fetched candidate
set. By default candidates are re-ranked from the
bf16 operand already in HBM via ``norms + ||q||^2 - 2<x, q>`` (one gather
+ one small MXU contraction — no ``[Q, F, D]`` f32 broadcast-subtract
round-trips, no second f32 copy of the corpus); passing ``rescore_rows``
upgrades the re-rank to exact f32 rows. Block-collision repair (the reason
rescore exists) is identical in both; the f32 path additionally removes
the ~2^-9 bf16 operand rounding from reported distances.

``prepare_data`` pads D+2 up to a sublane multiple of 8 and converts to
bf16; N pads to the row-tile multiple inside the wrapper (padding rows
carry a huge norm so they can never win).
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


def padded_dim(d: int) -> int:
    """Lane count of the kernel operand: D data lanes + 2 norm lanes,
    sublane-aligned. The norm hi/lo pair lives in the LAST two lanes."""
    return _round_up(d + 2, 8)


def _pick_tiles(num_q: int, dp: int) -> Tuple[int, int]:
    """(query tile, row tile): scores [T, QT] f32 + data block dominate."""
    budget = 14 * 1024 * 1024
    qt = min(_round_up(num_q, 16), 1024)
    for t in (4096, 2048, 1024):
        work = 4 * qt * t + 2 * t * dp + 2 * qt * dp
        if work < budget:
            return qt, t
    return qt, 1024


def _dense_kernel(data_ref, qT_ref, packed_ref, *, tile_rows: int):
    t = tile_rows
    qt = qT_ref.shape[1]
    nblk = t // _LANES

    # canonical [T, Dp] x [Dp, QT]: the matmul IS ||x||^2 - 2<x, q> (the
    # norm lanes of data against the unit lanes of the -2-scaled queries)
    scores = jax.lax.dot_general(
        data_ref[:],
        qT_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # lane-packed selection (see ops/pallas/adc.py): the row-in-block
    # rides the 7 low mantissa bits, one sublane float-min per block —
    # no eq/where re-match and half the winner bytes out. A NaN score
    # keeps its quiet bit through the masking, propagates through the
    # min, and fails the >= _INVALID_MIN check downstream like any
    # garbage-in value; its lane bits stay in-block (no id aliasing).
    s3 = scores.reshape(nblk, _LANES, qt)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (nblk, _LANES, qt), 1)
    packed3 = jax.lax.bitcast_convert_type(
        (jax.lax.bitcast_convert_type(s3, jnp.int32) & jnp.int32(~127))
        | lane_iota,
        jnp.float32,
    )
    packed_ref[:] = jnp.min(packed3, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_rows", "interpret", "rescore"),
)
def dense_scan_pallas(
    queries: jax.Array,  # [Q, D] f32
    data: jax.Array,  # [N', Dp] bf16 natural layout (see prepare_data)
    norms: jax.Array,  # [N] f32 = ||x||^2 per row (rescore re-rank term)
    *,
    k: int,
    tile_rows: int = 0,
    interpret: bool = False,
    rescore_rows: Optional[jax.Array] = None,  # [N, D] f32: exact rescore
    rescore: int = 0,  # >0: over-fetch rescore*k block winners, re-rank
) -> Tuple[jax.Array, jax.Array]:
    """Fused exact scan. Returns ([Q, k] squared-L2 asc, [Q, k] row ids)."""
    num_q, d = queries.shape
    n, dp = data.shape
    if dp != padded_dim(d):
        raise ValueError(
            f"data trailing dim must be padded_dim(D) = {padded_dim(d)} "
            f"(D data lanes + 2 norm lanes, 8-aligned), got {dp}"
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

    # augmented query operand: -2-scaled data lanes, unit norm lanes
    q_aug = jnp.concatenate(
        [
            -2.0 * queries,
            jnp.zeros((num_q, dp - d - 2), queries.dtype),
            jnp.ones((num_q, 2), queries.dtype),
        ],
        axis=1,
    )
    q_pad = q_aug
    q_npad = (-num_q) % qt
    if q_npad:
        q_pad = jnp.pad(q_pad, ((0, q_npad), (0, 0)))
    qT = q_pad.astype(jnp.bfloat16).T  # [Dp, Q'] one relayout per batch

    dt = data
    if n % t:
        # padding rows: zero data lanes but a huge norm lane, so their
        # score is ~_BIG and they can never win a block
        pad = jnp.zeros(((-n) % t, dp), data.dtype)
        pad = pad.at[:, dp - 2].set(jnp.asarray(_BIG, data.dtype))
        dt = jnp.concatenate([dt, pad], axis=0)
    n_rt = dt.shape[0] // t
    n_qt = qT.shape[1] // qt
    nblk = t // _LANES

    kernel = functools.partial(_dense_kernel, tile_rows=t)
    block_p = pl.pallas_call(
        kernel,
        grid=(n_rt, n_qt),
        in_specs=[
            pl.BlockSpec((t, dp), lambda r, q: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, qt), lambda r, q: (0, q),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nblk, qt), lambda r, q: (r, q),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_rt * nblk, qT.shape[1]), jnp.float32
        ),
        interpret=interpret,
    )(dt, qT)

    packed = block_p.T[:num_q]
    fetch = min(max(kk, rescore * kk if rescore else kk), _LANES)
    fetch = min(fetch, packed.shape[1])
    # strip the lane bits FIRST and rank the masked values with an EXACT
    # top-k: equal-score winners then tie-break by column = block =
    # ascending row ids, matching the reference heap's keep-earliest-row
    # semantics (``TopKHeap.scala:69-79``). Ranking the packed floats
    # directly breaks ties by lane (DESCENDING for negative scores) —
    # measured 11% of distance-cutoff recall on tie-heavy corpora in the
    # ADC twin of this epilogue. An approx_min_k fetch would also lose
    # ~5% of the over-fetched set the rescore below exists to exploit,
    # while exact top-k over [Q, N/128] winners costs 0.012 ms/1024-batch
    # (kernel_ab) — noise against the multi-ms scan.
    bits_all = jax.lax.bitcast_convert_type(packed, jnp.int32)
    vals_all = jax.lax.bitcast_convert_type(
        bits_all & jnp.int32(~127), jnp.float32
    )
    best_v, pos = smallest_k(vals_all, fetch)
    lanes = jnp.take_along_axis(bits_all & 127, pos, axis=1)
    best_ids = pos * _LANES + lanes  # column c covers rows c*128..
    invalid = best_v >= _INVALID_MIN

    qn = sq_norms(queries)
    if rescore:
        safe = jnp.where(invalid, 0, best_ids)
        if rescore_rows is not None:
            # exact f32 re-rank: ||x||^2 + ||q||^2 - 2<x, q> with f32 rows
            # and full-precision contraction — no [Q, F, D] broadcast-
            # subtract materialization (the v1 formulation's real cost)
            rows = rescore_rows[safe]  # [Q, F, D] f32 gather
            ip = jax.lax.dot_general(
                rows,
                queries,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [Q, F]
            exact = norms[safe] + qn[:, None] - 2.0 * ip
        else:
            # re-rank from the bf16 operand already in HBM (half the gather
            # bytes, no f32 corpus copy): rows carry their own hi/lo norm
            # lanes, so rows . q_aug = ||x||^2 - 2<x, q> directly
            rows = jnp.take(data, safe, axis=0)  # [Q, F, Dp] bf16
            exact = jax.lax.dot_general(
                rows,
                q_aug.astype(jnp.bfloat16),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) + qn[:, None]
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


def prepare_data(data, norms: Optional[jax.Array] = None) -> jax.Array:
    """Augmented natural-layout bf16 operand: ``[N, D] ->
    [N, padded_dim(D)]`` with a hi/lo bf16 split of each row's ``||x||^2``
    in the last two lanes (see the module docstring).

    Runs entirely device-side: ``data`` may be a device array (a host
    round-trip of a multi-GB corpus through a remote-TPU transport costs
    minutes). Pass ``norms`` to reuse precomputed ``||x||^2``."""
    x = jnp.asarray(data)
    n, d = x.shape
    dp = padded_dim(d)
    if norms is None:
        xf = x.astype(jnp.float32)
        norms = jnp.einsum(
            "nd,nd->n", xf, xf,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    # clamp +inf padding norms (the sharded paths' convention) to _BIG:
    # inf would make lo = inf - inf = NaN, and a NaN score PASSES the
    # kernel's >= _INVALID_MIN padding check, poisoning its whole
    # 128-row block min with a valid-looking result
    norms = jnp.minimum(norms, jnp.float32(_BIG))
    hi = norms.astype(jnp.bfloat16)
    lo = (norms - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = jnp.zeros((n, dp), jnp.bfloat16)
    out = out.at[:, :d].set(x.astype(jnp.bfloat16))
    out = out.at[:, dp - 2].set(hi)
    out = out.at[:, dp - 1].set(lo)
    return out


def prepare_data_t(data) -> jax.Array:  # pragma: no cover - legacy alias
    """Deprecated: the kernel now takes the natural layout; use
    :func:`prepare_data`."""
    return prepare_data(data)


# ---------------------------------------------------------------------------
# int8 variant: 2x MXU throughput for the MXU-bound deep-shape cached scans
# ---------------------------------------------------------------------------

_N14_MAX = 127 * 127 + 126  # base-127 two-lane integer range


class DenseI8Meta:
    """Static dequantization metadata for the int8 dense operand.

    ``scale`` is the shared symmetric step of the data AND query lanes
    (``x_i8 = round(x/scale)``, ``q_i8 = round(-q/scale)``), ``nmean``
    the norm centering constant. A kernel score ``v`` dequantizes to
    ``v * 2*scale^2 + ||q||^2 + nmean`` (see :func:`prepare_data_i8`).
    Hashable + comparable so it can ride a jit static argument.
    """

    __slots__ = ("scale", "nmean", "d", "dp", "gain")

    def __init__(
        self, scale: float, nmean: float, d: int, dp: int, gain: int = 1
    ):
        self.scale = float(scale)
        self.nmean = float(nmean)
        self.d = int(d)
        self.dp = int(dp)
        self.gain = int(gain)

    def _key(self):
        return (self.scale, self.nmean, self.d, self.dp, self.gain)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return (
            isinstance(other, DenseI8Meta) and self._key() == other._key()
        )


def padded_dim_i8(d: int) -> int:
    """Lane count of the int8 operand: D data lanes + 2 norm lanes,
    32-aligned (the int8 sublane tile of the transposed query block)."""
    return _round_up(d + 2, 32)


def prepare_data_i8(data, norms: Optional[jax.Array] = None):
    """Quantize a corpus (or decoded cache) into the int8 kernel operand.

    Returns ``(data_i8 [N, padded_dim_i8(D)] int8, meta, norms f32)``.

    The whole score rides the int8 matmul — no per-element epilogue:

    - data lanes: ``round(x / s)`` with the global symmetric step
      ``s = max|x| / 127``;
    - two norm lanes hold the base-127 digit pair of
      ``n_int = round((||x||^2 - mean) / (2 s^2 g))`` (range +-16255),
      facing CONSTANT query lanes ``(127, 1)`` — their matmul
      contribution is exactly ``n_int``, the centered-norm term in score
      units. Centering (the same trick as the ADC kernel's centered
      scores) shrinks the range; the integer ``gain g >= 1`` coarsens
      the score unit to ``2 s^2 g`` when the deviation still does not
      fit two digits;
    - query lanes: ``round(-q / (s g))`` (clipped; out-of-distribution
      queries saturate and degrade gracefully — the rescore re-ranks).
      Only the QUERY side coarsens with g; data lanes keep the full
      int8 step s.

    So ``score_i32 ~= (||x||^2 - mean - 2<q,x>) / (2 s^2 g)`` and
    ordering matches ADC distance ordering per query. Raises ValueError
    for corpora needing g > 64 (wild-norm: use the bf16 kernel).
    """
    x = jnp.asarray(data)
    n, d = x.shape
    dp = padded_dim_i8(d)
    xf = x.astype(jnp.float32)
    if norms is None:
        norms = jnp.einsum(
            "nd,nd->n", xf, xf,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    norms = jnp.minimum(norms, jnp.float32(_BIG))
    s = float(jnp.max(jnp.abs(xf))) / 127.0
    s = max(s, 1e-30)
    nmean = float(jnp.mean(norms))
    dev_max = float(jnp.max(jnp.abs(norms - nmean)))
    gain = max(1, int(np.ceil(dev_max / (2.0 * s * s * _N14_MAX))))
    if gain > 64:
        raise ValueError(
            f"norm deviation range {dev_max:.3g} needs gain {gain} > 64 "
            f"(query step would coarsen {gain}x); use the bf16 dense "
            "kernel for this corpus"
        )
    unit = 2.0 * s * s * gain
    n_int = jnp.clip(
        jnp.round((norms - nmean) / unit), -_N14_MAX, _N14_MAX
    ).astype(jnp.int32)
    hi = jnp.floor_divide(n_int, 127)
    lo = n_int - hi * 127  # in [0, 126]
    out = jnp.zeros((n, dp), jnp.int8)
    out = out.at[:, :d].set(
        jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    )
    out = out.at[:, dp - 2].set(hi.astype(jnp.int8))
    out = out.at[:, dp - 1].set(lo.astype(jnp.int8))
    return out, DenseI8Meta(s, nmean, d, dp, gain), norms


def _dense_kernel_i8(data_ref, qT_ref, packed_ref, *, tile_rows: int):
    t = tile_rows
    qt = qT_ref.shape[1]
    nblk = t // _LANES

    # [T, Dp] i8 x [Dp, QT] i8 -> i32: the matmul IS the centered score
    # (norm digit lanes against the constant (127, 1) query lanes)
    scores = jax.lax.dot_general(
        data_ref[:],
        qT_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # v7 lane packing in the INT domain: (score & ~127) | lane coarsens
    # toward -inf (two's complement) and keeps integer ordering, so one
    # sublane int-min per 128-row block yields a self-identifying winner
    s3 = scores.reshape(nblk, _LANES, qt)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (nblk, _LANES, qt), 1)
    packed_ref[:] = jnp.min(
        (s3 & jnp.int32(~127)) | lane_iota, axis=1
    )


@functools.partial(
    jax.jit,
    static_argnames=("meta", "k", "tile_rows", "interpret", "rescore"),
)
def dense_scan_pallas_i8(
    queries: jax.Array,  # [Q, D] f32
    data_i8: jax.Array,  # [N', Dp] int8 (prepare_data_i8 layout)
    meta: DenseI8Meta,
    norms: jax.Array,  # [N] f32 (rescore term + reported distances)
    *,
    k: int,
    tile_rows: int = 0,
    interpret: bool = False,
    rescore_rows: Optional[jax.Array] = None,  # [N, D]: exact re-rank
    #   rows (f32/bf16 — removes the int8 data rounding entirely)
    rescore: int = 0,  # >0: over-fetch rescore*k winners, re-rank from
    #   rescore_rows if given, else the dequantized int8 rows + f32
    #   norms (removes the norm-digit and lane-pack coarsening; the
    #   data lanes' own int8 rounding remains, ~0.4% of |x| / element)
) -> Tuple[jax.Array, jax.Array]:
    """Fused exact scan over the int8 operand (2x MXU rate vs bf16).

    Returns ([Q, k] squared-L2 asc, [Q, k] row ids). Same selection
    granularity as :func:`dense_scan_pallas` (one winner per 128-row
    block). Distances are dequantized kernel scores (coarsened by the
    lane packing and the 2 s^2 norm step) unless ``rescore`` re-ranks.
    """
    num_q, d = queries.shape
    n, dp = data_i8.shape
    if d != meta.d or dp != meta.dp:
        raise ValueError(
            f"operand/meta mismatch: data {(n, dp)}, queries D={d}, "
            f"meta (d={meta.d}, dp={meta.dp})"
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

    # query operand: -q/(s g) data lanes (clipped), (127, 1) digit lanes
    qi = jnp.clip(
        jnp.round(
            -queries.astype(jnp.float32) / (meta.scale * meta.gain)
        ),
        -127,
        127,
    )
    q_aug = jnp.concatenate(
        [
            qi,
            jnp.zeros((num_q, dp - d - 2), jnp.float32),
            jnp.full((num_q, 1), 127.0, jnp.float32),
            jnp.ones((num_q, 1), jnp.float32),
        ],
        axis=1,
    )
    q_pad = q_aug
    q_npad = (-num_q) % qt
    if q_npad:
        q_pad = jnp.pad(q_pad, ((0, q_npad), (0, 0)))
    qT = q_pad.astype(jnp.int8).T  # [Dp, Q']

    dt = data_i8
    if n % t:
        # padding rows: zero data lanes and a maximal norm digit pair —
        # they can only win all-terrible blocks, and the epilogue masks
        # ids >= n regardless
        pad = jnp.zeros(((-n) % t, dp), jnp.int8)
        pad = pad.at[:, dp - 2].set(jnp.int8(127))
        pad = pad.at[:, dp - 1].set(jnp.int8(126))
        dt = jnp.concatenate([dt, pad], axis=0)
    n_rt = dt.shape[0] // t
    n_qt = qT.shape[1] // qt
    nblk = t // _LANES

    kernel = functools.partial(_dense_kernel_i8, tile_rows=t)
    block_p = pl.pallas_call(
        kernel,
        grid=(n_rt, n_qt),
        in_specs=[
            pl.BlockSpec((t, dp), lambda r, q: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, qt), lambda r, q: (0, q),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nblk, qt), lambda r, q: (r, q),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_rt * nblk, qT.shape[1]), jnp.int32
        ),
        interpret=interpret,
    )(dt, qT)

    packed = block_p.T[:num_q]  # [Q, NB] i32
    fetch = min(max(kk, rescore * kk if rescore else kk), _LANES)
    fetch = min(fetch, packed.shape[1])
    # strip lane bits first, rank masked values with an exact top-k so
    # score ties break by block = ascending row region (same epilogue
    # contract as the bf16 kernel / reference heap semantics)
    vals_all = packed & jnp.int32(~127)
    best_v, pos = smallest_k(vals_all, fetch)
    lanes = jnp.take_along_axis(packed & 127, pos, axis=1)
    best_ids = pos * _LANES + lanes
    invalid = best_ids >= n  # padding rows (no sentinel range in i32)

    qn = sq_norms(queries)
    unit = jnp.float32(2.0 * meta.scale * meta.scale * meta.gain)
    if rescore:
        safe = jnp.where(invalid, 0, best_ids)
        if rescore_rows is not None:
            rows = rescore_rows[safe].astype(jnp.float32)  # [Q, F, D]
            row_norms = norms[safe]  # exact ||x||^2 of exact rows
        else:
            rows = jnp.take(data_i8, safe, axis=0)[
                ..., : meta.d
            ].astype(jnp.float32) * jnp.float32(
                meta.scale
            )  # [Q, F, D] dequantized
            # norms of the DEQUANTIZED rows, not the exact f32 norms:
            # mixing exact norms with int8 inner products yields values
            # that are not the squared distance of any vector pair (can
            # go slightly negative for self-queries, ADVICE r4). This
            # way the reported distance is exactly
            # ||q - dequant(x)||^2 (within f32 rounding).
            row_norms = jnp.sum(rows * rows, axis=2)  # [Q, F]
        ip = jax.lax.dot_general(
            rows,
            queries.astype(jnp.float32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # [Q, F]
        exact = row_norms + qn[:, None] - 2.0 * ip
        exact = jnp.where(invalid, jnp.inf, exact)
        best_d, pos2 = smallest_k(exact, kk)
        best_ids = jnp.take_along_axis(
            jnp.where(invalid, -1, best_ids), pos2, axis=1
        )
    else:
        best_d = jnp.where(
            invalid,
            jnp.inf,
            best_v.astype(jnp.float32) * unit
            + qn[:, None]
            + jnp.float32(meta.nmean),
        )
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
