"""Fused Pallas ADC-scan kernel (v7: norm-fused matmul + lane-packed
block-min selection).

The XLA formulation of the ADC scan (``gulon_tpu.ops.scan.adc_scan_decode``)
materializes a one-hot decode operand in HBM per row tile, making the scan
bandwidth-bound (~15% MFU measured on v5e). This kernel keeps the whole
pipeline in VMEM, and its layout is chosen around two measured Mosaic facts
(see ``benchmarks/kernel_probe.py``):

1. **Lane relayouts are poison.** Reducing 128-lane blocks of a ``[Q, T]``
   score matrix costs >10 ms/batch in relayout+select passes. So the score
   matrix is produced *transposed* (``[T, Q]``): per-128-row block minima
   become **sublane** reductions of a contiguous view — no relayout at all.
2. **The one-hot decode matmul pays MXU padding on the row axis.** Computing
   ``dec`` directly streams T rows against a dsub-wide (lane-padded) tile.
   Computing ``dec^T = cb_s^T [dsub, K] x onehot^T [K, T]`` instead streams
   only ``dsub`` rows per subspace — ~10x fewer padded MXU passes — and
   lands ``dec^T [m*dsub, T]`` in exactly the layout the transposed distance
   matmul wants.

Selection (v7) packs the row-in-block into the 7 low mantissa bits of the
f32 score (``(bits & ~127) | lane``): float ordering still matches score
ordering within a <=2^-16 coarsening (far below the ~2^-8 bf16 operand
noise), so ONE sublane float-min per 128-row block yields a
self-identifying winner — no eq/where re-match, no second reduction, no
separate ids array in HBM (half the winner bytes out). Unlike v4's
monotone-int32 keys (~7 ops/element for sign handling), float-min needs no
monotone transform: pack costs 2 VPU ops/element and the reductions ride
the sublane axis of a contiguous view. The XLA epilogue runs one top-k
over the packed ``[Q, N/128]`` winners and decodes ids from column + lane
bits. This is the hardware-PartialReduce schedule
(what ``lax.approx_min_k`` compiles to) with decode + distances fused in
front. Version history at the headline shape (400k x 100d, PQ 8x256,
batch 1024 on v5e): v3 (packed key + exact-value second pass)
1.63 ms/batch, v4 (monotone-int single pass) 1.40, v5 (min-then-match)
1.17-1.28, v7 (lane-packed float min) **1.10 ms** (1.08 us/query).
``rescore=True`` adds an exact f32 LUT rescore of the k winners in the
epilogue (full-precision ADC distances).

v6 removes the per-element VPU epilogue from the score assembly: queries
are pre-scaled by -2 and dec^T carries two extra rows holding a hi/lo bf16
split of the reconstruction norms (recovering them to ~2^-17 relative)
against two unit query lanes — the distance matmul emits
``norms - 2<q, dec>`` directly (a latency null result in isolation — the
kernel's VPU budget is dominated by decode + selection — kept for the
cleaner score pipeline). The stage budget measured by
``benchmarks/kernel_probe.py`` deltas + ``floor_probe.py``: launch+IO
~0.04 ms, one-hot decode ~0.3, distance matmul ~0.27 (MXU bound 0.23),
selection ~0.4 (v5) -> v7's packing cuts it, epilogue ~0.2. Deep shapes
(glove300, m=16) are DECODE-bound; seven attacks on that floor were
measured and rejected (natural-layout matmul 13.9 vs 13.5 ms/batch, i8
one-hot decode 2.07 vs 1.54 ms, bf16-compare one-hot Mosaic-unsupported,
gather table walk 38% slower, software-pipelined decode null, ...) — the
probe kernels live in ``benchmarks/adc_probes.py`` and the full dead-end
ledger in ROADMAP.md. This module carries only the shipping paths.

Per grid step (row tile r, query tile q; query axis innermost):
      q == 0:  codes [m, T] -> per-subspace one-hot^T (VMEM, bf16)
               -> dec^T [m*dsub(+2), T] bf16 (MXU, persists across query
               tiles; rows md..md+1 = hi/lo norms)
      all q:   scores^T [T, QT] = dec^T' Q' (MXU, f32 accum — the matmul
               IS norms - 2<q, dec>)
               -> per-128-row-block lane-packed float min (VPU, sublane)
               -> write [T/128, QT] packed (value | row-in-block) winners.

HBM traffic per batch is the code bytes in plus ``Q * N/128`` winner pairs
out — no decoded operand ever round-trips. Measured on v5e at the headline
shape (400k x 100d, PQ 8x256, batch 1024, k=10): 0.98 ms/batch vs 3.57 ms
for the XLA decode path and 1.15 ms for the 26x-more-memory cached scan
(v4's packed-key selection: 1.40 ms).

Selection approximation: one winner per 128-row block, exactly like
``approx_min_k`` — losing a true top-k member requires two of them to land
in the same 128-row block (negligible for k << N/128; callers enforce
``N >= 256*k``). The per-query ``||q||^2`` term never enters the kernel —
it cannot change any argmin; the epilogue adds it back (or the optional
exact rescore reintroduces it via the f32 LUT).

Role counterpart of the reference's hot loop ``PQIndex.distances``
(``Index.scala:393-409``) + ``TopKHeap`` (``TopKHeap.scala:69-79``), fused.

Limits: K <= 1024 (one-hot tile must fit VMEM), k <= 128, corpus >= 256*k
rows. Callers fall back to the XLA path outside those bounds.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gulon_tpu.ops.pq import split_subspaces, _lut
from gulon_tpu.ops.distance import sq_norms
from gulon_tpu.ops.topk import smallest_k

_BIG = 3.0e38  # python float: kernels must not capture traced constants
_INVALID_MIN = 1.0e38  # values at/above this are padding, not real rows
_LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def padded_depth(m: int, dsub: int) -> int:
    """The kernel's contraction depth: ``m * dsub`` decode rows plus four
    constant rows — the hi/lo bf16 norm split and two ones rows that face
    the per-query ``||q||^2 + mean(norms)`` lanes in centered mode —
    sublane-aligned. (At the common shapes md=104/304 the alignment
    absorbs the two extra rows: same depth as the 2-row layout.)"""
    return _round_up(m * dsub + 4, 8)


def _center_default() -> bool:
    """Default for ``adc_scan_pallas``'s ``center_scores`` argument
    (env ``GULON_ADC_CENTER=0`` restores the round-3 uncentered
    convention for A/B runs). Resolved at CALL time by the un-jitted
    wrapper, so the flag is part of the jit cache key — flipping the env
    mid-process takes effect on the next call."""
    import os

    return os.environ.get("GULON_ADC_CENTER", "1") not in ("", "0")


def _pick_tiles(
    num_q: int, k_codes: int, mdp: int, winners: int = 1
) -> Tuple[int, int]:
    """(query tile, row tile) with the VMEM working set comfortable.

    Live buffers per step: the [T, QT] f32 score matrix (the block-min
    fuses its temporaries; measured, not just estimated — t=4096 at
    qt=512 runs where the old 2-copies estimate claimed it could not),
    plus a second masked copy when multiple winners re-min, the dec^T
    scratch [mdp, T] bf16, a one-hot temp [K, T] bf16, and
    double-buffered code/query blocks. Row tiles are 1024-multiples: the
    winner block [w*t/128, QT] needs a sublane-multiple-of-8 leading dim.
    """
    budget = 14 * 1024 * 1024
    qt = min(_round_up(num_q, 16), 512)
    score_copies = 2 if winners > 1 else 1
    for t in (4096, 2048, 1024):
        work = (
            4 * qt * t * score_copies
            + 2 * t * mdp
            + 2 * 2 * t * k_codes
        )
        if work < budget:
            return qt, t
    return qt, 1024


def block_layout(
    num_q: int, k_codes: int, mdp: int, n: int, tile_rows: int = 0,
    winners: int = 1,
) -> Tuple[int, int, int, int]:
    """(qt, t, n_rt, nblk) the kernel will use — for callers that need the
    winner-column layout (e.g. the IVF epilogue's column->block map).
    ``mdp`` must be :func:`padded_depth` of the quantizer config."""
    qt, t = _pick_tiles(num_q, k_codes, mdp, winners)
    if tile_rows:
        t = tile_rows
    if n < t:
        t = _round_up(n, 1024)
    n_pad = _round_up(n, t)
    return qt, t, n_pad // t, t // _LANES


def _split_hi_lo(norms: jax.Array, center=0.0) -> jax.Array:
    """``[N] f32 -> [2, N] bf16`` such that ``hi + lo ~= norms - center``
    to ~2^-17 relative — the two rows ride the fused matmul against
    unit query lanes, injecting the row constant at MXU cost instead of
    a full VPU pass over the score matrix. ``center`` (the mean norm in
    centered mode) shrinks the rows' magnitude so the split error is
    relative to the norm DEVIATION, not the norm itself.

    +inf padding norms (the sharded paths pad with inf) clamp to _BIG
    first: ``inf - inf = NaN`` would otherwise poison the split and NaN
    fails the ``>= _INVALID_MIN`` padding check downstream."""
    norms = jnp.minimum(norms, _BIG) - center
    hi = norms.astype(jnp.bfloat16)
    lo = (norms - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.stack([hi, lo])


def pack_codes_t(codes, k_codes: int) -> jax.Array:
    """Pretransposed kernel code operand ``[m, N]`` at minimal width.

    K <= 256 stores offset-encoded int8 (``code - 128``; the kernel undoes
    the offset on the [1, T] slice), K <= 32768 int16, else int32 — the
    serving layout costs m bytes/vector instead of 4m.
    """
    c = np.asarray(codes)
    if k_codes <= 256:
        return jnp.asarray((c.astype(np.int16) - 128).astype(np.int8).T)
    if k_codes <= 32768:
        return jnp.asarray(c.astype(np.int16).T)
    return jnp.asarray(c.astype(np.int32).T)


def _decode_columns(
    dec_ref,     # [MDP, T] bf16 scratch to fill
    codes_ref,   # [m, T'] code block (T' >= off + t)
    norms_ref,   # [2, T'] bf16 norm block
    cbT_ref,     # [m, dsub, K] bf16
    *,
    off: int,    # column offset into the code/norm blocks
    t: int,
    m: int,
    k_codes: int,
    dsub: int,
):
    """One row tile's transposed decode: one-hot per subspace + the two
    norm rows. (Alternative decode formulations — bf16 compares, gather
    table walk, pipelined schedules — were probed and measured as dead
    ends; they live in ``benchmarks/adc_probes.py``, ledger in
    ROADMAP.md.)"""
    md = m * dsub
    mdp = dec_ref.shape[0]
    if mdp > md + 4:  # zero ONLY the pad rows
        dec_ref[md + 4 :, :] = jnp.zeros((mdp - md - 4, t), jnp.bfloat16)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (k_codes, t), 0)
    for s in range(m):
        row = codes_ref[s, pl.ds(off, t)]
        if codes_ref.dtype == jnp.int8:
            # offset-encoded uint8 codes (code - 128 as i8): only the
            # [1, T] slice pays the widening, not the [K, T] compare
            row = row.astype(jnp.int32) + 128
        elif codes_ref.dtype != jnp.int32:
            row = row.astype(jnp.int32)
        onehotT = (row.reshape(1, t) == row_iota).astype(
            jnp.bfloat16
        )  # [K, T]
        # [dsub, K] x [K, T]: streams only dsub rows through the MXU
        dec_ref[s * dsub : (s + 1) * dsub, :] = jax.lax.dot_general(
            cbT_ref[s],
            onehotT,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
    # the two norm rows: against the queries' unit lanes the fused
    # matmul emits norms - 2<q, dec> directly — no VPU epilogue pass
    dec_ref[md : md + 2, :] = norms_ref[:, pl.ds(off, t)]
    # two ones rows facing the per-query hi/lo ``||q||^2 + mean`` lanes
    # (zero lanes in the uncentered block-scan convention — contribute 0)
    dec_ref[md + 2 : md + 4, :] = jnp.ones((2, t), jnp.bfloat16)


def _block_select(scores, packed_ref, *, row0: int, t: int, qt: int,
                  winners: int):
    """v7 lane-packed block-min selection of a [T, QT] score tile into
    ``packed_ref`` rows [row0, row0 + winners*T/128)."""
    nblk = t // _LANES
    s3 = scores.reshape(nblk, _LANES, qt)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (nblk, _LANES, qt), 1)
    packed3 = jax.lax.bitcast_convert_type(
        (jax.lax.bitcast_convert_type(s3, jnp.int32) & jnp.int32(~127))
        | lane_iota,
        jnp.float32,
    )
    if winners == 1:
        packed_ref[row0 : row0 + nblk, :] = jnp.min(packed3, axis=1)
        return
    masked = packed3
    for w in range(winners):
        vmin = jnp.min(masked, axis=1)  # [NB, QT] packed
        packed_ref[row0 + w * nblk : row0 + (w + 1) * nblk, :] = vmin
        if w + 1 < winners:
            masked = jnp.where(masked == vmin[:, None, :], _BIG, masked)


def _adc_fused_kernel(
    codes_ref,   # [m, T] i32 block (transposed: rows on lanes)
    norms_ref,   # [2, T] bf16 block (hi/lo split of recon norms)
    q_ref,       # [QT, MDP] bf16 block (-2x scaled, unit norm lanes)
    cbT_ref,     # [m, dsub, K] bf16 (whole)
    packed_ref,  # out [W*NB, QT] f32 block: (score & ~127) | row-in-block
    decT_ref,    # scratch [MDP, T] bf16 (persists across query tiles)
    *,
    m: int,
    k_codes: int,
    dsub: int,
    tile_rows: int,
    winners: int = 1,
):
    t = tile_rows
    qt = q_ref.shape[0]
    qt_idx = pl.program_id(1)

    # --- decode (transposed), once per row tile ---
    @pl.when(qt_idx == 0)
    def _():
        _decode_columns(
            decT_ref, codes_ref, norms_ref, cbT_ref,
            off=0, t=t, m=m, k_codes=k_codes, dsub=dsub,
        )

    # --- distances: the matmul IS the score (norm rows + -2-scaled q) ---
    scores = jax.lax.dot_general(
        decT_ref[:],
        q_ref[:],
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, QT]

    # --- (min, argmin) per 128-row block via lane-packed float min (v7):
    # the row-in-block fits the 7 low mantissa bits, so
    # ``(bits & ~127) | lane`` is a float whose ORDERING matches the score
    # (within a <=2^-16 coarsening, far under the bf16 operand noise) and
    # whose argmin is self-identifying. One sublane min over a contiguous
    # view — no eq/where/second-min pass (v6's min-then-match cost ~2.3
    # VPU ops per score element; this is ~2.15 with half the output bytes
    # and no ids array in HBM at all). Ties pick the smallest row-in-block
    # for positive scores (largest for negative — harmless). >1 winners:
    # min, mask the winner (its packed bits are unique in the block),
    # repeat — losing a true top-k member needs ``winners + 1`` in one
    # block.
    _block_select(scores, packed_ref, row0=0, t=t, qt=qt, winners=winners)


def prepare_scan_operands(
    queries: jax.Array,
    codebooks: jax.Array,
    codes: jax.Array,
    recon_norms: jax.Array,
    *,
    bounds,
    tile_rows: int,
    num_rows: int,
    winners: int = 1,
    center_scores: bool = False,
):
    """Operand prep shared by the production launch and the probe
    launches in ``benchmarks/adc_probes.py``: padded -2-scaled queries
    with norm/center lanes, transposed padded codes, padded norms, plus
    the (qt, t) tile geometry. Returns a dict."""
    num_q, _ = queries.shape
    m, k_codes, dsub = codebooks.shape
    pretransposed = num_rows > 0
    n = num_rows if pretransposed else codes.shape[0]
    if k_codes > 1024:
        raise ValueError(
            f"pallas ADC kernel supports K <= 1024, got {k_codes}"
        )

    mdp = padded_depth(m, dsub)  # decode rows + 4 constant rows, aligned
    if tile_rows and tile_rows % 1024:
        raise ValueError(
            f"tile_rows must be a 1024-multiple, got {tile_rows}"
        )
    qt, t, _, _ = block_layout(num_q, k_codes, mdp, n, tile_rows, winners)

    # queries in the padded subspace layout, scaled by -2 so the fused
    # matmul emits norm - 2<q, dec> directly, with two unit lanes facing
    # the norm rows of dec^T; zero-padded to mdp.
    #
    # center_scores (the flat scan's default): the norm rows carry
    # ``norms - mean(norms)`` and two extra hi/lo lanes of
    # ``||q||^2 + mean`` face the kernel's ones rows, so the matmul emits
    # the TRUE ADC distance. Both per-row noise sources — the ~2^-17 hi/lo
    # split error and the v7 selection's 7-bit mantissa clear — then scale
    # with the distance rather than with |norms| / |score - ||q||^2|,
    # which on tie-heavy corpora (glove300) is what separated the fused
    # kernel from its own decode-scan ceiling (benchmarks/g300_bisect.py).
    md = m * dsub
    qs = split_subspaces(queries, bounds, dsub)
    q_pad = jnp.transpose(qs, (1, 0, 2)).reshape(num_q, md) * -2.0
    if center_scores:
        nf = jnp.minimum(recon_norms.astype(jnp.float32), _BIG)
        valid = nf < _INVALID_MIN
        center = jnp.sum(jnp.where(valid, nf, 0.0)) / jnp.maximum(
            jnp.sum(valid.astype(jnp.float32)), 1.0
        )
        qc = sq_norms(queries) + center  # [Q]
        qc_hi = qc.astype(jnp.bfloat16).astype(jnp.float32)
        qn_lanes = jnp.stack([qc_hi, qc - qc_hi], axis=1)  # [Q, 2]
    else:
        center = jnp.float32(0.0)
        qn_lanes = jnp.zeros((num_q, 2), q_pad.dtype)
    q_pad = jnp.concatenate(
        [
            q_pad,
            jnp.ones((num_q, 2), q_pad.dtype),
            qn_lanes.astype(q_pad.dtype),
        ],
        axis=1,
    )
    if mdp > md + 4:
        q_pad = jnp.pad(q_pad, ((0, 0), (0, mdp - md - 4)))
    q_npad = (-num_q) % qt
    if q_npad:
        q_pad = jnp.pad(q_pad, ((0, q_npad), (0, 0)))

    if pretransposed:
        codes_t = codes
        if codes_t.shape[1] % t:
            codes_t = jnp.pad(
                codes_t, ((0, 0), (0, (-codes_t.shape[1]) % t))
            )
    else:
        codes_i = codes.astype(jnp.int32)
        if n % t:
            codes_i = jnp.pad(codes_i, ((0, (-n) % t), (0, 0)))
        codes_t = codes_i.T  # [m, N']
    norms = recon_norms.astype(jnp.float32)
    if norms.shape[0] < codes_t.shape[1]:
        norms = jnp.pad(
            norms, (0, codes_t.shape[1] - norms.shape[0]),
            constant_values=_BIG,
        )
    return dict(
        q_pad=q_pad, codes_t=codes_t, norms=norms, center=center, qs=qs,
        qt=qt, t=t, mdp=mdp, pretransposed=pretransposed, num_q=num_q,
        m=m, k_codes=k_codes, dsub=dsub,
    )


def _block_scan(
    queries: jax.Array,
    codebooks: jax.Array,
    codes: jax.Array,
    recon_norms: jax.Array,
    *,
    bounds,
    tile_rows: int,
    interpret: bool,
    num_rows: int,
    winners: int = 1,
    center_scores: bool = False,
):
    """Launch the fused kernel; returns per-128-row-block winners.

    ``(packed [Q, NW], base_cols [NW] i32, qs, codes_t, pretransposed)``
    where ``packed`` holds lane-packed winner floats — value bits
    ``recon_norms[row] - 2<q, dec(row)>`` (no ``||q||^2`` term, low 7
    mantissa bits replaced by the row-in-block) and ``base_cols[c]`` is
    the first row of winner column ``c``'s block, so
    ``row = base_cols[c] + (bitcast_i32(packed) & 127)``. Values
    ``>= _INVALID_MIN`` (after masking the lane bits) mark padding.
    Use :func:`unpack_block_winners`.
    """
    ops = prepare_scan_operands(
        queries, codebooks, codes, recon_norms,
        bounds=bounds, tile_rows=tile_rows, num_rows=num_rows,
        winners=winners, center_scores=center_scores,
    )
    q_pad, codes_t, norms = ops["q_pad"], ops["codes_t"], ops["norms"]
    center, qs = ops["center"], ops["qs"]
    qt, t, mdp = ops["qt"], ops["t"], ops["mdp"]
    num_q, m = ops["num_q"], ops["m"]
    k_codes, dsub = ops["k_codes"], ops["dsub"]
    pretransposed = ops["pretransposed"]
    n_rt = codes_t.shape[1] // t
    n_qt = q_pad.shape[0] // qt
    nblk = t // _LANES

    kernel = functools.partial(
        _adc_fused_kernel, m=m, k_codes=k_codes, dsub=dsub, tile_rows=t,
        winners=winners,
    )
    q_op = q_pad.astype(jnp.bfloat16)
    q_spec = pl.BlockSpec(
        (qt, mdp), lambda r, q: (q, 0), memory_space=pltpu.VMEM
    )
    block_p = pl.pallas_call(
        kernel,
        grid=(n_rt, n_qt),  # query axis innermost: decode reused across it
        in_specs=[
            pl.BlockSpec((m, t), lambda r, q: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, t), lambda r, q: (0, r), memory_space=pltpu.VMEM),
            q_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # codebooks^T (whole)
        ],
        out_specs=pl.BlockSpec(
            (winners * nblk, qt), lambda r, q: (r, q),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_rt * winners * nblk, q_pad.shape[0]), jnp.float32
        ),
        scratch_shapes=[pltpu.VMEM((mdp, t), jnp.bfloat16)],
        interpret=interpret,
    )(
        codes_t,
        _split_hi_lo(norms, center),
        q_op,
        jnp.transpose(codebooks, (0, 2, 1)).astype(jnp.bfloat16),
    )

    # winner column c -> first row of its block (rank-major within a tile:
    # rank w of block j sits at column r*W*nblk + w*nblk + j)
    wn = winners * nblk
    cols = np.arange(n_rt * wn, dtype=np.int64)
    base_cols = ((cols // wn) * t + (cols % wn) % nblk * _LANES).astype(
        np.int32
    )
    return (
        block_p.T[:num_q],
        jnp.asarray(base_cols),
        qs,
        codes_t,
        pretransposed,
    )



def unpack_block_winners(
    packed: jax.Array, base_cols: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Lane-packed block winners -> ``([Q, NW] values, [Q, NW] row ids)``.

    Values carry the <=2^-16 lane-packing coarseness (their low 7 mantissa
    bits read as zero)."""
    bits = jax.lax.bitcast_convert_type(packed, jnp.int32)
    vals = jax.lax.bitcast_convert_type(
        bits & jnp.int32(~127), jnp.float32
    )
    ids = base_cols[None, :] + (bits & 127)
    return vals, ids


@functools.partial(
    jax.jit,
    static_argnames=(
        "bounds", "tile_rows", "interpret", "num_rows", "winners",
    ),
)
def adc_block_scan_pallas(
    queries: jax.Array,  # [Q, D] f32
    codebooks: jax.Array,  # [m, K, dsub] f32
    codes: jax.Array,  # [N, m] uint, or [m, N] i32 when num_rows is given
    recon_norms: jax.Array,  # [N] f32 (the per-row additive constant)
    *,
    bounds,
    tile_rows: int = 0,
    interpret: bool = False,
    num_rows: int = 0,
    winners: int = 1,  # ranked candidates per 128-row block (1..4)
) -> Tuple[jax.Array, jax.Array]:
    """Raw fused-kernel block winners for custom epilogues.

    Returns ``([Q, NB] values, [Q, NB] row ids)``: per 128-row block, the
    min of ``recon_norms[row] - 2<q, dec(row)>`` and its row (values carry
    the <=2^-16 lane-packing coarseness). Values ``>= _INVALID_MIN`` are
    padding. Used by the IVF pallas strategy, whose per-(query, partition)
    term is block-constant under a partition-padded row layout and
    therefore commutes with the in-kernel block min.

    NOTE: unlike :func:`adc_scan_pallas`, the raw block scan keeps the
    UNCENTERED score convention (no ``||q||^2`` term, norms not mean-
    shifted) — callers fold their own per-query/per-partition constants
    into the winners and typically repair ranking with an exact rescore
    (``ivf_block_rescore``, the sharded flat per-shard rescore).
    """
    if not 1 <= winners <= 4:
        raise ValueError(f"winners must be in 1..4, got {winners}")
    packed, base_cols, _, _, _ = _block_scan(
        queries, codebooks, codes, recon_norms,
        bounds=bounds, tile_rows=tile_rows, interpret=interpret,
        num_rows=num_rows, winners=winners,
    )
    return unpack_block_winners(packed, base_cols)


def finish_scan(
    packed: jax.Array,       # [Q, NW] lane-packed block winners
    base_cols: jax.Array,    # [NW] i32 first-row-of-block per column
    qs: jax.Array,           # [m, Q, dsub] split queries (for the rescore)
    codes_t,                 # the kernel's code operand (for the rescore)
    pretransposed: bool,
    *,
    queries: jax.Array,
    codebooks: jax.Array,
    codes: jax.Array,
    k: int,
    kk: int,
    rescore: bool,
    centered: bool,
) -> Tuple[jax.Array, jax.Array]:
    """The XLA epilogue shared by :func:`adc_scan_pallas` and the probe
    launches in ``benchmarks/adc_probes.py``: exact top-k over the block
    winners, id decode, optional exact f32 LUT rescore."""
    num_q = queries.shape[0]
    m = codebooks.shape[0]
    # Rank over the N/128 block winners: strip the lane bits FIRST
    # and rank the masked values with an EXACT top-k, so equal-score
    # winners tie-break by column = block = ascending-row-id region —
    # matching the reference heap's keep-earliest-row semantics
    # (``TopKHeap.scala:69-79``) and the exact decode scan. Ranking the
    # packed floats directly would break score ties by the lane bits
    # instead (DESCENDING lane for the negative scores this kernel
    # emits): measured on v5e at the headline shape that costs 11% of
    # distance-cutoff recall on tie-heavy corpora (0.165 vs 0.192
    # ceiling; ranking masked values measures 0.1924 — at the ceiling).
    # An approx_min_k fetch here would also lose ~5% of the over-fetched
    # set — the coverage an external rescore (FlatIndex rerank_factor)
    # exists to exploit — while exact top-k over the [Q, N/128] winners
    # measures 0.012 ms/1024-batch (kernel_ab). Ids decode from the
    # selected columns + lane bits — no [Q, NB] ids array ever exists.
    bits_all = jax.lax.bitcast_convert_type(packed, jnp.int32)
    vals_all = jax.lax.bitcast_convert_type(
        bits_all & jnp.int32(~127), jnp.float32
    )
    best_v, pos = smallest_k(vals_all, kk)
    lanes = jnp.take_along_axis(bits_all & 127, pos, axis=1)
    best_ids = jnp.take(base_cols, pos) + lanes
    invalid = best_v >= _INVALID_MIN

    if rescore:
        # Exact f32 LUT rescore of the kk winners (O(Q*kk*m) gathers + one
        # tiny LUT einsum): repairs the bf16 matmul noise, so reported
        # distances are full-precision ADC. The final ranking comes from
        # this rescore, not the in-kernel selection.
        lut = _lut(qs, codebooks.astype(jnp.float32))  # [Q, m, K] f32
        safe_ids = jnp.where(invalid, 0, best_ids)
        if pretransposed:
            sel = jnp.take(codes_t, safe_ids.reshape(-1), axis=1)
            if codes_t.dtype == jnp.int8:  # undo the offset encoding
                sel = sel.astype(jnp.int32) + 128
            sel = jnp.transpose(sel.reshape(m, num_q, kk), (1, 2, 0))
        else:
            sel = jnp.take(
                codes.astype(jnp.int32), safe_ids.reshape(-1), axis=0
            ).reshape(num_q, kk, m)
        exact = jnp.sum(
            lut[
                jnp.arange(num_q, dtype=jnp.int32)[:, None, None],
                jnp.arange(m, dtype=jnp.int32)[None, None, :],
                sel.astype(jnp.int32),
            ],
            axis=-1,
        )  # [Q, kk]
        exact = jnp.where(invalid, jnp.inf, exact)
        best_ids = jnp.where(invalid, -1, best_ids)
        best_d, pos2 = smallest_k(exact, kk)
        best_ids = jnp.take_along_axis(best_ids, pos2, axis=1)
    else:
        # kernel values (f32 coarsened <=2^-16 by the lane packing); in
        # centered mode the matmul already emitted the full distance, else
        # add the per-query ||q||^2 term here. The dominant noise is the
        # ~2^-8 bf16 operand rounding every strategy's matmul scores carry
        # (rescore=True removes it)
        if centered:
            best_d = jnp.where(invalid, jnp.inf, best_v)
        else:
            qn = sq_norms(queries)
            best_d = jnp.where(invalid, jnp.inf, best_v + qn[:, None])
        best_ids = jnp.where(invalid, -1, best_ids)
    if kk < k:
        best_d = jnp.pad(
            best_d, ((0, 0), (0, k - kk)), constant_values=jnp.inf
        )
        best_ids = jnp.pad(
            best_ids, ((0, 0), (0, k - kk)), constant_values=-1
        )
    return best_d, best_ids


@functools.partial(
    jax.jit,
    static_argnames=(
        "bounds", "k", "tile_rows", "interpret", "num_rows", "rescore",
        "winners", "center_scores",
    ),
)
def _adc_scan_pallas_jit(
    queries, codebooks, codes, recon_norms, *,
    bounds, k, tile_rows, interpret, num_rows, rescore, winners,
    center_scores,
):
    if not 1 <= winners <= 4:
        raise ValueError(f"winners must be in 1..4, got {winners}")
    n = num_rows if num_rows > 0 else codes.shape[0]
    if k > _LANES:
        raise ValueError(f"pallas ADC kernel supports k <= 128, got {k}")
    kk = min(k, n)
    # block-min selection yields one winner per 128-row block; the corpus
    # must span comfortably more blocks than k or winners are lost
    if n < 256 * kk:
        raise ValueError(
            f"pallas ADC kernel needs corpus >= 256*k rows (n={n}, k={kk}); "
            "use the XLA scan for small corpora"
        )
    packed, base_cols, qs, codes_t, pretransposed = _block_scan(
        queries, codebooks, codes, recon_norms,
        bounds=bounds, tile_rows=tile_rows, interpret=interpret,
        num_rows=num_rows, winners=winners, center_scores=center_scores,
    )
    return finish_scan(
        packed, base_cols, qs, codes_t, pretransposed,
        queries=queries, codebooks=codebooks, codes=codes,
        k=k, kk=kk, rescore=rescore, centered=center_scores,
    )


def adc_scan_pallas(
    queries: jax.Array,  # [Q, D] f32
    codebooks: jax.Array,  # [m, K, dsub] f32 (zero-padded subspaces)
    codes: jax.Array,  # [N, m] uint — or pretransposed [m, N] i32 when
    #                    num_rows is given (the relayout is query-invariant;
    #                    callers can cache it, see FlatIndex)
    recon_norms: jax.Array,  # [N] f32
    *,
    bounds,
    k: int,
    tile_rows: int = 0,  # 0 = auto
    interpret: bool = False,
    num_rows: int = 0,  # >0: codes is pretransposed [m, num_rows] i32
    rescore: bool = False,  # exact f32 LUT rescore of the k winners
    winners: int = 1,  # ranked candidates per 128-row block (1..4):
    #   >1 recovers recall in tie-heavy regimes where several of the
    #   true top-k share a block (low-intrinsic corpora collapse onto
    #   few distinct codes), at one extra min+mask pass per extra winner
    center_scores: bool = None,  # None: GULON_ADC_CENTER env (default on).
    #   Centered: the kernel emits the TRUE ADC distance (norm rows mean-
    #   shifted + per-query ||q||^2+mean lanes), so packing/split noise
    #   scales with the distance, not |norms|.
) -> Tuple[jax.Array, jax.Array]:
    """Fused-kernel ADC scan. Returns ([Q, k] dists asc, [Q, k] ids).

    A thin un-jitted wrapper: ``center_scores`` resolves from the env at
    CALL time and passes to the jitted impl as a static argument, so the
    scoring convention is part of the jit cache key (flipping the env
    mid-process affects the next call, no stale-cache surprises)."""
    if center_scores is None:
        center_scores = _center_default()
    return _adc_scan_pallas_jit(
        queries, codebooks, codes, recon_norms,
        bounds=bounds, k=k, tile_rows=tile_rows, interpret=interpret,
        num_rows=num_rows, rescore=rescore, winners=winners,
        center_scores=bool(center_scores),
    )


# tests and probe harnesses clear the underlying jit cache through the
# public name
adc_scan_pallas._clear_cache = _adc_scan_pallas_jit._clear_cache
