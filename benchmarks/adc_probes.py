"""Measured-dead-end ADC kernel variants (probe harness, NOT a serving
path — the production kernel is ``gulon_tpu/ops/pallas/adc.py`` and
carries only shipping code).

Each variant here attacked the deep-shape decode floor (glove300:
m*K*N one-hot compares ~4.5 ms of 13.5 per 1024-batch) and was measured
on v5e as a null result or a regression; the ledger lives in ROADMAP.md:

- ``decode_mode="take"``   — gather table walk instead of the one-hot
  matmul (the reference's actual ADC loop, ``Index.scala:393-409``):
  38% SLOWER (dead end #7) — Mosaic's ``tpu.dynamic_gather`` is an
  intra-vreg lane shuffle, serialized per 128-lane source.
- ``decode_mode="bf16cmp"`` — one-hot compare in bf16 (2x elements per
  VPU op if native 16-bit compares existed): Mosaic-unsupported lowering
  on v5e (dead end #6); correctness-tested in interpret mode only.
- ``natural=True``         — transpose dec^T in-kernel and run the
  canonical [T, MDP] x [MDP, QT] matmul: 13.90 vs 13.51 ms/batch at
  glove300 (null, dead end #3) — the deep shape is decode-bound, not
  matmul-bound, unlike the dense kernel where the same layout change
  bought 1.7x.
- ``pipe=True``            — software-pipelined pair-of-row-tiles
  schedule ordering each decode after an independent distance matmul so
  Mosaic could overlap VPU decode with MXU passes: null (dead end #5) —
  Mosaic does not dual-issue across the program-order barrier.

Reproduce with ``python benchmarks/kernel_ab.py decode`` (each mode in a
fresh process) or call :func:`adc_scan_probe` with explicit variant
arguments. The probes reuse the production module's operand prep and
epilogue (``prepare_scan_operands`` / ``finish_scan``), so a variant's
delta is exactly the in-kernel formulation under test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gulon_tpu.ops.pallas.adc import (
    _BIG,
    _LANES,
    _block_select,
    _split_hi_lo,
    finish_scan,
    prepare_scan_operands,
)

__all__ = ["adc_scan_probe"]


def _decode_columns_probe(
    dec_ref,     # [MDP, T] bf16 scratch to fill
    codes_ref,   # [m, T'] code block (T' >= off + t)
    norms_ref,   # [2, T'] bf16 norm block
    cbT_ref,     # [m, dsub, K] bf16 (f32 in take mode)
    *,
    off: int,    # column offset into the code/norm blocks
    t: int,
    m: int,
    k_codes: int,
    dsub: int,
    decode_mode: str,
):
    """The production transposed decode plus the two probe formulations
    (bf16 compare; gather table walk)."""
    md = m * dsub
    mdp = dec_ref.shape[0]
    if mdp > md + 4:  # zero ONLY the pad rows
        dec_ref[md + 4 :, :] = jnp.zeros((mdp - md - 4, t), jnp.bfloat16)
    if decode_mode == "bf16cmp":
        # tpu.iota only emits integer vectors; build i32 and convert once
        # per tile (amortized over the m compares below)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (k_codes, t), 0).astype(
            jnp.bfloat16
        )
    else:
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (k_codes, t), 0)
    for s in range(m):
        row = codes_ref[s, pl.ds(off, t)]
        if codes_ref.dtype == jnp.int8:
            row = row.astype(jnp.int32) + 128
        elif codes_ref.dtype != jnp.int32:
            row = row.astype(jnp.int32)
        if decode_mode == "take":
            # gather the codebook columns by code (lane-axis take): the
            # table walk itself, no one-hot, no decode matmul — dsub*T
            # gathered elements per subspace vs the one-hot's K*T
            # compares. Mosaic's tpu.dynamic_gather constraints (all
            # learned by probe, see RESULTS.md):
            #   * indices/result at the SAME bitwidth (Pallas upcasts
            #     indices to i32 -> ship the codebook operand as f32 and
            #     convert to bf16 on store);
            #   * source, indices, and output SHAPES must match;
            #   * the source spans ONE 128-lane vreg along the gather
            #     dim — an intra-register lane shuffle. K=256 therefore
            #     gathers from the two 128-lane halves and selects on
            #     the code's high bit.
            cb = cbT_ref[s]  # [dsub, K] f32 in take mode
            chunk = min(k_codes, _LANES)
            assert t % chunk == 0, (t, chunk)
            n_src = -(-k_codes // _LANES)
            for c0 in range(0, t, chunk):
                # static python-slice offsets: lax.dynamic_slice_in_dim
                # emits the dynamic_slice primitive even for constant
                # starts, which Mosaic's TC lowering rejects
                rslice = row[c0 : c0 + chunk]
                idx = jnp.broadcast_to(
                    (rslice % _LANES if n_src > 1 else rslice).reshape(
                        1, chunk
                    ),
                    (dsub, chunk),
                )
                out = jnp.take_along_axis(cb[:, :chunk], idx, axis=1)
                for v in range(1, n_src):
                    gv = jnp.take_along_axis(
                        cb[:, v * _LANES : (v + 1) * _LANES], idx, axis=1
                    )
                    hit = jnp.broadcast_to(
                        (rslice // _LANES == v).reshape(1, chunk),
                        (dsub, chunk),
                    )
                    out = jnp.where(hit, gv, out)
                dec_ref[
                    s * dsub : (s + 1) * dsub, c0 : c0 + chunk
                ] = out.astype(jnp.bfloat16)
            continue
        if decode_mode == "bf16cmp":
            # bf16 holds integers <= 256 exactly; a 16-bit compare
            # lane is 2x the elements per VPU op of the i32 one
            onehotT = (
                row.astype(jnp.bfloat16).reshape(1, t) == row_iota
            ).astype(jnp.bfloat16)
        else:
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
    # the two norm rows + two ones rows (centered-mode query lanes)
    dec_ref[md : md + 2, :] = norms_ref[:, pl.ds(off, t)]
    dec_ref[md + 2 : md + 4, :] = jnp.ones((2, t), jnp.bfloat16)


def _adc_fused_kernel_probe(
    codes_ref,   # [m, T] i32 block (transposed: rows on lanes)
    norms_ref,   # [2, T] bf16 block (hi/lo split of recon norms)
    q_ref,       # [QT, MDP] bf16 block — natural mode: [MDP, QT]
    cbT_ref,     # [m, dsub, K] bf16 (whole)
    packed_ref,  # out [W*NB, QT] f32 block
    decT_ref,    # scratch [MDP, T] bf16 (persists across query tiles)
    *scratch,    # natural mode: dec_ref [T, MDP] bf16
    m: int,
    k_codes: int,
    dsub: int,
    tile_rows: int,
    winners: int = 1,
    natural: bool = False,
    interpret: bool = False,
    decode_mode: str = "base",
):
    t = tile_rows
    qt = q_ref.shape[1] if natural else q_ref.shape[0]
    qt_idx = pl.program_id(1)

    @pl.when(qt_idx == 0)
    def _():
        _decode_columns_probe(
            decT_ref, codes_ref, norms_ref, cbT_ref,
            off=0, t=t, m=m, k_codes=k_codes, dsub=dsub,
            decode_mode=decode_mode,
        )
        if natural:
            scratch[0][:] = decT_ref[:].T

    if natural:
        # canonical [T, MDP] x [MDP, QT]: zero relayouts per step; worth
        # the one per-row-tile transpose when depth spans >1 MXU pass
        lhs, rhs = scratch[0][:], q_ref[:]
        if interpret:  # XLA:CPU's DotThunk lacks canonical bf16 x bf16
            lhs, rhs = lhs.astype(jnp.float32), rhs.astype(jnp.float32)
        scores = jax.lax.dot_general(
            lhs,
            rhs,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, QT]
    else:
        scores = jax.lax.dot_general(
            decT_ref[:],
            q_ref[:],
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, QT]
    _block_select(scores, packed_ref, row0=0, t=t, qt=qt, winners=winners)


def _adc_fused_kernel_pipe(
    codes_ref,   # [m, 2T] code block for row-tile pair g
    codes_nx_ref,  # [m, 2T] block for pair g+1 (lookahead; clamped)
    norms_ref,   # [2, 2T] bf16 norms for pair g
    norms_nx_ref,  # [2, 2T] norms for pair g+1
    q_ref,       # [QT, MDP] bf16 block
    cbT_ref,     # [m, dsub, K] bf16 (whole)
    packed_ref,  # out [2*W*NB, QT] f32 block for the pair
    dec0_ref,    # scratch [MDP, T] bf16 — even tile of the pair
    dec1_ref,    # scratch [MDP, T] bf16 — odd tile
    *,
    m: int,
    k_codes: int,
    dsub: int,
    tile_rows: int,
    n_pairs: int,
    n_qt: int,
    winners: int = 1,
    decode_mode: str = "base",
):
    """Software-pipelined schedule (probe, dead end #5): each grid step
    owns a PAIR of row tiles with static scratch slots, and every decode
    after the prologue is program-ordered AFTER an independent distance
    matmul — if Mosaic dual-issued the independent VPU/MXU streams this
    would hide the decode behind the matmul. Measured null.

    Steady state entering step (g, q=0): dec0 already holds tile 2g
    (decoded during step (g-1, last q)). Schedule:
      mm(dec0) -> [q == 0] decode tile 2g+1 -> mm(dec1)
      -> [q == last] decode tile 2g+2 into dec0 (lookahead block).
    """
    t = tile_rows
    qt = q_ref.shape[0]
    nblk = t // _LANES
    g = pl.program_id(0)
    q_idx = pl.program_id(1)
    dk = dict(t=t, m=m, k_codes=k_codes, dsub=dsub, decode_mode=decode_mode)

    @pl.when(jnp.logical_and(g == 0, q_idx == 0))
    def _():  # prologue: nothing decoded tile 0 yet
        _decode_columns_probe(
            dec0_ref, codes_ref, norms_ref, cbT_ref, off=0, **dk
        )

    scores0 = jax.lax.dot_general(
        dec0_ref[:],
        q_ref[:],
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, QT]
    _block_select(scores0, packed_ref, row0=0, t=t, qt=qt, winners=winners)

    @pl.when(q_idx == 0)
    def _():  # overlappable with scores0's MXU passes
        _decode_columns_probe(
            dec1_ref, codes_ref, norms_ref, cbT_ref, off=t, **dk
        )

    scores1 = jax.lax.dot_general(
        dec1_ref[:],
        q_ref[:],
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    _block_select(
        scores1, packed_ref, row0=winners * nblk, t=t, qt=qt,
        winners=winners,
    )

    @pl.when(jnp.logical_and(q_idx == n_qt - 1, g + 1 < n_pairs))
    def _():  # lookahead: tile 2(g+1) into dec0, overlaps scores1
        _decode_columns_probe(
            dec0_ref, codes_nx_ref, norms_nx_ref, cbT_ref, off=0, **dk
        )


def _block_scan_probe(
    queries, codebooks, codes, recon_norms, *,
    bounds, tile_rows, interpret, num_rows, winners, center_scores,
    decode_mode, natural, pipe,
):
    """Probe launch: same contract as the production ``_block_scan``
    (``(packed, base_cols, qs, codes_t, pretransposed)``) with the
    variant formulations selectable."""
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

    if decode_mode == "bf16cmp" and k_codes > 256:
        decode_mode = "base"  # bf16 holds ints exactly only to 256
    if decode_mode == "take" and (
        k_codes > 256 or t % min(k_codes, _LANES) != 0
    ):
        # >2 gather sources per chunk (K > 2 vregs) or misaligned tiles
        decode_mode = "base"
    natural = natural and mdp > 128  # shallow depths: nothing to gain
    cbT = jnp.transpose(codebooks, (0, 2, 1)).astype(
        # take mode gathers the codebook (f32 values match the i32
        # gather-index bitwidth Mosaic requires); matmul modes are bf16
        jnp.float32 if decode_mode == "take" else jnp.bfloat16
    )

    if pipe and not natural:
        return _block_scan_pipe(
            codes_t, norms, q_pad, cbT, qs,
            m=m, k_codes=k_codes, dsub=dsub, mdp=mdp, qt=qt, t=t,
            num_q=num_q, winners=winners, interpret=interpret,
            decode_mode=decode_mode, pretransposed=pretransposed,
            center=center,
        )

    n_rt = codes_t.shape[1] // t
    n_qt = q_pad.shape[0] // qt
    nblk = t // _LANES
    kernel = functools.partial(
        _adc_fused_kernel_probe, m=m, k_codes=k_codes, dsub=dsub,
        tile_rows=t, winners=winners, natural=natural, interpret=interpret,
        decode_mode=decode_mode,
    )
    q_op = q_pad.astype(jnp.bfloat16)
    if natural:
        q_op = q_op.T  # [mdp, Q'] once per batch; canonical rhs in-kernel
        q_spec = pl.BlockSpec(
            (mdp, qt), lambda r, q: (0, q), memory_space=pltpu.VMEM
        )
    else:
        q_spec = pl.BlockSpec(
            (qt, mdp), lambda r, q: (q, 0), memory_space=pltpu.VMEM
        )
    scratch_shapes = [pltpu.VMEM((mdp, t), jnp.bfloat16)]
    if natural:
        scratch_shapes.append(pltpu.VMEM((t, mdp), jnp.bfloat16))
    block_p = pl.pallas_call(
        kernel,
        grid=(n_rt, n_qt),  # query axis innermost
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
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(codes_t, _split_hi_lo(norms, center), q_op, cbT)

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


def _block_scan_pipe(
    codes_t, norms, q_pad, cbT, qs, *,
    m, k_codes, dsub, mdp, qt, t, num_q, winners, interpret,
    decode_mode, pretransposed, center=0.0,
):
    """Pipelined launch (see ``_adc_fused_kernel_pipe``): pair-of-row-tiles
    grid with static scratch slots; same winner-column layout as the base
    launch, so the epilogue and ``base_cols`` math are unchanged."""
    budget = 14 * 1024 * 1024
    while t > 1024 and (
        2 * 4 * qt * t  # scores0/scores1 may coexist
        + 2 * 2 * mdp * t  # two dec scratches
        + 2 * 2 * t * k_codes  # one-hot temp
        + 2 * 4 * m * 2 * t  # current + lookahead code blocks
    ) >= budget:
        # keep the 1024-multiple invariant (winner blocks need t/128 to
        # be a sublane multiple of 8)
        t = max(1024, (t // 2) // 1024 * 1024)
    if decode_mode == "take" and t % min(k_codes, _LANES) != 0:
        # the pipe shrink can break the take alignment the pre-pipe
        # guard checked (e.g. non-power-of-two K <= 128)
        decode_mode = "base"
    pad2 = (-codes_t.shape[1]) % (2 * t)
    if pad2:
        codes_t = jnp.pad(codes_t, ((0, 0), (0, pad2)))
        norms = jnp.pad(norms, (0, pad2), constant_values=_BIG)
    n_pairs = codes_t.shape[1] // (2 * t)
    n_qt = q_pad.shape[0] // qt
    nblk = t // _LANES
    wn2 = 2 * winners * nblk

    kernel = functools.partial(
        _adc_fused_kernel_pipe, m=m, k_codes=k_codes, dsub=dsub,
        tile_rows=t, n_pairs=n_pairs, n_qt=n_qt, winners=winners,
        decode_mode=decode_mode,
    )

    def cur(g, q):
        return (0, g)

    def nxt(g, q):
        return (0, jnp.minimum(g + 1, n_pairs - 1))

    norms_hl = _split_hi_lo(norms, center)
    block_p = pl.pallas_call(
        kernel,
        grid=(n_pairs, n_qt),  # query axis innermost, like the base
        in_specs=[
            pl.BlockSpec((m, 2 * t), cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 2 * t), nxt, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2 * t), cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2 * t), nxt, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (qt, mdp), lambda g, q: (q, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # codebooks^T (whole)
        ],
        out_specs=pl.BlockSpec(
            (wn2, qt), lambda g, q: (g, q), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_pairs * wn2, q_pad.shape[0]), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((mdp, t), jnp.bfloat16),
            pltpu.VMEM((mdp, t), jnp.bfloat16),
        ],
        interpret=interpret,
    )(
        codes_t,
        codes_t,
        norms_hl,
        norms_hl,
        q_pad.astype(jnp.bfloat16),
        cbT,
    )

    # identical winner-column geometry to the base launch with
    # n_rt = 2 * n_pairs consecutive row tiles
    wn = winners * nblk
    cols = np.arange(2 * n_pairs * wn, dtype=np.int64)
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


@functools.partial(
    jax.jit,
    static_argnames=(
        "bounds", "k", "tile_rows", "interpret", "num_rows", "rescore",
        "winners", "center_scores", "decode_mode", "natural", "pipe",
    ),
)
def adc_scan_probe(
    queries, codebooks, codes, recon_norms, *,
    bounds,
    k: int,
    tile_rows: int = 0,
    interpret: bool = False,
    num_rows: int = 0,
    rescore: bool = False,
    winners: int = 1,
    center_scores: bool = False,
    decode_mode: str = "base",  # base | bf16cmp | take
    natural: bool = False,
    pipe: bool = False,
):
    """Probe-variant ADC scan: ``adc_scan_pallas`` semantics with the
    dead-end in-kernel formulations selectable as explicit static
    arguments (cache keys reflect every knob — no env-at-trace-time)."""
    if not 1 <= winners <= 4:
        raise ValueError(f"winners must be in 1..4, got {winners}")
    n = num_rows if num_rows > 0 else codes.shape[0]
    if k > _LANES:
        raise ValueError(f"pallas ADC kernel supports k <= 128, got {k}")
    kk = min(k, n)
    if n < 256 * kk:
        raise ValueError(
            f"pallas ADC kernel needs corpus >= 256*k rows (n={n}, k={kk})"
        )
    packed, base_cols, qs, codes_t, pretransposed = _block_scan_probe(
        queries, codebooks, codes, recon_norms,
        bounds=bounds, tile_rows=tile_rows, interpret=interpret,
        num_rows=num_rows, winners=winners, center_scores=center_scores,
        decode_mode=decode_mode, natural=natural, pipe=pipe,
    )
    return finish_scan(
        packed, base_cols, qs, codes_t, pretransposed,
        queries=queries, codebooks=codebooks, codes=codes,
        k=k, kk=kk, rescore=rescore, centered=center_scores,
    )
