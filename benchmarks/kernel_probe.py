"""Bisection probe for the fused ADC kernel: times stripped-down variants
to find the dominating stage. Dev tool, not part of the benchmark suite."""

import functools
import sys
import time

import numpy as np


def main():
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from gulon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from benchmarks.common import time_device_loop

    import os

    n = int(os.environ.get("PROBE_N", 400_000))
    m = int(os.environ.get("PROBE_M", 8))
    K = 256
    dsub = int(os.environ.get("PROBE_DSUB", 13))
    mdp = int(os.environ.get("PROBE_MDP", max(-(-(m * dsub) // 8) * 8, 128)))
    num_q = 1024
    qt = int(os.environ.get("PROBE_QT", 512))
    t = int(os.environ.get("PROBE_T", 2048))
    npad = -(-n // t) * t
    n_rt, n_qt, nblk = npad // t, num_q // qt, t // 128
    _INT_BIG = 2**30

    key = jax.random.key(0)
    codes_t = jax.random.randint(key, (m, npad), 0, K, jnp.int32)
    norms = jax.random.uniform(key, (1, npad), jnp.float32)
    q_pad = jax.random.normal(key, (num_q, mdp), jnp.float32).astype(
        jnp.bfloat16
    )
    cb = jax.random.normal(key, (m, K, dsub), jnp.float32).astype(jnp.bfloat16)

    def make_tdec(variant):
        """Transposed-orientation variants (decT [mdp, T], sublane
        reductions, no lane relayout anywhere) — bisect the production
        kernel: tdec_grid (decode only) -> tdec_noselect (+ scores matmul)
        -> tdec_min (+ block-min) -> tdec_match (v5: + eq-match argmin) /
        tdec_packed (v4: packed monotone-key single pass).

        A ``:nib`` / ``:cmp8`` suffix swaps the one-hot build:
        ``nib`` builds two 16-row nibble one-hots (32*T compares) and
        outer-products them into the 256-row one-hot (256*T bf16
        multiplies) — ~35%% fewer VPU ops than 256*T compare+converts;
        ``cmp8`` runs the row-vs-iota compare at int8 width."""
        variant, _, decode_impl = variant.partition(":")

        def kern(codes_ref, normsT_ref, q_ref, cbT_ref, vals_ref, ids_ref,
                 decT_ref):
            rt_idx = pl.program_id(0)
            qt_idx = pl.program_id(1)

            if variant == "tdec_noop":
                vals_ref[:] = jnp.zeros((nblk, qt), jnp.float32)
                ids_ref[:] = jnp.zeros((nblk, qt), jnp.int32)
                return

            @pl.when(qt_idx == 0)
            def _():
                decT_ref[:] = jnp.zeros((mdp, t), jnp.bfloat16)
                if decode_impl == "nib":
                    nib_iota = jax.lax.broadcasted_iota(
                        jnp.int32, (16, t), 0
                    )
                elif decode_impl == "cmp8":
                    row_iota8 = (
                        jax.lax.broadcasted_iota(jnp.int32, (K, t), 0)
                        - 128
                    ).astype(jnp.int8)
                else:
                    row_iota = jax.lax.broadcasted_iota(jnp.int32, (K, t), 0)
                for s in range(m):
                    if decode_impl == "nib":
                        row = codes_ref[s, :].reshape(1, t)
                        oh_hi = ((row >> 4) == nib_iota).astype(
                            jnp.bfloat16
                        )  # [16, T]
                        oh_lo = ((row & 15) == nib_iota).astype(
                            jnp.bfloat16
                        )  # [16, T]
                        onehotT = (
                            oh_hi[:, None, :] * oh_lo[None, :, :]
                        ).reshape(K, t)
                    elif decode_impl == "cmp8":
                        # codes arrive offset-encoded int8; compare at i8
                        onehotT = (
                            codes_ref[s, :].reshape(1, t) == row_iota8
                        ).astype(jnp.bfloat16)
                    else:
                        onehotT = (
                            codes_ref[s, :].reshape(1, t) == row_iota
                        ).astype(jnp.bfloat16)  # [K, T]
                    # [dsub, K] x [K, T] -> [dsub, T]: M=dsub rows only
                    decT_ref[s * dsub : (s + 1) * dsub, :] = (
                        jax.lax.dot_general(
                            cbT_ref[s], onehotT,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).astype(jnp.bfloat16)
                    )

            if variant == "tdec_grid":
                vals_ref[:] = jnp.zeros((nblk, qt), jnp.float32)
                ids_ref[:] = jnp.zeros((nblk, qt), jnp.int32)
                return

            ipt = jax.lax.dot_general(
                decT_ref[:], q_ref[:],
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [T, QT]
            scores = normsT_ref[:, 0].reshape(t, 1) - 2.0 * ipt

            if variant == "tdec_noselect":
                vals_ref[:] = scores[:nblk, :]
                ids_ref[:] = jnp.zeros((nblk, qt), jnp.int32)
                return

            if variant in ("tdec_min", "tdec_match"):
                s3 = scores.reshape(nblk, 128, qt)
                vmin = jnp.min(s3, axis=1)
                if variant == "tdec_min":
                    vals_ref[:] = vmin
                    ids_ref[:] = jnp.zeros((nblk, qt), jnp.int32)
                    return
                row_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (nblk, 128, qt), 1
                )
                cand = jnp.where(
                    s3 == vmin[:, None, :], row_iota, jnp.int32(128)
                )
                lane = jnp.min(cand, axis=1)
                blk_base = jax.lax.broadcasted_iota(
                    jnp.int32, (nblk, qt), 0
                )
                vals_ref[:] = vmin
                ids_ref[:] = rt_idx * t + blk_base * 128 + lane
                return

            # pack (monotone score bits | row-in-block) into one int32 key
            bits = pltpu.bitcast(scores, jnp.int32)
            ukey = jnp.where(
                bits < 0, ~bits, bits | jnp.int32(-(2**31))
            )
            skey = ukey ^ jnp.int32(-(2**31))
            row_in_blk = (
                jax.lax.broadcasted_iota(jnp.int32, (t, qt), 0) & 127
            )
            packed = (skey & jnp.int32(~127)) | row_in_blk
            pmin = jnp.min(packed.reshape(nblk, 128, qt), axis=1)

            lane = pmin & 127
            s2 = pmin
            bits2 = jnp.where(s2 >= 0, s2, ~(s2 ^ jnp.int32(-(2**31))))
            blk_base = jax.lax.broadcasted_iota(jnp.int32, (nblk, qt), 0)
            vals_ref[:] = pltpu.bitcast(bits2, jnp.float32)
            ids_ref[:] = rt_idx * t + blk_base * 128 + lane

        @jax.jit
        def run(codes_t, norms, q_pad, cb):
            return pl.pallas_call(
                kern,
                grid=(n_rt, n_qt),
                in_specs=[
                    pl.BlockSpec((m, t), lambda r, q: (0, r),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((t, 1), lambda r, q: (r, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((qt, mdp), lambda r, q: (q, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((nblk, qt), lambda r, q: (r, q),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nblk, qt), lambda r, q: (r, q),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((n_rt * nblk, num_q), jnp.float32),
                    jax.ShapeDtypeStruct((n_rt * nblk, num_q), jnp.int32),
                ),
                scratch_shapes=[pltpu.VMEM((mdp, t), jnp.bfloat16)],
            )(
                codes_t,
                norms.reshape(-1, 1),
                q_pad,
                jnp.transpose(cb, (0, 2, 1)),  # [m, dsub, K]
            )

        if decode_impl == "cmp8":
            codes8 = jnp.asarray(
                (np.asarray(codes_t) - 128).astype(np.int8)
            )

            def wrapped(codes_t_arg, norms, q_pad, cb):
                return run(codes8, norms, q_pad, cb)

            return wrapped
        return run

    def make_cached():
        """Cached variant: dec^T [mdp, N] bf16 lives in HBM (built once);
        the kernel is scores-matmul + min-then-match selection only."""

        def kern(decT_ref, normsT_ref, q_ref, vals_ref, ids_ref):
            rt_idx = pl.program_id(0)
            ipt = jax.lax.dot_general(
                decT_ref[:], q_ref[:],
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [T, QT]
            scores = normsT_ref[:, 0].reshape(t, 1) - 2.0 * ipt
            s3 = scores.reshape(nblk, 128, qt)
            vmin = jnp.min(s3, axis=1)
            row_iota = jax.lax.broadcasted_iota(
                jnp.int32, (nblk, 128, qt), 1
            )
            cand = jnp.where(
                s3 == vmin[:, None, :], row_iota, jnp.int32(128)
            )
            lane = jnp.min(cand, axis=1)
            blk_base = jax.lax.broadcasted_iota(jnp.int32, (nblk, qt), 0)
            vals_ref[:] = vmin
            ids_ref[:] = rt_idx * t + blk_base * 128 + lane

        @jax.jit
        def run(decT_hbm, norms, q_pad):
            return pl.pallas_call(
                kern,
                grid=(n_rt, n_qt),
                in_specs=[
                    pl.BlockSpec((mdp, t), lambda r, q: (0, r),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((t, 1), lambda r, q: (r, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((qt, mdp), lambda r, q: (q, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((nblk, qt), lambda r, q: (r, q),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nblk, qt), lambda r, q: (r, q),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((n_rt * nblk, num_q), jnp.float32),
                    jax.ShapeDtypeStruct((n_rt * nblk, num_q), jnp.int32),
                ),
            )(decT_hbm, norms.reshape(-1, 1), q_pad)

        def wrapped(codes_t, norms, q_pad, cb):
            return run(wrapped.decT, norms, q_pad)

        # build dec^T once outside the timed loop
        cbf = jnp.transpose(cb, (0, 2, 1)).astype(jnp.float32)  # [m,dsub,K]
        oh = jax.nn.one_hot(codes_t, K, dtype=jnp.float32)  # [m, npad, K]
        decT = jnp.einsum("mdk,mnk->mdn", cbf, oh).reshape(m * dsub, npad)
        pad = jnp.zeros((mdp - m * dsub, npad), jnp.float32)
        wrapped.decT = jnp.concatenate([decT, pad], 0).astype(jnp.bfloat16)
        return wrapped

    def make_i8dec():
        """int8 decode variant: one-hot as s8, codebook pre-quantized to
        s8 per subspace; decode matmul runs s8xs8->s32 at 2x MXU rate,
        dequantized into the bf16 dec^T scratch."""

        def kern(codes_ref, normsT_ref, q_ref, cbT_ref, scale_ref,
                 vals_ref, ids_ref, decT_ref):
            rt_idx = pl.program_id(0)
            qt_idx = pl.program_id(1)

            @pl.when(qt_idx == 0)
            def _():
                decT_ref[:] = jnp.zeros((mdp, t), jnp.bfloat16)
                row_iota = jax.lax.broadcasted_iota(jnp.int32, (K, t), 0)
                for s in range(m):
                    onehotT = (
                        codes_ref[s, :].reshape(1, t) == row_iota
                    ).astype(jnp.int8)  # [K, T]
                    acc = jax.lax.dot_general(
                        cbT_ref[s], onehotT,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )  # [dsub, T] s32
                    decT_ref[s * dsub : (s + 1) * dsub, :] = (
                        acc.astype(jnp.float32) * scale_ref[s, 0]
                    ).astype(jnp.bfloat16)

            ipt = jax.lax.dot_general(
                decT_ref[:], q_ref[:],
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            scores = normsT_ref[:, 0].reshape(t, 1) - 2.0 * ipt
            s3 = scores.reshape(nblk, 128, qt)
            vmin = jnp.min(s3, axis=1)
            row_iota = jax.lax.broadcasted_iota(
                jnp.int32, (nblk, 128, qt), 1
            )
            cand = jnp.where(
                s3 == vmin[:, None, :], row_iota, jnp.int32(128)
            )
            lane = jnp.min(cand, axis=1)
            blk_base = jax.lax.broadcasted_iota(jnp.int32, (nblk, qt), 0)
            vals_ref[:] = vmin
            ids_ref[:] = rt_idx * t + blk_base * 128 + lane

        @jax.jit
        def run(codes_t, norms, q_pad, cb_i8, scales):
            return pl.pallas_call(
                kern,
                grid=(n_rt, n_qt),
                in_specs=[
                    pl.BlockSpec((m, t), lambda r, q: (0, r),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((t, 1), lambda r, q: (r, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((qt, mdp), lambda r, q: (q, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=(
                    pl.BlockSpec((nblk, qt), lambda r, q: (r, q),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nblk, qt), lambda r, q: (r, q),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((n_rt * nblk, num_q), jnp.float32),
                    jax.ShapeDtypeStruct((n_rt * nblk, num_q), jnp.int32),
                ),
                scratch_shapes=[pltpu.VMEM((mdp, t), jnp.bfloat16)],
            )(codes_t, norms.reshape(-1, 1), q_pad, cb_i8, scales)

        cbT = jnp.transpose(cb, (0, 2, 1)).astype(jnp.float32)  # [m,dsub,K]
        amax = jnp.max(jnp.abs(cbT), axis=(1, 2), keepdims=False)  # [m]
        scales = (amax / 127.0).reshape(m, 1)
        cb_i8 = jnp.clip(
            jnp.round(cbT / scales[:, :, None]), -127, 127
        ).astype(jnp.int8)

        def wrapped(codes_t, norms, q_pad, cb):
            return run(codes_t, norms, q_pad, cb_i8, scales)

        return wrapped

    def make(variant):
        if variant == "tdec_cached":
            return make_cached()
        if variant == "tdec_i8":
            return make_i8dec()
        if variant.startswith("tdec_"):
            return make_tdec(variant)

        def kern(codes_ref, norms_ref, q_ref, cb_ref, vals_ref, ids_ref,
                 dec_ref):
            rt_idx = pl.program_id(0)
            qt_idx = pl.program_id(1)

            if variant != "grid_only":
                @pl.when(qt_idx == 0)
                def _():
                    dec_ref[:] = jnp.zeros((t, mdp), jnp.bfloat16)
                    col_iota = jax.lax.broadcasted_iota(
                        jnp.int32, (t, K), 1
                    )
                    for s in range(m):
                        onehot = (
                            codes_ref[s, :].reshape(t, 1) == col_iota
                        ).astype(jnp.bfloat16)
                        dec_ref[:, s * dsub : (s + 1) * dsub] = (
                            jax.lax.dot_general(
                                onehot, cb_ref[s],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            ).astype(jnp.bfloat16)
                        )

            if variant in ("decode_only", "grid_only"):
                vals_ref[:] = jnp.zeros((nblk, qt), jnp.float32)
                ids_ref[:] = jnp.zeros((nblk, qt), jnp.int32)
                return

            ip = jax.lax.dot_general(
                q_ref[:], dec_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            scores = norms_ref[0, :].reshape(1, t) - 2.0 * ip

            if variant == "no_select":
                # cheap fake write depending on scores, no block-min
                vals_ref[:] = jax.lax.dot_general(
                    jnp.ones((nblk, qt), jnp.float32),
                    jnp.zeros((qt, qt), jnp.float32),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + scores[0, 0]
                ids_ref[:] = jnp.zeros((nblk, qt), jnp.int32)
                return

            if variant == "packed_lane":
                bits = pltpu.bitcast(scores, jnp.int32)
                ukey = jnp.where(
                    bits < 0, ~bits, bits | jnp.int32(-(2**31))
                )
                skey = ukey ^ jnp.int32(-(2**31))
                lane_iota = (
                    jax.lax.broadcasted_iota(jnp.int32, (qt, t), 1) & 127
                )
                packed = (skey & jnp.int32(~127)) | lane_iota
                pmin = jnp.min(packed.reshape(qt, nblk, 128), axis=2)
                lane = pmin & 127
                bits2 = jnp.where(
                    pmin >= 0, pmin, ~(pmin ^ jnp.int32(-(2**31)))
                )
                blk_base = jax.lax.broadcasted_iota(
                    jnp.int32, (qt, nblk), 1
                )
                vals_ref[:] = pltpu.bitcast(bits2, jnp.float32).T
                ids_ref[:] = (rt_idx * t + blk_base * 128 + lane).T
                return

            sview = scores.reshape(qt, nblk, 128)
            bmin = jnp.min(sview, axis=2)
            if variant == "min_only":
                vals_ref[:] = bmin.T
                ids_ref[:] = jnp.zeros((nblk, qt), jnp.int32)
                return
            in_lane = jax.lax.broadcasted_iota(
                jnp.int32, (qt, nblk, 128), 2
            )
            pos = jnp.min(
                jnp.where(
                    sview <= bmin[:, :, None], in_lane, jnp.int32(_INT_BIG)
                ),
                axis=2,
            )
            blk_base = jax.lax.broadcasted_iota(jnp.int32, (qt, nblk), 1)
            ids = rt_idx * t + blk_base * 128 + pos
            vals_ref[:] = bmin.T
            ids_ref[:] = ids.T

        @jax.jit
        def run(codes_t, norms, q_pad, cb):
            return pl.pallas_call(
                kern,
                grid=(n_rt, n_qt),
                in_specs=[
                    pl.BlockSpec((m, t), lambda r, q: (0, r),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, t), lambda r, q: (0, r),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((qt, mdp), lambda r, q: (q, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((nblk, qt), lambda r, q: (r, q),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nblk, qt), lambda r, q: (r, q),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((n_rt * nblk, num_q), jnp.float32),
                    jax.ShapeDtypeStruct((n_rt * nblk, num_q), jnp.int32),
                ),
                scratch_shapes=[pltpu.VMEM((t, mdp), jnp.bfloat16)],
            )(codes_t, norms, q_pad, cb)

        return run

    for variant in sys.argv[1:] or (
        "packed_lane", "tdec_packed", "full"
    ):
        run = make(variant)

        def step(acc):
            v, i = run(codes_t, norms + acc * 1e-30, q_pad, cb)
            return acc + v[0, 0] * 1e-30 + jnp.float32(i[0, 0]) * 1e-30 + 1.0

        per = time_device_loop(step, lambda r: float(r), iters=16)
        print(f"{variant:12s} {per*1e3:9.3f} ms/batch")


if __name__ == "__main__":
    main()
