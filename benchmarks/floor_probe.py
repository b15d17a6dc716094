"""Isolate the fused-scan kernel's fixed cost: minimal pallas kernels over
the headline shape's I/O, varying which operands exist. Dev tool."""

import functools
import sys


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

    from benchmarks.common import time_device_loop_args

    n, m = 401408, 8
    num_q, mdp = 1024, 112
    t, qt = 4096, 512
    n_rt, n_qt, nblk = n // t, num_q // qt, t // 128

    key = jax.random.key(0)
    codes_t = jax.random.randint(key, (m, n), 0, 255, jnp.int32).astype(
        jnp.int8
    )
    q_pad = jax.random.normal(key, (num_q, mdp), jnp.bfloat16)

    def run_variant(name, with_codes, with_q, out_rows, out_ids):
        def kern(*refs):
            outs = refs[-(2 if out_ids else 1):]
            outs[0][:] = jnp.zeros(outs[0].shape, jnp.float32)
            if out_ids:
                outs[1][:] = jnp.zeros(outs[1].shape, jnp.int32)

        in_specs, ops = [], []
        if with_codes:
            in_specs.append(
                pl.BlockSpec((m, t), lambda r, q: (0, r),
                             memory_space=pltpu.VMEM))
            ops.append(codes_t)
        if with_q:
            in_specs.append(
                pl.BlockSpec((qt, mdp), lambda r, q: (q, 0),
                             memory_space=pltpu.VMEM))
            ops.append(q_pad)
        out_specs = [pl.BlockSpec((out_rows, qt), lambda r, q: (r, q),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((n_rt * out_rows, num_q),
                                          jnp.float32)]
        if out_ids:
            out_specs.append(pl.BlockSpec((out_rows, qt),
                                          lambda r, q: (r, q),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((n_rt * out_rows, num_q),
                                                  jnp.int32))

        @jax.jit
        def launch(*ops):
            return pl.pallas_call(
                kern, grid=(n_rt, n_qt), in_specs=in_specs,
                out_specs=tuple(out_specs), out_shape=tuple(out_shape),
            )(*ops)

        def step(acc, *ops_):
            if with_q:
                ops_ = ops_[:-1] + (ops_[-1] + acc * 0,)
            else:
                ops_ = (ops_[0] + acc.astype(jnp.int8) * 0,) + ops_[1:]
            r = launch(*ops_)
            v = r[0] if isinstance(r, (tuple, list)) else r
            return acc + v[0, 0] * 1e-30 + 1.0

        per = time_device_loop_args(step, tuple(ops), iters=16)
        print(f"{name:28s} {per*1e3:9.3f} ms/batch")

    run_variant("codes+q, out v+i [32]", True, True, nblk, True)
    run_variant("codes+q, out v only [32]", True, True, nblk, False)
    run_variant("codes+q, out v [8]", True, True, 8, False)
    run_variant("q only, out v [8]", False, True, 8, False)
    run_variant("codes only, out v [8]", True, False, 8, False)


if __name__ == "__main__":
    main()
