"""A/B kernel benchmarks for the v6 fused-scan changes, on the real TPU.

Shapes mirror the BASELINE configs without paying a PQ build (random codes
and gaussian codebooks: scan latency is shape-dependent only).

  adc100   headline 400k x 100d PQ 8x256  (depth 106)
  adc300   glove300 2.2M x 300d PQ 16x256 (depth 306); `adc300n` times
           the natural-layout probe variant for the A/B
  dense    fasttext 2M x 300d exact scan: no-rescore / operand-rescore /
           exact-f32-rescore

Usage: python benchmarks/kernel_ab.py [adc100|adc300|dense] ...
"""

import sys


def _setup():
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from gulon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()


def adc_shape(n, d, m, K, num_q=1024, k=10, variant=None):
    """``variant=None`` times the PRODUCTION kernel; a dict like
    ``{"decode_mode": "take"}`` / ``{"natural": True}`` /
    ``{"pipe": True}`` times the matching probe formulation from
    ``benchmarks.adc_probes`` (the measured dead ends)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.common import time_device_loop_args
    from gulon_tpu.ops.pq import subspace_bounds
    import gulon_tpu.ops.pallas.adc as A

    bounds = subspace_bounds(d, m)
    dsub = max(w for _, w in bounds)
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    codebooks = jax.random.normal(k1, (m, K, dsub), jnp.float32)
    for i, (_, w) in enumerate(bounds):
        if w < dsub:
            codebooks = codebooks.at[i, :, w:].set(0.0)
    codes_np = np.random.default_rng(0).integers(
        0, K, (n, m), dtype=np.int32
    )
    codes_t = A.pack_codes_t(codes_np, K)
    norms = jax.random.uniform(k2, (n,), jnp.float32, 10.0, 50.0)
    q_pool = jax.random.normal(k3, (num_q * 2, d), jnp.float32)

    mdp = A.padded_depth(m, dsub)
    if variant:
        from benchmarks.adc_probes import adc_scan_probe

        label = ",".join(f"{k_}={v}" for k_, v in variant.items())
        scan = lambda *a, **kw: adc_scan_probe(*a, **kw, **variant)
    else:
        label = "production"
        scan = A.adc_scan_pallas
    print(f"[adc n={n} d={d} m={m}] depth={mdp} mode={label}")

    def step(acc, qp, ct, nrm, cb):
        qs = jax.lax.dynamic_slice_in_dim(
            qp, (jnp.int32(acc) % 2) * num_q, num_q, 0
        )
        dd, ii = scan(
            qs + acc * 1e-30, cb, ct, nrm, bounds=bounds, k=k, num_rows=n
        )
        return acc + dd[0, 0] * 1e-30 + jnp.float32(ii[0, 0]) * 1e-30 + 1.0

    def step_raw(acc, qp, ct, nrm, cb):
        # kernel + winner unpack only, no top-k epilogue: the delta vs
        # ``step`` is what the XLA top_k over [Q, N/128] winners costs
        qs = jax.lax.dynamic_slice_in_dim(
            qp, (jnp.int32(acc) % 2) * num_q, num_q, 0
        )
        dd, ii = A.adc_block_scan_pallas(
            qs + acc * 1e-30, cb, ct, nrm, bounds=bounds, num_rows=n
        )
        return acc + dd[0, 0] * 1e-30 + jnp.float32(ii[0, 0]) * 1e-30 + 1.0

    for name, fn in (("full", step), ("kernel-only", step_raw)):
        per = time_device_loop_args(
            fn, (q_pool, codes_t, norms, codebooks), iters=16
        )
        print(
            f"  {name:12s} {per*1e3:9.3f} ms/batch  "
            f"{per/num_q*1e6:8.3f} us/query ({num_q/per:,.0f} QPS)"
        )
    return per


def dense_shape(n=2_000_000, d=300, num_q=1024, k=10):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.common import time_device_loop_args
    from gulon_tpu.ops.pallas.dense import dense_scan_pallas, padded_dim
    from gulon_tpu.ops.distance import sq_norms

    key = jax.random.key(1)
    k1, k2 = jax.random.split(key)
    # generate the operand directly on device in augmented layout
    dp = padded_dim(d)
    x = jax.random.normal(k1, (n, d), jnp.float32) * 0.3
    norms = sq_norms(x)
    hi = norms.astype(jnp.bfloat16)
    lo = (norms - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    data = jnp.zeros((n, dp), jnp.bfloat16)
    data = data.at[:, :d].set(x.astype(jnp.bfloat16))
    data = data.at[:, dp - 2].set(hi)
    data = data.at[:, dp - 1].set(lo)
    q_pool = jax.random.normal(k2, (num_q * 2, d), jnp.float32) * 0.3

    for name, kw in (
        ("raw (no rescore)", dict()),
        ("operand rescore x4", dict(rescore=4)),
        ("f32 rescore x4", dict(rescore=4, rescore_rows=x)),
    ):
        ops = (q_pool, data, norms) + (
            (x,) if "rescore_rows" in kw else ()
        )
        has_rows = "rescore_rows" in kw
        rescore = kw.get("rescore", 0)

        def step(acc, qp, dt, nrm, *rest):
            qs = jax.lax.dynamic_slice_in_dim(
                qp, (jnp.int32(acc) % 2) * num_q, num_q, 0
            )
            dd, ii = dense_scan_pallas(
                qs + acc * 1e-30, dt, nrm, k=k, rescore=rescore,
                rescore_rows=rest[0] if has_rows else None,
            )
            return (
                acc + dd[0, 0] * 1e-30 + jnp.float32(ii[0, 0]) * 1e-30 + 1.0
            )

        from benchmarks.common import time_device_loop_args as tdla

        per = tdla(step, ops, iters=16)
        print(
            f"  dense {name:20s} {per*1e3:9.3f} ms/batch "
            f"{per/num_q*1e6:8.3f} us/query ({num_q/per:,.0f} QPS)"
        )


def dense_i8_shape(n=2_000_000, d=300, num_q=1024, k=10):
    """A/B the int8 dense kernel against bf16 at the fasttext shape and
    the deep10m-like 96d shape: is the 2x int8 MXU rate realized?"""
    import jax
    import jax.numpy as jnp

    from benchmarks.common import time_device_loop_args as tdla
    from gulon_tpu.ops.distance import sq_norms
    from gulon_tpu.ops.pallas.dense import (
        dense_scan_pallas,
        dense_scan_pallas_i8,
        prepare_data,
        prepare_data_i8,
    )

    key = jax.random.key(1)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (n, d), jnp.float32) * 0.3
    norms = sq_norms(x)
    q_pool = jax.random.normal(k2, (num_q * 2, d), jnp.float32) * 0.3
    data_bf = prepare_data(x, norms)
    data8, meta, _ = prepare_data_i8(x, norms)
    print(f"[dense n={n} d={d}] i8 gain={meta.gain}")

    def step_bf(acc, qp, dt, nrm, rows):
        qs = jax.lax.dynamic_slice_in_dim(
            qp, (jnp.int32(acc) % 2) * num_q, num_q, 0
        )
        dd, ii = dense_scan_pallas(
            qs + acc * 1e-30, dt, nrm, k=k, rescore=4, rescore_rows=rows
        )
        return acc + dd[0, 0] * 1e-30 + jnp.float32(ii[0, 0]) * 1e-30 + 1.0

    def step_i8(acc, qp, dt, nrm, rows):
        qs = jax.lax.dynamic_slice_in_dim(
            qp, (jnp.int32(acc) % 2) * num_q, num_q, 0
        )
        dd, ii = dense_scan_pallas_i8(
            qs + acc * 1e-30, dt, meta, nrm, k=k, rescore=4,
            rescore_rows=rows,
        )
        return acc + dd[0, 0] * 1e-30 + jnp.float32(ii[0, 0]) * 1e-30 + 1.0

    for name, fn, dt in (
        ("bf16 + f32 rescore", step_bf, data_bf),
        ("int8 + f32 rescore", step_i8, data8),
    ):
        per = tdla(fn, (q_pool, dt, norms, x), iters=16)
        print(
            f"  dense {name:20s} {per*1e3:9.3f} ms/batch "
            f"{per/num_q*1e6:8.3f} us/query ({num_q/per:,.0f} QPS)"
        )


def main():
    _setup()
    which = sys.argv[1] if len(sys.argv) > 1 else "adc100"
    if which == "adc100":
        adc_shape(400_000, 100, 8, 256)
    elif which == "adc300":
        adc_shape(2_196_017, 300, 16, 256)
    elif which == "adc300n":
        # natural-layout probe (dead end #3: 13.90 vs 13.51 ms/batch)
        adc_shape(2_196_017, 300, 16, 256, variant={"natural": True})
    elif which == "adc300batch":
        # the one-hot decode is a fixed per-batch cost (once per row
        # tile regardless of the query-tile count), so larger batches
        # amortize it: the serving-throughput configuration
        for nq in (1024, 2048, 4096):
            adc_shape(2_196_017, 300, 16, 256, num_q=nq)
    elif which == "decode":
        # the attacks on the deep-shape decode floor (VERDICT r3 item 4):
        # A/B the probe decode formulations (benchmarks/adc_probes.py)
        # against the production kernel at both the headline and the
        # decode-bound glove300 shape. Variants are explicit static
        # arguments now — env vars still honored for script compat:
        #   GULON_ADC_DECODE=take python benchmarks/kernel_ab.py decode
        import os

        mode = os.environ.get("GULON_ADC_DECODE", "base")
        pipe = os.environ.get("GULON_ADC_PIPE", "") not in ("", "0")
        variant = {}
        if mode != "base":
            variant["decode_mode"] = mode
        if pipe:
            variant["pipe"] = True
        print(f"decode mode: {mode}  pipe: {int(pipe)}")
        adc_shape(400_000, 100, 8, 256, variant=variant or None)
        adc_shape(2_196_017, 300, 16, 256, variant=variant or None)
    elif which == "dense":
        dense_shape()
    elif which == "dense_i8":
        dense_i8_shape(2_000_000, 300)   # fasttext shape
        dense_i8_shape(4_000_000, 96)    # deep10m-class shape
    else:
        raise SystemExit(f"unknown mode {which}")


if __name__ == "__main__":
    main()
