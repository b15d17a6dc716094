"""Flat-scan strategy shootout at the headline config.

Compares the per-batch latency of every flat scan strategy (decode / lut /
cached / pallas) at 400k x 100d, PQ 8x256, batch 1024, top-10 — the
BENCH headline shape. Codes are random (uniform) and codebooks gaussian:
strategy *latency* is shape-dependent only, so this skips the k-means
build and keeps kernel iteration fast. Run on the real TPU.

Usage: python benchmarks/scan_shootout.py [Q] [N]
"""

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

    from benchmarks.common import time_device_loop
    from gulon_tpu.ops.pq import subspace_bounds
    from gulon_tpu.ops import scan as scan_ops
    from gulon_tpu.ops.pallas.adc import adc_scan_pallas

    num_q = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    d, m, K, k = 100, 8, 256, 10
    bounds = subspace_bounds(d, m)
    dsub = max(w for _, w in bounds)

    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    codebooks = jax.random.normal(k1, (m, K, dsub), jnp.float32)
    # zero the padding lanes like the trained PQ does
    for i, (_, w) in enumerate(bounds):
        if w < dsub:
            codebooks = codebooks.at[i, :, w:].set(0.0)
    codes = jax.random.randint(k2, (n, m), 0, K, jnp.int32).astype(jnp.uint8)
    q_pool = jax.random.normal(k3, (num_q * 2, d), jnp.float32)

    # decode + norms
    from gulon_tpu.ops.pq import ProductQuantizer

    pq = ProductQuantizer(codebooks=codebooks, bounds=bounds, num_clusters=K)
    norms = pq.reconstruction_norms(codes)
    decoded = None
    codes_t = jnp.asarray(np.asarray(codes, np.int32).T)

    def bench(name, fn):
        def step(acc):
            qs = jax.lax.dynamic_slice_in_dim(
                q_pool, (jnp.int32(acc) % 2) * num_q, num_q, 0
            )
            dd, ii = fn(qs + acc * 1e-30)
            return acc + dd[0, 0] * 1e-30 + jnp.float32(ii[0, 0]) * 1e-30 + 1.0

        t0 = time.monotonic()
        per = time_device_loop(step, lambda r: float(r), iters=16)
        wall = time.monotonic() - t0
        print(
            f"{name:12s} {per*1e3:9.3f} ms/batch  "
            f"{per/num_q*1e6:8.3f} us/query   (incl. compile {wall:.0f}s)"
        )
        return per

    q0 = q_pool[:num_q]

    bench(
        "decode",
        lambda qs: scan_ops.adc_scan_decode(
            qs, codebooks, codes, norms, bounds=bounds, k=k
        ),
    )

    bench(
        "pallas",
        lambda qs: adc_scan_pallas(
            qs, codebooks, codes_t, norms, bounds=bounds, k=k, num_rows=n
        ),
    )

    # cached: materialize the bf16 reconstruction once
    ci = codes.astype(jnp.int32)
    decoded = scan_ops.decode_tile(codebooks, ci, "onehot").astype(
        jnp.bfloat16
    )
    from gulon_tpu.ops.pq import split_subspaces

    def q_pad_of(qs):
        s = split_subspaces(qs, bounds, dsub)
        return jnp.transpose(s, (1, 0, 2)).reshape(qs.shape[0], m * dsub)

    bench(
        "cached",
        lambda qs: scan_ops.cached_scan(
            q_pad_of(qs), decoded, norms, k=k
        ),
    )

    # correctness cross-check at this scale
    d_ref, i_ref = scan_ops.adc_scan_decode(
        q0[:64], codebooks, codes, norms, bounds=bounds, k=k,
        precision="highest", decode_impl="gather", topk_impl="exact",
    )
    d_pl, i_pl = adc_scan_pallas(
        q0[:64], codebooks, codes_t, norms, bounds=bounds, k=k, num_rows=n
    )
    i_ref, i_pl = np.asarray(i_ref), np.asarray(i_pl)
    rec = np.mean([len(set(i_pl[i]) & set(i_ref[i])) / k for i in range(64)])
    print(f"pallas vs exact-scan id recall@{k}: {rec:.4f}")


if __name__ == "__main__":
    main()
