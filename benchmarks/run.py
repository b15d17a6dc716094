"""Benchmark suite — the BASELINE.md configurations on synthetic stand-ins.

Zero-egress environment: real GloVe/fastText/Deep1B files are unavailable,
so each config uses a synthetic low-intrinsic-dimension corpus with the same
(n, d) shape and code budget. Every benchmark prints one JSON line.

Configs (BASELINE.json):
  glove100   — 400k x 100d, PQ 8x256, batched top-10 + recall vs exact
  glove300   — 2.2M x 300d, PQ 16x256, 1k-query batched ADC
  fasttext   — 2M x 300d, exact brute-force scan path (no quantization)
  deep10m    — 10M x 96d, row-sharded scan + top-k merge over the mesh
  sent1024   — 1M x 1024d, code-bytes vs recall sweep (subspace/LUT stress)
  kmeans     — one Lloyd iteration, n=10k d=100 k=25 (ref KMeansBench mirror)
  build10m   — 10M x 300d full index build (codebook fit + bulk encode)

Usage: python benchmarks/run.py <config> [--devices N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.common import (
    dist_recall_fn,
    idset_recall,
    low_rank_corpus_device,
    time_device_loop,
    time_direct,
)


def _emit(payload):
    print(json.dumps(payload), flush=True)
    return payload


def bench_adc(n, d, m, k_codes, n_queries, name, max_iters=25):
    import jax.numpy as jnp

    from gulon_tpu.ops.pq import PQConfig, train_product_quantizer
    from gulon_tpu.ops.scan import adc_scan_decode, exact_scan

    rng = np.random.default_rng(0)
    x = low_rank_corpus_device(0, n, d, intrinsic=min(32, d // 2))
    q_idx = rng.choice(n, n_queries * 4, replace=False)
    q_pool = jnp.take(x, jnp.asarray(np.sort(q_idx)), axis=0)

    t0 = time.monotonic()
    pq = train_product_quantizer(
        x,
        PQConfig(
            num_clusters=k_codes,
            num_quantizers=m,
            max_iters=max_iters,
            train_sample=min(n, 200_000),
        ),
    )
    codes = pq.encode(x)
    norms = pq.reconstruction_norms(codes)
    _ = np.asarray(norms[:1])
    build_s = time.monotonic() - t0

    q_dev = q_pool

    # serving path: the fused Pallas kernel where it is eligible (same
    # envelope FlatIndex's "auto" uses), XLA decode otherwise. The
    # query-invariant [m, N] code relayout is built once, like the index's
    # lazily-cached _pallas_codes_t.
    import jax

    use_pallas = (
        jax.default_backend() == "tpu"
        and n >= 256 * 10
        and k_codes <= 1024
    )
    if use_pallas:
        from gulon_tpu.ops.pallas.adc import adc_scan_pallas, pack_codes_t

        codes_t = pack_codes_t(np.asarray(codes), k_codes)

        def scan(qb, winners=1):
            return adc_scan_pallas(
                qb, pq.codebooks, codes_t, norms,
                bounds=pq.bounds, k=10, num_rows=n, winners=winners,
            )

    else:

        def scan(qb):
            return adc_scan_decode(
                qb, pq.codebooks, codes, norms, bounds=pq.bounds, k=10
            )

    def mk_step(winners):
        def step(acc):
            start = (acc.astype(jnp.int32) % 4) * n_queries
            qb = jax.lax.dynamic_slice_in_dim(q_dev, start, n_queries, 0)
            dd, ii = scan(qb + acc * 1e-30, winners)
            return acc + dd[0, 0] + jnp.float32(ii[0, 0] % 7)
        return step

    per_batch = time_device_loop(mk_step(1), float)
    per_batch_w2 = (
        time_device_loop(mk_step(2), float) if use_pallas else None
    )

    # the cached serving mode (FlatIndex.enable_cache + "cached" strategy
    # -> fused dense kernel on TPU): trades 2*m*dsub bytes/vector of HBM
    # for a matmul-bound scan — at deep m*dsub the code-resident kernel is
    # decode-bound and this is the latency winner
    per_batch_cached = None
    if use_pallas:
        from gulon_tpu.models.flat import _augment_cache
        from gulon_tpu.ops.pallas.dense import dense_scan_pallas
        from gulon_tpu.ops.pq import split_subspaces
        from gulon_tpu.ops.scan import decode_tile

        dsub = pq.pad_width
        parts = []
        for s0 in range(0, n, 1 << 18):
            ci = jnp.asarray(np.asarray(codes)[s0 : s0 + (1 << 18)],
                             jnp.int32)
            parts.append(
                decode_tile(pq.codebooks, ci, "auto").astype(jnp.bfloat16)
            )
        cache_aug = _augment_cache(jnp.concatenate(parts), norms)
        del parts

        def q_pad_of(qb):
            qs = split_subspaces(qb, pq.bounds, dsub)
            return jnp.transpose(qs, (1, 0, 2)).reshape(
                qb.shape[0], m * dsub
            )

        # args-passed: a 1.4 GB closure capture ships by value in the
        # remote compile request (broken pipe / HTTP 413)
        from benchmarks.common import time_device_loop_args

        def step_cached(acc, qp, ca, nr):
            start = (jnp.int32(acc) % 4) * n_queries
            qb = jax.lax.dynamic_slice_in_dim(qp, start, n_queries, 0)
            dd, ii = dense_scan_pallas(
                q_pad_of(qb + acc * 1e-30), ca, nr, k=10
            )
            return acc + dd[0, 0] * 1e-30 + jnp.float32(ii[0, 0] % 7) * 1e-30 + 1.0

        per_batch_cached = time_device_loop_args(
            step_cached, (q_dev, cache_aug, norms)
        )

    # recall vs exact, plus the PQ ceiling (exact NN over decoded vectors):
    # scan_efficiency ~ 1.0 means the query path is lossless for the codes
    sample = min(256, n_queries)
    _, i_adc = scan(q_dev[:sample])
    _, i_ex = exact_scan(q_dev[:sample], x, k=10)
    from gulon_tpu.ops.scan import adc_scan_decode as _ceil_scan
    _, i_ceil = _ceil_scan(
        q_dev[:sample], pq.codebooks, codes, norms, bounds=pq.bounds, k=10,
        precision="highest", decode_impl="gather", topk_impl="exact",
    )
    recall = idset_recall(np.asarray(i_adc), np.asarray(i_ex), 10)
    ceiling = idset_recall(np.asarray(i_ceil), np.asarray(i_ex), 10)

    _dist_recall = dist_recall_fn(x, q_dev[:sample], i_ex, k=10)
    recall_dist = _dist_recall(i_adc)
    ceiling_dist = _dist_recall(i_ceil)
    recall_dist_w2 = None
    recall_dist_rr = None
    per_batch_rr = None
    if use_pallas:
        _, i_w2 = scan(q_dev[:sample], 2)
        recall_dist_w2 = _dist_recall(i_w2)

        # the DEFAULT FlatIndex serving path at this shape: auto
        # rerank_factor=4 -> fetch 4k block winners, exact f32 LUT
        # rescore, keep the top k. The raw fused row above is the
        # kernel's own selection; this row is what `index.query()`
        # actually returns (models/flat.py auto knobs).
        def scan_rerank(qb):
            dd, ii = adc_scan_pallas(
                qb, pq.codebooks, codes_t, norms,
                bounds=pq.bounds, k=40, num_rows=n, rescore=True,
            )
            return dd[:, :10], ii[:, :10]

        _, i_rr = scan_rerank(q_dev[:sample])
        recall_dist_rr = _dist_recall(i_rr)

        def step_rr(acc):
            start = (acc.astype(jnp.int32) % 4) * n_queries
            qb = jax.lax.dynamic_slice_in_dim(q_dev, start, n_queries, 0)
            dd, ii = scan_rerank(qb + acc * 1e-30)
            return acc + dd[0, 0] + jnp.float32(ii[0, 0] % 7)

        per_batch_rr = time_device_loop(step_rr, float)

    return _emit(
        {
            "benchmark": name,
            "scan_path": "pallas_fused" if use_pallas else "xla_decode",
            "corpus": f"{n}x{d}",
            "code_bytes_per_vector": int(np.asarray(codes).dtype.itemsize * m),
            "batch": n_queries,
            "us_per_query": round(per_batch / n_queries * 1e6, 3),
            "qps_per_chip": round(n_queries / per_batch, 1),
            **(
                {
                    "us_per_query_cached_dense": round(
                        per_batch_cached / n_queries * 1e6, 3
                    ),
                    "cached_bytes_per_vector": 2 * m * pq.pad_width,
                }
                if per_batch_cached is not None
                else {}
            ),
            "recall_at_10_vs_exact": round(recall, 4),
            "recall_at_10_pq_ceiling": round(ceiling, 4),
            "scan_efficiency": round(recall / max(ceiling, 1e-9), 4),
            "dist_recall_at_10": round(recall_dist, 4),
            "dist_recall_at_10_ceiling": round(ceiling_dist, 4),
            "dist_scan_efficiency": round(
                recall_dist / max(ceiling_dist, 1e-9), 4
            ),
            **(
                {
                    "us_per_query_w2": round(
                        per_batch_w2 / n_queries * 1e6, 3
                    ),
                    "dist_recall_at_10_w2": round(recall_dist_w2, 4),
                }
                if per_batch_w2 is not None
                else {}
            ),
            **(
                {
                    "us_per_query_rerank4": round(
                        per_batch_rr / n_queries * 1e6, 3
                    ),
                    "dist_recall_at_10_rerank4": round(recall_dist_rr, 4),
                    "dist_scan_efficiency_rerank4": round(
                        recall_dist_rr / max(ceiling_dist, 1e-9), 4
                    ),
                }
                if per_batch_rr is not None
                else {}
            ),
            "build_s": round(build_s, 2),
            "device": str(jax.devices()[0]),
        }
    )


def bench_exact(n, d, n_queries, name):
    import jax
    import jax.numpy as jnp

    from gulon_tpu.ops.distance import sq_norms
    from gulon_tpu.ops.scan import exact_scan

    rng = np.random.default_rng(0)
    x_dev = low_rank_corpus_device(0, n, d, intrinsic=32)
    q_idx = np.sort(rng.choice(n, n_queries * 4, replace=False))
    q_dev = jnp.take(x_dev, jnp.asarray(q_idx), axis=0)

    # serving path (ExactIndex auto on TPU): fused dense kernel over a
    # natural-layout bf16 operand + exact f32 rescore of 4k block winners.
    # Device-loop timing with operands as jit args (see common.py).
    from benchmarks.common import time_device_loop_args

    use_pallas = jax.default_backend() == "tpu" and n >= 256 * 10
    if use_pallas:
        from gulon_tpu.ops.pallas.dense import (
            dense_scan_pallas,
            prepare_data,
        )

        xn = sq_norms(x_dev)
        data_nat = prepare_data(x_dev, xn)  # device-side, norm lanes in

        # serving default: exact f32 rescore (ExactIndex.exact_rescore=True)
        def step(acc, qp, dn, norms, rows):
            qb = jax.lax.dynamic_slice_in_dim(
                qp, (acc.astype(jnp.int32) % 4) * n_queries, n_queries, 0
            )
            dd, ii = dense_scan_pallas(
                qb + acc * 1e-30, dn, norms, k=10, rescore=4,
                rescore_rows=rows,
            )
            return (
                acc + dd[0, 0] * 1e-30 + jnp.float32(ii[0, 0] % 3) * 1e-30
                + 1.0
            )

        per_batch = time_device_loop_args(step, (q_dev, data_nat, xn, x_dev))

        # max-throughput variant: bf16-operand rescore (exact_rescore=False)
        def step_op(acc, qp, dn, norms):
            qb = jax.lax.dynamic_slice_in_dim(
                qp, (acc.astype(jnp.int32) % 4) * n_queries, n_queries, 0
            )
            dd, ii = dense_scan_pallas(
                qb + acc * 1e-30, dn, norms, k=10, rescore=4,
            )
            return (
                acc + dd[0, 0] * 1e-30 + jnp.float32(ii[0, 0] % 3) * 1e-30
                + 1.0
            )

        per_batch_op = time_device_loop_args(step_op, (q_dev, data_nat, xn))

        # mesh-scale serving wrapper (ShardedExactIndex pallas route) on a
        # 1-chip mesh: same kernel under shard_map + the all-gather top-k
        # merge — measures the per-chip cost of the sharded path
        from gulon_tpu.parallel.mesh import make_mesh
        from gulon_tpu.parallel.ops import sharded_dense_scan

        mesh1 = make_mesh(1)

        def step_sh(acc, qp, dn, norms, rows):
            qb = jax.lax.dynamic_slice_in_dim(
                qp, (acc.astype(jnp.int32) % 4) * n_queries, n_queries, 0
            )
            dd, ii = sharded_dense_scan(
                qb + acc * 1e-30, dn, norms, rows,
                mesh=mesh1, k=10, rescore=4,
            )
            return (
                acc + dd[0, 0] * 1e-30 + jnp.float32(ii[0, 0] % 3) * 1e-30
                + 1.0
            )

        per_batch_sh = time_device_loop_args(
            step_sh, (q_dev, data_nat, xn, x_dev)
        )

        # correctness probe: dense-kernel results vs the exact scan
        d_k, i_k = dense_scan_pallas(q_dev[:256], data_nat, xn, k=10,
                                     rescore=4, rescore_rows=x_dev)
        _, i_e = exact_scan(
            q_dev[:256], x_dev, k=10, precision="highest",
            topk_impl="exact",
        )
        kernel_recall = idset_recall(np.asarray(i_k), np.asarray(i_e), 10)
    else:

        def step(acc, qp, rows):
            qb = jax.lax.dynamic_slice_in_dim(
                qp, (acc.astype(jnp.int32) % 4) * n_queries, n_queries, 0
            )
            dd, ii = exact_scan(
                qb + acc * 1e-30, rows, k=10, precision="default",
                topk_impl="approx",
            )
            return (
                acc + dd[0, 0] * 1e-30 + jnp.float32(ii[0, 0] % 3) * 1e-30
                + 1.0
            )

        per_batch = time_device_loop_args(step, (q_dev, x_dev))
        kernel_recall = None
        per_batch_op = None
        per_batch_sh = None
    return _emit(
        {
            "benchmark": name,
            "corpus": f"{n}x{d}",
            "mode": (
                "exact brute force (fused dense kernel + f32 rescore)"
                if use_pallas
                else "exact brute force (matmul + top-k)"
            ),
            "batch": n_queries,
            "us_per_query": round(per_batch / n_queries * 1e6, 3),
            "qps_per_chip": round(n_queries / per_batch, 1),
            **(
                {
                    "recall_at_10_vs_exact": round(kernel_recall, 4),
                    "us_per_query_operand_rescore": round(
                        per_batch_op / n_queries * 1e6, 3
                    ),
                    "us_per_query_sharded_mesh1": round(
                        per_batch_sh / n_queries * 1e6, 3
                    ),
                }
                if kernel_recall is not None
                else {}
            ),
            "timing": "device-side chained loop, two-point",
            "device": str(jax.devices()[0]),
        }
    )


def bench_deep10m(n_devices, n=10_000_000, d=96, n_queries=1024):
    import jax
    import jax.numpy as jnp

    from gulon_tpu.ops.pq import PQConfig, train_product_quantizer
    from gulon_tpu.parallel.mesh import make_mesh, shard_rows
    from gulon_tpu.parallel.ops import sharded_adc_scan

    rng = np.random.default_rng(0)
    x = low_rank_corpus_device(0, n, d, intrinsic=24, n_clusters=10_000)
    q_idx = np.sort(rng.choice(n, n_queries, replace=False))
    queries = jnp.take(x, jnp.asarray(q_idx), axis=0)

    t0 = time.monotonic()
    pq = train_product_quantizer(
        x,
        PQConfig(
            num_clusters=256, num_quantizers=12, max_iters=15,
            train_sample=200_000,
        ),
    )
    codes = np.asarray(pq.encode(x))
    norms = np.asarray(pq.reconstruction_norms(jnp.asarray(codes)))
    build_s = time.monotonic() - t0

    mesh = make_mesh(n_devices)
    codes_sh = shard_rows(codes, mesh, 0)
    norms_sh = shard_rows(norms, mesh, np.inf)
    q_dev = queries

    t0 = time.perf_counter()
    dd, ii = sharded_adc_scan(
        q_dev, pq.codebooks, codes_sh, norms_sh,
        mesh=mesh, bounds=pq.bounds, k=10,
    )
    _ = np.asarray(dd[:1, :1])
    first = time.perf_counter() - t0
    ts = []
    for _i in range(8):
        t0 = time.perf_counter()
        dd, ii = sharded_adc_scan(
            q_dev, pq.codebooks, codes_sh, norms_sh,
            mesh=mesh, bounds=pq.bounds, k=10,
        )
        _ = np.asarray(dd[:1, :1])
        ts.append(time.perf_counter() - t0)

    # device-side timing of the code-resident sharded path (the BASELINE
    # "Deep10M sharded across v5e-8" row names THIS configuration —
    # m bytes/vector codes + ICI top-k merge — not the cached-dense
    # single-chip mode below; VERDICT r4 item 5). Measured at mesh=1 on
    # the one available chip; the v5e-8 projection divides the
    # embarrassingly-row-parallel scan by 8 and adds a merge estimate.
    per_batch_sharded = None
    if jax.default_backend() == "tpu":
        from benchmarks.common import time_device_loop_args

        def step_sharded(acc, qp, cb, cs, ns):
            dd2, ii2 = sharded_adc_scan(
                qp + acc * 1e-30, cb, cs, ns,
                mesh=mesh, bounds=pq.bounds, k=10,
            )
            return (
                acc
                + dd2[0, 0] * 1e-30
                + jnp.float32(ii2[0, 0] % 7) * 1e-30
                + 1.0
            )

        per_batch_sharded = time_device_loop_args(
            step_sharded,
            (q_dev, pq.codebooks, codes_sh, norms_sh),
            iters=8,
        )

    # single-chip cached serving mode (FlatIndex.enable_cache -> fused
    # dense kernel): decode the codes into a bf16 corpus (2*m*dsub B/row,
    # ~2 GB at this shape) and scan decode-free on the MXU. The
    # code-resident ADC kernel is decode-bound here (m*K*N one-hot
    # compares dominate at 10M rows); the matmul-bound dense path trades
    # HBM capacity for latency.
    per_batch_cached = None
    if jax.default_backend() == "tpu":
        from benchmarks.common import time_device_loop_args
        from gulon_tpu.models.flat import _augment_cache
        from gulon_tpu.ops.pallas.dense import dense_scan_pallas
        from gulon_tpu.ops.pq import split_subspaces
        from gulon_tpu.ops.scan import decode_tile

        x = None  # free the 3.8 GB f32 corpus before building the cache
        norms_dev = jnp.asarray(norms)
        dsub = pq.pad_width
        parts = []
        for s0 in range(0, n, 1 << 18):
            ci = jnp.asarray(codes[s0 : s0 + (1 << 18)], jnp.int32)
            parts.append(
                decode_tile(pq.codebooks, ci, "auto").astype(jnp.bfloat16)
            )
        cache_aug = _augment_cache(jnp.concatenate(parts), norms_dev)
        del parts

        def q_pad_of(qb):
            qs = split_subspaces(qb, pq.bounds, dsub)
            return jnp.transpose(qs, (1, 0, 2)).reshape(
                qb.shape[0], pq.num_quantizers * dsub
            )

        def step_cached(acc, qp, ca, nr):
            dd2, ii2 = dense_scan_pallas(
                q_pad_of(qp + acc * 1e-30), ca, nr, k=10
            )
            return (
                acc
                + dd2[0, 0] * 1e-30
                + jnp.float32(ii2[0, 0] % 7) * 1e-30
                + 1.0
            )

        per_batch_cached = time_device_loop_args(
            step_cached, (q_dev, cache_aug, norms_dev), iters=8
        )

    return _emit(
        {
            "benchmark": "deep10m",
            "corpus": f"{n}x{d}",
            "devices": n_devices,
            "batch": n_queries,
            "ms_per_batch_incl_rtt": round(float(np.median(ts)) * 1e3, 2),
            "first_call_s": round(first, 2),
            "build_s": round(build_s, 2),
            **(
                {
                    # path A: code-resident sharded ADC (what the
                    # BASELINE deep10m row names)
                    "path_sharded_adc": (
                        "code-resident sharded ADC scan + top-k merge "
                        f"(mesh={n_devices}, fused kernel per shard)"
                    ),
                    "sharded_bytes_per_vector": pq.num_quantizers + 4,
                    "ms_per_batch_sharded_adc": round(
                        per_batch_sharded * 1e3, 2
                    ),
                    "us_per_query_sharded_adc": round(
                        per_batch_sharded / n_queries * 1e6, 3
                    ),
                    # arithmetic v5e-8 projection: the scan is row-
                    # parallel (device_ms/8); the merge is one 8-way
                    # all-gather of [1024, 10] (dist, id) pairs over ICI
                    # + a [1024, 80] top-k — sub-ms, estimated 0.5 ms
                    "projected_v5e8_ms_per_batch": round(
                        per_batch_sharded * 1e3 / 8 + 0.5, 2
                    ),
                }
                if per_batch_sharded is not None
                else {}
            ),
            **(
                {
                    # path B: single-chip cached-dense serving mode
                    # (24x the HBM bytes/vector of path A, 3x faster)
                    "path_cached_dense": (
                        "single-chip bf16 decode-cache dense kernel"
                    ),
                    "ms_per_batch_cached_dense": round(
                        per_batch_cached * 1e3, 2
                    ),
                    "us_per_query_cached_dense": round(
                        per_batch_cached / n_queries * 1e6, 3
                    ),
                    "cached_bytes_per_vector": (
                        2 * pq.num_quantizers * pq.pad_width
                    ),
                }
                if per_batch_cached is not None
                else {}
            ),
            "device": str(jax.devices()[0]),
        }
    )


def bench_sent1024(n=1_000_000, d=1024, n_queries=512):
    import jax.numpy as jnp

    from gulon_tpu.ops.pq import PQConfig, train_product_quantizer
    from gulon_tpu.ops.scan import adc_scan_decode, exact_scan

    rng = np.random.default_rng(0)
    x = low_rank_corpus_device(0, n, d, intrinsic=64, n_clusters=5000)
    q_idx = np.sort(rng.choice(n, n_queries, replace=False))
    q_dev = jnp.take(x, jnp.asarray(q_idx), axis=0)
    _, i_ex = exact_scan(q_dev, x, k=10)
    i_ex = np.asarray(i_ex)

    sweep = []
    for m in (16, 32, 64):
        pq = train_product_quantizer(
            x,
            PQConfig(
                num_clusters=256, num_quantizers=m, max_iters=10,
                train_sample=100_000,
            ),
        )
        # encode in chunks: the stacked subspace copy of a 1M x 1024 corpus
        # would otherwise double the 4 GB corpus in HBM
        chunk = 250_000
        codes = jnp.concatenate(
            [pq.encode(x[s0 : s0 + chunk]) for s0 in range(0, n, chunk)],
            axis=0,
        )
        norms = pq.reconstruction_norms(codes)
        _, i_adc = adc_scan_decode(
            q_dev, pq.codebooks, codes, norms, bounds=pq.bounds, k=10
        )
        recall = idset_recall(np.asarray(i_adc), i_ex, 10)
        # decode ceiling for THIS code budget: the same scan at f32
        # matmul precision + exact top-k — a lossless scan of the codes.
        # The gap from 1.0 to the ceiling is the code budget; the gap
        # from the ceiling to the recall is the scan (VERDICT r4 item 2).
        _, i_ceil = adc_scan_decode(
            q_dev, pq.codebooks, codes, norms, bounds=pq.bounds, k=10,
            precision="highest", topk_impl="exact",
        )
        ceiling = idset_recall(np.asarray(i_ceil), i_ex, 10)
        entry = {
            "code_bytes": m,
            "recall_at_10": round(recall, 4),
            "decode_ceiling_at_10": round(ceiling, 4),
            "scan_eff": round(recall / max(ceiling, 1e-9), 4),
        }
        sweep.append(entry)
    out = {"benchmark": "sent1024", "corpus": f"{n}x{d}", "sweep": sweep}
    for entry in sweep:  # hoist the compact-line field
        if entry["code_bytes"] == 64:
            out["scan_eff_m64"] = entry["scan_eff"]
    return _emit(out)


def bench_kmeans(n=10_000, d=100, k=25):
    import jax.numpy as jnp

    from gulon_tpu.ops.kmeans import lloyd_step

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    c0 = x[:k]

    def step(acc):
        c, a = lloyd_step(x + acc * 1e-30, c0)
        return acc + c[0, 0] + jnp.float32(a[0])

    # the unit is ~65 us: hundreds of chained iterations so the two-point
    # difference dwarfs tunnel RTT jitter. Env override exists for the
    # orchestrator's CPU subprocess test, where 512 chained CPU Lloyd
    # iterations are ~10 s of pure test wall-clock.
    per_iter = time_device_loop(
        step, float,
        iters=int(os.environ.get("GULON_BENCH_KMEANS_ITERS", "512")),
    )
    import jax

    return _emit(
        {
            "benchmark": "kmeans_lloyd_iteration",
            "config": f"n={n} d={d} k={k} (ref KMeansBench.scala)",
            "us_per_iteration": round(per_iter * 1e6, 1),
            "device": str(jax.devices()[0]),
        }
    )


def bench_build10m(n=10_000_000, d=300, m=25, k_codes=256):
    """Streaming build: 10M x 300d f32 (12 GB) exceeds one chip's HBM
    alongside working buffers, so the corpus is produced (and in a real
    deployment, loaded) chunk-wise — train on a 500k sample, then
    generate+encode 1M-row chunks with nothing but codes retained.

    The pipeline runs TWICE: the first pass charges XLA compilation and
    per-process program loading (through the remote tunnel even
    persistent-cache HITS pay minutes of server-side executable rebuild),
    the second runs with programs resident and measures the actual build
    work. ``index_build_s`` is the warm pass; ``program_load_s`` the
    first-pass delta — transport cost, not build work (round-2 lesson:
    511 s reported vs ~30 s of execution)."""
    import time as _t

    import jax

    from gulon_tpu.ops.pq import PQConfig, train_product_quantizer

    chunk = 1_000_000

    def one_pass():
        t0 = _t.monotonic()
        sample = low_rank_corpus_device(0, 500_000, d, intrinsic=32,
                                        n_clusters=10_000)
        pq = train_product_quantizer(
            sample,
            PQConfig(num_clusters=k_codes, num_quantizers=m, max_iters=25),
        )
        _ = np.asarray(pq.codebooks[:1, :1, :1])
        train_s = _t.monotonic() - t0

        t1 = _t.monotonic()
        last = None
        for ci, _start in enumerate(range(0, n, chunk)):
            xc = low_rank_corpus_device(ci + 1, chunk, d, intrinsic=32,
                                        n_clusters=10_000)
            last = pq.encode(xc)
        _ = np.asarray(last[:1])
        encode_s = _t.monotonic() - t1
        return train_s, encode_s

    cold_train_s, cold_encode_s = one_pass()
    train_s, encode_s = one_pass()
    cold_s = cold_train_s + cold_encode_s
    build_s = train_s + encode_s

    return _emit(
        {
            "benchmark": "build10m",
            "corpus": f"{n}x{d} (streamed in {chunk}-row chunks)",
            "codebook_train_s": round(train_s, 1),
            "bulk_encode_s": round(encode_s, 1),
            "index_build_s": round(build_s, 1),
            "program_load_s": round(max(cold_s - build_s, 0.0), 1),
            "target_s": 120,
            "device": str(jax.devices()[0]),
        }
    )


def bench_ivf1m(n=300_000, d=96, n_queries=1024, partitions=300, probe=15):
    """IVF residual index: build + batched probed queries.

    The IVF scan executes as a masked full scan (see models/ivf.py), so its
    throughput tracks the flat scan; this config tracks build cost, recall
    vs the probe budget, and parity of the probed result set. Sized at 300k
    rows because the build pipeline is host-centric (grouping/lexsort) and
    the tunnel moves host<->device data at ~11 MB/s.
    """
    import jax
    import jax.numpy as jnp

    from gulon_tpu.models.build import build_ivf_index
    from gulon_tpu.models.ivf import LimitGroups
    from gulon_tpu.ops.pq import PQConfig
    from gulon_tpu.ops.scan import exact_scan

    rng = np.random.default_rng(0)
    x_dev = low_rank_corpus_device(0, n, d, intrinsic=24, n_clusters=4096)
    x = np.asarray(x_dev)  # builders are host-side (grouping/lexsort)
    keys = np.array([f"r{i:08d}" for i in range(n)], dtype=object)
    q_idx = np.sort(rng.choice(n, n_queries, replace=False))
    q_dev = jnp.take(x_dev, jnp.asarray(q_idx), axis=0)

    t0 = time.monotonic()
    index = build_ivf_index(
        keys, x,
        pq_config=PQConfig(
            num_clusters=256, num_quantizers=12, max_iters=10,
            train_sample=200_000,
        ),
        num_partitions=partitions,
        strategy=LimitGroups(probe),
        coarse_max_iters=10,
    )
    build_s = time.monotonic() - t0

    # device path (what the CLI/eval now use): query_arrays returns raw
    # (dists, ids) arrays with no host Result assembly. Queries stay
    # device-resident: a 1024x96 f32 upload costs ~35 ms through the
    # ~11 MB/s tunnel and would swamp every scan number below.
    q_host = np.asarray(q_dev)
    dw, _iw = index.query_arrays(10, q_dev)  # compile + warm
    _ = np.asarray(dw[:1, :1])  # block: keep the compile out of the timing
    t0 = time.perf_counter()
    dd, _ii = index.query_arrays(10, q_dev)
    _ = np.asarray(dd[:1, :1])
    per_batch_arrays = time.perf_counter() - t0

    # full public API (host Result objects with key strings)
    results = index.batch_query(10, q_host)  # warm
    t0 = time.perf_counter()
    results = index.batch_query(10, q_host)
    per_batch = time.perf_counter() - t0

    # fused-kernel strategy (partition-padded block-min scan), fast
    # 2-winner setting first
    index.scan_strategy = "pallas"
    index.pallas_winners = 2
    dw, _iw = index.query_arrays(10, q_dev)  # compile + warm + layout build
    _ = np.asarray(dw[:1, :1])
    t0 = time.perf_counter()
    dd_p, ii_p = index.query_arrays(10, q_dev)
    _ = np.asarray(dd_p[:1, :1])
    per_batch_pallas = time.perf_counter() - t0
    results_pallas = index._make_results(dd_p, ii_p)
    index.scan_strategy = "masked"

    # single-call timings above are transport-bound (~25 ms RTT + dispatch
    # through the tunnel); device-side chained loops expose the actual
    # per-batch scan cost of each strategy
    from benchmarks.common import time_device_loop
    from gulon_tpu.models import ivf as ivf_mod

    sizes_dev = jnp.asarray(index.partition_sizes())

    def mk_step(strategy):
        def step(acc):
            qx = q_dev + acc * 1e-30
            gt, qn, _cd, pm = ivf_mod._rank_and_probe(
                qx, index.centroids, sizes_dev, kind="groups", count=probe
            )
            if strategy == "pallas":
                d_, i_ = index._query_pallas(qx, qn, gt, pm, 10)
            else:
                d_, i_ = ivf_mod._ivf_scan(
                    qx, index.pq.codebooks, index.codes, index.row_const,
                    index.group_ids, gt, pm, bounds=index.pq.bounds, k=10,
                    tile_rows=index.tile_rows, precision=index.precision,
                    topk_impl=index.topk_impl,
                    recall_target=index.recall_target,
                )
            return acc + d_[0, 0] * 1e-30 + jnp.float32(i_[0, 0] % 3) * 1e-30 + 1.0
        return step

    dev_masked = time_device_loop(mk_step("masked"), float, iters=48)
    dev_pallas = time_device_loop(mk_step("pallas"), float, iters=48)

    # default 4-winner setting (collision loss needs 5 true members in
    # one 128-row block)
    index.scan_strategy = "pallas"
    index.pallas_winners = 4
    dd_p4, ii_p4 = index.query_arrays(10, q_dev)
    results_pallas4 = index._make_results(dd_p4, ii_p4)
    dev_pallas4 = time_device_loop(mk_step("pallas"), float, iters=48)

    # 2 winners + exact f32 ADC rescore of 4k over-fetched candidates:
    # decouples in-kernel selection width (latency) from ranking fidelity
    index.pallas_winners = 2
    index.pallas_rescore = 4
    dd_pr, ii_pr = index.query_arrays(10, q_dev)
    results_pallas_rs = index._make_results(dd_pr, ii_pr)
    dev_pallas_rs = time_device_loop(mk_step("pallas"), float, iters=48)
    index.pallas_rescore = 0
    index.scan_strategy = "masked"

    # recall vs exact over raw vectors
    _, i_ex = exact_scan(q_dev, x_dev, k=10)
    i_ex = np.asarray(i_ex)
    keys_by_row = {k: i for i, k in enumerate(keys)}
    # map returned keys to original row ids via key lookup
    def _recall(res_list):
        rec = []
        for qi, res in enumerate(res_list[:256]):
            got = {keys_by_row[w] for w in res.keys}
            rec.append(len(got & set(i_ex[qi])) / 10)
        return float(np.mean(rec))

    # --- ceiling attribution (VERDICT r4 item 2): split every recall
    # into probe-coverage loss vs code-budget loss vs scan loss. Both
    # ceilings are measured in THIS run over the SAME probed partitions.
    nq_c = 256  # match _recall's query prefix

    # (a) coverage ceiling: EXACT scan over the raw vectors restricted to
    # the probed rows — the upper bound any scan can reach at this probe
    # budget (the reference's own bound for its probed scan,
    # Index.scala:273-299).
    _gt, _qn, _cd, member = ivf_mod._rank_and_probe(
        q_dev[:nq_c], index.centroids, sizes_dev, kind="groups", count=probe
    )  # member: [Qc, P] probed-partition mask
    # index.group_ids is in the index's INTERNAL (grouped) row order;
    # x_dev / i_ex are in ORIGINAL corpus order. Map partitions back to
    # original rows via the key strings or the mask misaligns and the
    # "ceiling" lands below the measured recall (round-5 bug).
    int2orig = np.fromiter(
        (keys_by_row[k] for k in np.asarray(index.key_index.keys)),
        dtype=np.int64,
        count=len(keys),
    )
    orig_gid = np.empty(len(keys), np.int32)
    orig_gid[int2orig] = np.asarray(index.group_ids)
    gid = jnp.asarray(orig_gid)  # partition of each ORIGINAL row

    def _masked_exact_ids(corpus):
        """Top-10 ids by exact L2 over `corpus`, rows outside each
        query's probed partitions masked out. Chunked over queries."""
        from gulon_tpu.ops.distance import sq_norms

        cn = sq_norms(corpus)
        out = []
        for q0 in range(0, nq_c, 128):
            qc = q_dev[q0 : q0 + 128]
            d2 = cn[None, :] - 2.0 * jnp.matmul(
                qc, corpus.T, precision=jax.lax.Precision.HIGHEST
            )  # [128, N] — f32 matmul: a CEILING must not lose near-ties
            # to bf16 operand rounding
            probed = jnp.take(member[q0 : q0 + 128], gid, axis=1)
            d2 = jnp.where(probed, d2, jnp.inf)
            _, idx = jax.lax.top_k(-d2, 10)
            out.append(np.asarray(idx))
        return np.concatenate(out)

    def _idset_recall_256(ids):
        return float(np.mean([
            len(set(ids[qi]) & set(i_ex[qi])) / 10 for qi in range(nq_c)
        ]))

    coverage_ceiling = _idset_recall_256(_masked_exact_ids(x_dev))

    # (b) probed decode ceiling: the exact ADC distance over the probed
    # rows (masked scan, f32 matmuls, exact top-k) — what a LOSSLESS scan
    # of these codes at this probe budget returns; the gap to (a) is the
    # 12 B/vector code budget, the gap from the kernel recall to (b) is
    # the kernel's selection/precision loss.
    prev = (index.scan_strategy, index.precision, index.topk_impl)
    index.scan_strategy = "masked"
    index.precision = "highest"
    index.topk_impl = "exact"
    _dc, ii_c = index.query_arrays(10, q_dev[:nq_c])
    # query_arrays returns INTERNAL row ids — go through the same
    # key-based protocol as every other recall row in this config
    decode_ceiling = _recall(index._make_results(_dc, ii_c))
    index.scan_strategy, index.precision, index.topk_impl = prev

    return _emit(
        {
            "benchmark": "ivf1m",
            "corpus": f"{n}x{d}",
            "partitions": partitions,
            "probe": probe,
            "batch": n_queries,
            "ms_per_batch_arrays": round(per_batch_arrays * 1e3, 1),
            "ms_per_batch_incl_host": round(per_batch * 1e3, 1),
            "ms_per_batch_pallas": round(per_batch_pallas * 1e3, 1),
            "device_ms_masked": round(dev_masked * 1e3, 2),
            "device_ms_pallas": round(dev_pallas * 1e3, 2),
            "device_ms_pallas_w4": round(dev_pallas4 * 1e3, 2),
            "device_ms_pallas_w2_rescore4": round(dev_pallas_rs * 1e3, 2),
            "recall_at_10_pallas": round(_recall(results_pallas), 4),
            "recall_at_10_pallas_w4": round(_recall(results_pallas4), 4),
            "recall_at_10_pallas_w2_rescore4": round(
                _recall(results_pallas_rs), 4
            ),
            "recall_at_10_vs_exact": round(_recall(results), 4),
            # ceiling attribution: recall <= scan path <= (b) <= (a) <= 1
            "coverage_ceiling_at_10": round(coverage_ceiling, 4),
            "probed_decode_ceiling_at_10": round(decode_ceiling, 4),
            # kernel recall / lossless-scan-of-the-codes recall: 1.0
            # means every point lost went to probe coverage or code
            # budget, none to the kernel
            "scan_efficiency": round(
                _recall(results_pallas4) / max(decode_ceiling, 1e-9), 4
            ),
            "build_s": round(build_s, 1),
            "device": str(jax.devices()[0]),
        }
    )


def bench_ivf_sublinear(
    n=1_000_000, d=64, m=8, partitions=1000, probe=20, n_queries=1024
):
    """Sublinear IVF strategies vs the masked full scan.

    The index is synthesized directly on device (random codes, balanced
    partitions) — scan latency depends only on shapes, and a real 1M-row
    build would move ~256 MB through the ~11 MB/s tunnel. Measures the
    exact entry-scheduled "bucketed" scan both code-resident (m bytes/row)
    and over the bf16 reconstruction cache, plus the per-query "gathered"
    path at a small batch.
    """
    import jax
    import jax.numpy as jnp

    from gulon_tpu.models.ivf import IVFIndex, LimitGroups
    from gulon_tpu.models.keyindex import GroupedKeyIndex
    from gulon_tpu.models.metric import Metric
    from gulon_tpu.ops.pq import ProductQuantizer, subspace_bounds

    bounds = subspace_bounds(d, m)
    dsub = max(w for _, w in bounds)
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    codebooks = jax.random.normal(k1, (m, 256, dsub), jnp.float32) * 0.3
    codes = jax.random.randint(k2, (n, m), 0, 256, jnp.int32).astype(
        jnp.uint8
    )
    centroids = jax.random.normal(k3, (partitions, d), jnp.float32)
    pq = ProductQuantizer(
        codebooks=codebooks, bounds=bounds, num_clusters=256
    )
    per = n // partitions
    group_ids = jnp.repeat(
        jnp.arange(partitions, dtype=jnp.int32), per
    )
    # row_const = ||r^||^2 + 2<c_g, r^>
    dec_norms = pq.reconstruction_norms(codes)
    row_const = dec_norms + 0.1 * jax.random.normal(k4, (n,), jnp.float32)
    offsets = (np.arange(1, partitions) * per).astype(np.int32)
    keys = np.empty(n, dtype=object)
    keys[:] = ""
    index = IVFIndex(
        _key_index=GroupedKeyIndex(keys=keys, group_offsets=offsets),
        pq=pq,
        codes=codes,
        row_const=row_const,
        group_ids=group_ids,
        centroids=centroids,
        metric=Metric.L2,
        strategy=LimitGroups(probe),
    )
    q = jax.random.normal(jax.random.fold_in(key, 7), (n_queries, d))

    def timed(label, fn, reps=8):
        """Per-call seconds: `reps` async dispatches, one readback.

        Host planning/upload inside fn() is synchronous and counted; the
        single trailing readback amortizes the tunnel RTT (~25 ms here,
        irrelevant on a directly-attached TPU) across reps.
        """
        d_, i_ = fn()  # compile + warm
        _ = np.asarray(d_[:1, :1])
        t0 = time.perf_counter()
        for _ in range(reps - 1):
            fn()
        d_, i_ = fn()
        _ = np.asarray(d_[:1, :1])
        best = (time.perf_counter() - t0) / reps
        print(f"  {label:28s} {best*1e3:9.2f} ms/batch")
        return best

    out = {"benchmark": "ivf_sublinear", "corpus": f"{n}x{d}",
           "partitions": partitions, "probe": probe, "batch": n_queries}
    index.scan_strategy = "masked"
    out["masked_ms"] = round(
        timed("masked full scan", lambda: index.query_arrays(10, q)) * 1e3, 2
    )

    # Bucketed path, staged: plan once on host, measure the device scan
    # with the schedule resident (through the dev tunnel a ~1 MB schedule
    # upload costs ~50-90 ms; on a directly-attached TPU it is ~0.1 ms, so
    # end-to-end == plan_ms + device_ms there).
    from gulon_tpu.models.ivf import (
        _next_pow2, _plan_entry_schedule, _regroup_pairs,
        _scan_entries_cached, _scan_entries_codes,
    )
    from gulon_tpu.ops.distance import sq_norms
    from gulon_tpu.ops.pq import split_subspaces

    sizes_np = index.partition_sizes()
    starts = np.concatenate([[0], np.cumsum(sizes_np)[:-1]]).astype(np.int32)
    cdist = (
        np.asarray(jnp.matmul(q, centroids.T)) * -2.0
        + np.asarray(jnp.sum(centroids**2, axis=1))[None, :]
    )
    probe_np = np.argsort(cdist, axis=1)[:, :probe].astype(np.int32)
    pmax = int(sizes_np.max())
    rcap = min(512, _next_pow2(pmax))
    max_occ = int(np.bincount(probe_np.ravel()).max())
    qcap = min(64, max(8, _next_pow2(max_occ)))
    kk = min(10, rcap)
    t0 = time.perf_counter()
    e_start, e_size, e_part, e_bucket, pair_slots = _plan_entry_schedule(
        probe_np, sizes_np, starts, rcap, qcap, kk
    )
    out["plan_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
    out["schedule_bytes"] = int(
        sum(a.size * 4 for a in (e_start, e_size, e_part, e_bucket,
                                 pair_slots))
    )
    dev = [jax.device_put(jnp.asarray(a))
           for a in (e_start, e_size, e_part, e_bucket, pair_slots)]
    _ = [np.asarray(a[:1]) for a in dev]  # settle uploads
    es, esz, ep, eb, psl = dev
    chunk = min(64, es.shape[0])
    q_pad = jnp.transpose(
        split_subspaces(q, pq.bounds, dsub), (1, 0, 2)
    ).reshape(n_queries, -1)
    qn = sq_norms(q)
    cn = jnp.sum(centroids**2, axis=1)
    gt = cn[None, :] - 2.0 * jnp.matmul(q, centroids.T)
    codes_pad, rc_pad = index._code_operands()

    def run_codes():
        cv, ci = _scan_entries_codes(
            q_pad, qn, gt, codebooks, codes_pad, rc_pad, es, esz, ep, eb,
            rcap=rcap, qcap=qcap, kk=kk, chunk=chunk, topk_impl="approx",
        )
        return _regroup_pairs(cv, ci, psl, k=10)

    out["bucketed_code_device_ms"] = round(
        timed("bucketed code-res (device)", run_codes) * 1e3, 2
    )
    index.enable_cache()

    def run_cached():
        cv, ci = _scan_entries_cached(
            q, index.recon_cache, index.recon_norms_cache, es, esz, eb,
            rcap=rcap, qcap=qcap, kk=kk, chunk=chunk, topk_impl="approx",
        )
        return _regroup_pairs(cv, ci, psl, k=10)

    out["bucketed_cached_device_ms"] = round(
        timed("bucketed bf16-cache (device)", run_cached) * 1e3, 2
    )
    qs = q[:8]
    index.recon_cache = None
    index.recon_norms_cache = None
    index.scan_strategy = "gathered"
    out["gathered_code_q8_ms"] = round(
        timed("gathered code-resident Q=8",
              lambda: index.query_arrays(10, qs)) * 1e3, 2,
    )
    # parity spot check: bucketed == masked id sets
    index.scan_strategy = "masked"
    index.topk_impl = "exact"
    _, im = index.query_arrays(10, q[:64])
    index.scan_strategy = "bucketed"
    _, ib = index.query_arrays(10, q[:64])
    im, ib = np.asarray(im), np.asarray(ib)
    out["bucketed_vs_masked_overlap"] = round(
        float(np.mean([len(set(im[i]) & set(ib[i])) / 10 for i in range(64)])
              ), 4,
    )
    import jax as _j
    out["device"] = str(_j.devices()[0])
    return _emit(out)


def bench_opq(n=400_000, d=100, m=8, k_codes=256, n_queries=512,
              opq_iters=4):
    """OPQ vs plain PQ at the glove100 config: quality at equal code bytes.

    Isolates *quantization* quality (the thing the learned rotation
    changes): both variants are ranked by exact top-k over f32 decoded
    reconstructions (the PQ ceiling scan of bench_adc), so scan-path
    selection noise cancels. Reports reconstruction MSE, distance-cutoff
    recall@10 (Tests.scala:22-40 protocol), and the two training times.
    """
    import jax
    import jax.numpy as jnp

    from gulon_tpu.ops.opq import reconstruction_mse, train_opq
    from gulon_tpu.ops.pq import PQConfig, train_product_quantizer
    from gulon_tpu.ops.scan import adc_scan_decode, exact_scan

    rng = np.random.default_rng(0)
    x = low_rank_corpus_device(0, n, d, intrinsic=min(32, d // 2))
    q_idx = rng.choice(n, n_queries, replace=False)
    q_dev = jnp.take(x, jnp.asarray(np.sort(q_idx)), axis=0)

    cfg = PQConfig(
        num_clusters=k_codes, num_quantizers=m, max_iters=25,
        train_sample=min(n, 200_000),
    )

    t0 = time.monotonic()
    pq_plain = train_product_quantizer(x, cfg)
    jax.block_until_ready(pq_plain.codebooks)
    plain_s = time.monotonic() - t0

    t0 = time.monotonic()
    rot, pq_opq = train_opq(x, cfg, opq_iters=opq_iters)
    jax.block_until_ready(pq_opq.codebooks)
    opq_s = time.monotonic() - t0

    mse_plain = reconstruction_mse(pq_plain, x)
    mse_opq = reconstruction_mse(pq_opq, x, rot)

    _, i_ex = exact_scan(q_dev, x, k=10)

    _dist_recall = dist_recall_fn(x, q_dev, i_ex, k=10)

    def _ceiling_ids(pq, rotation):
        q = q_dev
        xq = x
        if rotation is not None:
            q = jnp.matmul(q, rotation, precision=jax.lax.Precision.HIGHEST)
            xq = jnp.matmul(x, rotation, precision=jax.lax.Precision.HIGHEST)
        codes = []
        for s0 in range(0, n, 1 << 19):
            codes.append(pq.encode(xq[s0 : s0 + (1 << 19)]))
        codes = jnp.concatenate(codes)
        norms = pq.reconstruction_norms(codes)
        _, ids = adc_scan_decode(
            q, pq.codebooks, codes, norms, bounds=pq.bounds, k=10,
            precision="highest", decode_impl="gather", topk_impl="exact",
        )
        return ids

    r_plain = _dist_recall(_ceiling_ids(pq_plain, None))
    r_opq = _dist_recall(_ceiling_ids(pq_opq, rot))

    return _emit(
        {
            "benchmark": "opq",
            "corpus": f"{n}x{d}",
            "code_bytes_per_vector": m,
            "opq_iters": opq_iters,
            "mse_plain": round(mse_plain, 5),
            "mse_opq": round(mse_opq, 5),
            "mse_reduction_pct": round(
                100.0 * (1.0 - mse_opq / max(mse_plain, 1e-12)), 2
            ),
            "dist_recall_at_10_plain": round(r_plain, 4),
            "dist_recall_at_10_opq": round(r_opq, 4),
            "train_s_plain": round(plain_s, 2),
            "train_s_opq": round(opq_s, 2),
            "device": str(jax.devices()[0]),
        }
    )


CONFIGS = {
    "glove100": lambda a: bench_adc(400_000, 100, 8, 256, 1024, "glove100"),
    "opq": lambda a: bench_opq(),
    # the subspace-count stress shape: 1024d at 32 B/vector, where the
    # fixed coordinate split straddles the most correlated-dim structure
    "opq1024": lambda a: bench_opq(
        n=200_000, d=1024, m=32, k_codes=256, n_queries=256
    ),
    "glove300": lambda a: bench_adc(2_200_000, 300, 16, 256, 1024, "glove300"),
    "fasttext": lambda a: bench_exact(2_000_000, 300, 1024, "fasttext"),
    "deep10m": lambda a: bench_deep10m(a.devices),
    "ivf1m": lambda a: bench_ivf1m(),
    "ivf_sublinear": lambda a: bench_ivf_sublinear(),
    "sent1024": lambda a: bench_sent1024(),
    "kmeans": lambda a: bench_kmeans(),
    "build10m": lambda a: bench_build10m(),
}


def main():
    from gulon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("config", choices=sorted(CONFIGS))
    p.add_argument("--devices", type=int, default=1)
    args = p.parse_args()
    CONFIGS[args.config](args)


if __name__ == "__main__":
    main()
