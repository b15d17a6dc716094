"""Headline benchmark: batched ADC query throughput on one chip.

Config mirrors the BASELINE "GloVe 6B 100d" shape: 400k vectors x 100 dims,
PQ 8x256 (8 bytes/vector), 1024-query batches, top-10. The corpus is
synthetic with low intrinsic dimension (rank-16 + noise), the regime real
embedding tables live in and the one where 8-byte PQ codes are meaningful.

The reference's only published performance number is its <=5 ms/query design
budget (``README.md:10-11``); ``vs_baseline`` is measured per-query latency
against that bar.

Timing detail: the TPU tunnel in this environment adds O(10ms) RTT per host
readback and ``block_until_ready`` does not reliably block, so the query
step is iterated *device-side* (fori_loop over query-pool slices, carrying a
data dependency) and timed via the two-point (T(I) - T(1)) / (I - 1) method
with a forced scalar readback.

Build timing runs the pipeline twice: ``index_build_s`` is the warm second
pass (programs resident), ``program_load_s`` the first-pass delta — through
the tunnel even persistent-cache hits pay minutes of per-process program
loading, which is transport cost, not build work.

Prints ONE JSON line:
  {"metric": ..., "value": <us/query>, "unit": "us_per_query",
   "vs_baseline": <5000us / value>, ...extras}
"""

import json
import time

import numpy as np


def _corpus(seed, n, d):
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks.common import low_rank_corpus_device

    return low_rank_corpus_device(seed, n, d)


def main():
    import jax

    from gulon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from gulon_tpu.ops.pq import PQConfig, train_product_quantizer
    from gulon_tpu.ops.scan import adc_scan_decode, exact_scan, rescore_exact
    from gulon_tpu.ops.pallas.adc import adc_scan_pallas

    n, d = 400_000, 100
    m, k_codes = 8, 256
    n_queries, topk = 1024, 10
    pool_batches = 8  # distinct query batches cycled through device-side

    rng = np.random.default_rng(0)
    x = _corpus(0, n, d)
    q_idx = np.sort(rng.choice(n, n_queries * pool_batches, replace=False))
    q_pool = jnp.take(x, jnp.asarray(q_idx), axis=0)

    def run_build():
        t0 = time.monotonic()
        pq = train_product_quantizer(
            x,
            PQConfig(
                num_clusters=k_codes,
                num_quantizers=m,
                max_iters=25,
                train_sample=100_000,
            ),
        )
        codes = pq.encode(x)
        norms = pq.reconstruction_norms(codes)
        _ = np.asarray(norms[:1])  # force completion before stopping clock
        return pq, codes, norms, time.monotonic() - t0

    # Two passes: the first charges XLA compilation / per-process program
    # loading (through the remote tunnel even a persistent-cache HIT pays
    # minutes of server-side executable rebuild); the second runs with
    # programs resident and measures the actual build work. Reporting the
    # first-pass number as "build time" would measure the tunnel, not the
    # framework (round-2 lesson: 511 s reported vs 0.2 s of execution).
    _, _, _, cold_s = run_build()
    pq, codes, norms, build_s = run_build()
    program_load_s = max(cold_s - build_s, 0.0)

    q_pool_dev = q_pool
    # the serving path: the fused Pallas kernel (FlatIndex auto strategy on
    # TPU); codes pretransposed once at minimal width, like FlatIndex
    from gulon_tpu.ops.pallas.adc import pack_codes_t

    codes_t = pack_codes_t(np.asarray(codes), k_codes)
    n_rows = int(codes.shape[0])

    k_scan = 4 * topk  # over-fetch width for the optional rerank extra

    def query_step(q):
        return adc_scan_pallas(
            q, pq.codebooks, codes_t, norms,
            bounds=pq.bounds, k=topk, num_rows=n_rows,
        )

    import functools

    @functools.partial(jax.jit, static_argnames=("iters", "path"))
    def bench_loop(q_pool_dev, codes_op, norms, iters, path):
        def body(i, acc):
            start = (i % pool_batches) * n_queries
            q = jax.lax.dynamic_slice_in_dim(q_pool_dev, start, n_queries, 0)
            # fold acc in so iterations form a dependency chain
            if path == "pallas":
                _, cand = adc_scan_pallas(
                    q + acc * 1e-30, pq.codebooks, codes_op, norms,
                    bounds=pq.bounds, k=k_scan, num_rows=n_rows,
                )
                d_, i_ = rescore_exact(
                    q, pq.codebooks, codes, norms, cand,
                    bounds=pq.bounds, k=topk,
                )
            elif path == "pallas_raw":
                d_, i_ = adc_scan_pallas(
                    q + acc * 1e-30, pq.codebooks, codes_op, norms,
                    bounds=pq.bounds, k=topk, num_rows=n_rows,
                )
            else:
                d_, i_ = adc_scan_decode(
                    q + acc * 1e-30, pq.codebooks, codes_op, norms,
                    bounds=pq.bounds, k=topk,
                )
            return acc + d_[0, 0] + jnp.float32(jnp.sum(i_[:1, :1]))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def measure(codes_op, path):
        # iters large enough that the device-side signal (iters * per-batch)
        # dwarfs the tunnel's multi-ms RTT jitter — at ~1.4 ms/batch,
        # 64 iterations is ~90 ms of signal. The two-point difference is
        # noisy in BOTH directions, so take the median of 5 (min is biased
        # low for a differenced estimator and can report impossible values).
        iters = 64
        _ = float(bench_loop(q_pool_dev, codes_op, norms, iters, path))
        _ = float(bench_loop(q_pool_dev, codes_op, norms, 1, path))
        estimates = []
        for _rep in range(5):
            t0 = time.perf_counter()
            _ = float(bench_loop(q_pool_dev, codes_op, norms, iters, path))
            t_many = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = float(bench_loop(q_pool_dev, codes_op, norms, 1, path))
            t_one = time.perf_counter() - t0
            estimates.append((t_many - t_one) / (iters - 1))
        return max(float(np.median(estimates)), 1e-9)

    per_batch = measure(codes_t, "pallas_raw")
    per_batch_rerank = measure(codes_t, "pallas")
    per_batch_decode = measure(codes, "decode")
    us_per_query = per_batch / n_queries * 1e6
    qps = n_queries / per_batch

    # recall@10 vs exact brute force (id-set definition), plus the PQ
    # ceiling: recall of exact NN over the *decoded* vectors — the best any
    # scan of these codes can do. scan_efficiency ~= 1.0 means the query
    # path is lossless given the code budget.
    sample = 256
    d_adc, i_adc = query_step(q_pool_dev[:sample])
    _, cand = adc_scan_pallas(
        q_pool_dev[:sample], pq.codebooks, codes_t, norms,
        bounds=pq.bounds, k=k_scan, num_rows=n_rows,
    )
    _, i_rerank = rescore_exact(
        q_pool_dev[:sample], pq.codebooks, codes, norms, cand,
        bounds=pq.bounds, k=topk,
    )
    d_ex, i_ex = exact_scan(q_pool_dev[:sample], x, k=topk)
    _, i_ceil = adc_scan_decode(
        q_pool_dev[:sample], pq.codebooks, codes, norms,
        bounds=pq.bounds, k=topk,
        precision="highest", decode_impl="gather", topk_impl="exact",
    )
    i_adc = np.asarray(i_adc)
    i_rerank = np.asarray(i_rerank)
    i_ex = np.asarray(i_ex)
    i_ceil = np.asarray(i_ceil)

    def _recall(ids):
        return float(
            np.mean(
                [len(set(ids[q]) & set(i_ex[q])) / topk for q in range(sample)]
            )
        )

    recall = _recall(i_adc)
    recall_rerank = _recall(i_rerank)
    recall_ceiling = _recall(i_ceil)

    # distance-cutoff recall (the reference's own protocol,
    # Tests.scala:22-40): id-set recall is arbitrary under PQ code ties —
    # the low-intrinsic corpus collapses many rows onto identical codes,
    # and any selection that breaks those ties differently from the f32
    # ceiling scan (e.g. the kernel's lane-packed min) loses id-set
    # points while returning equally-near neighbours. A returned id
    # counts if its TRUE distance is within the true kth distance.
    from benchmarks.common import dist_recall_fn

    _dist_recall = dist_recall_fn(x, q_pool_dev[:sample], i_ex, k=topk)
    dist_recall = _dist_recall(i_adc)
    dist_recall_rerank = _dist_recall(i_rerank)
    dist_recall_ceiling = _dist_recall(i_ceil)

    print(
        json.dumps(
            {
                "metric": "batched ADC per-query latency (fused Pallas scan), 400k x 100d, PQ 8x256, batch 1024, top-10",
                "value": round(us_per_query, 3),
                "unit": "us_per_query",
                "vs_baseline": round(5000.0 / us_per_query, 1),
                "qps_per_chip": round(qps, 1),
                "xla_decode_us_per_query": round(
                    per_batch_decode / n_queries * 1e6, 3
                ),
                "rerank4_us_per_query": round(
                    per_batch_rerank / n_queries * 1e6, 3
                ),
                "recall_at_10_vs_exact": round(recall, 4),
                "recall_at_10_rerank4": round(recall_rerank, 4),
                "recall_at_10_pq_ceiling": round(recall_ceiling, 4),
                # scan_efficiency uses the distance-cutoff protocol
                # (Tests.scala:22-40); the idset_ variant is tie-arbitrary
                # on this corpus (see comment above) and kept for history
                "scan_efficiency": round(
                    dist_recall / max(dist_recall_ceiling, 1e-9), 4
                ),
                "idset_scan_efficiency": round(
                    recall / max(recall_ceiling, 1e-9), 4
                ),
                "dist_recall_at_10": round(dist_recall, 4),
                "dist_recall_at_10_rerank4": round(dist_recall_rerank, 4),
                "dist_recall_at_10_ceiling": round(dist_recall_ceiling, 4),
                "index_build_s": round(build_s, 2),
                "program_load_s": round(program_load_s, 2),
                "device": str(jax.devices()[0]),
            }
        )
    )


def _main_with_retry():
    """The tunnel's TPU backend intermittently fails to initialize
    (UNAVAILABLE) or drops mid-run; a failed init poisons the in-process
    backend cache, so retries must re-exec a fresh interpreter. Bounded
    by GULON_BENCH_ATTEMPT to avoid looping forever on a dead tunnel."""
    import os
    import sys

    attempt = int(os.environ.get("GULON_BENCH_ATTEMPT", "1"))
    max_attempts = int(os.environ.get("GULON_BENCH_MAX_ATTEMPTS", "8"))
    try:
        main()
    except Exception as e:  # noqa: BLE001 - classify, then re-exec or re-raise
        msg = str(e)
        transient = (
            "Unable to initialize backend" in msg
            or "UNAVAILABLE" in msg
            or "DEADLINE_EXCEEDED" in msg
            or "Socket closed" in msg
        )
        if not transient or attempt >= max_attempts:
            raise
        # tunnel outages here last minutes to ~an hour; back off linearly
        # (120s, 240s, ...) so 8 attempts cover ~an hour without spinning
        wait = 120 * attempt
        print(
            f"bench: transient TPU/tunnel error (attempt "
            f"{attempt}/{max_attempts}), retrying in {wait}s: "
            f"{msg.splitlines()[0][:200]}",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(wait)
        os.environ["GULON_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    _main_with_retry()
