"""glove300 selection-quality bisection: is the fused kernel's recall gap
vs the exact-decode ceiling caused by bf16 score noise (near-tie band) or
by block-granularity selection? Dev tool.

Measures distance-cutoff recall@10 for: exact-f32 decode scan (ceiling),
bf16 decode scan, fused kernel raw, fused kernel + f32 rerank at several
over-fetch widths.
"""

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
    import numpy as np

    from benchmarks.common import low_rank_corpus_device
    from gulon_tpu.ops.pq import PQConfig, train_product_quantizer
    from gulon_tpu.ops.scan import adc_scan_decode, exact_scan, rescore_exact
    from gulon_tpu.ops.pallas.adc import adc_scan_pallas, pack_codes_t

    n, d, m, K = 2_200_000, 300, 16, 256
    rng = np.random.default_rng(0)
    x = low_rank_corpus_device(0, n, d, intrinsic=32)
    q_idx = np.sort(rng.choice(n, 256, replace=False))
    q = jnp.take(x, jnp.asarray(q_idx), axis=0)

    pq = train_product_quantizer(
        x, PQConfig(num_clusters=K, num_quantizers=m, max_iters=25,
                    train_sample=200_000),
    )
    codes = pq.encode(x)
    norms = pq.reconstruction_norms(codes)
    codes_t = pack_codes_t(np.asarray(codes), K)

    _, i_ex = exact_scan(q, x, k=10)

    def true_d(ids):
        rows = jnp.take(
            x, jnp.asarray(np.maximum(np.asarray(ids), 0)).reshape(-1),
            axis=0,
        ).reshape(256, -1, x.shape[1])
        return np.asarray(
            jnp.sum((rows - q[:, None, :]) ** 2, axis=-1)
        )

    cutoff = true_d(i_ex)[:, -1] * (1 + 1e-6)

    def dist_recall(ids):
        dd = np.where(np.asarray(ids) >= 0, true_d(ids), np.inf)
        return float((dd[:, :10] <= cutoff[:, None]).mean())

    _, i_hi = adc_scan_decode(
        q, pq.codebooks, codes, norms, bounds=pq.bounds, k=10,
        precision="highest", decode_impl="gather", topk_impl="exact",
    )
    print(f"decode f32-highest (ceiling): {dist_recall(i_hi):.4f}")
    _, i_bf = adc_scan_decode(
        q, pq.codebooks, codes, norms, bounds=pq.bounds, k=10,
        precision="default", topk_impl="exact",
    )
    print(f"decode bf16 default:          {dist_recall(i_bf):.4f}")
    _, i_k1 = adc_scan_pallas(
        q, pq.codebooks, codes_t, norms, bounds=pq.bounds, k=10,
        num_rows=n,
    )
    print(f"fused kernel raw:             {dist_recall(i_k1):.4f}")
    for fetch, winners in ((40, 1), (120, 1), (120, 2), (120, 4)):
        _, cand = adc_scan_pallas(
            q, pq.codebooks, codes_t, norms, bounds=pq.bounds, k=fetch,
            num_rows=n, winners=winners,
        )
        _, i_rr = rescore_exact(
            q, pq.codebooks, codes, norms, cand, bounds=pq.bounds, k=10,
        )
        print(
            f"fused + f32 rerank({fetch:3d}) w{winners}:  "
            f"{dist_recall(i_rr):.4f}"
        )

    # the VERDICT r3 item-3 acceptance measurement: DEFAULT FlatIndex
    # construction (auto rerank/winners from the code-degeneracy stat) —
    # the fused path must reach >= 0.99x of the decode ceiling
    from gulon_tpu.models.flat import FlatIndex
    from gulon_tpu.models.keyindex import SortedKeyIndex
    from gulon_tpu.models.metric import Metric

    keys = np.empty(n, dtype=object)
    keys[:] = ""
    index = FlatIndex(
        _key_index=SortedKeyIndex(keys), pq=pq, codes=codes,
        recon_norms=norms, metric=Metric.L2,
    )
    index._pallas_codes_t = codes_t
    rf = index.resolved_rerank_factor()
    w = index.resolved_pallas_winners()
    print(
        f"auto knobs: dup={index._code_duplication():.2f} "
        f"rerank={rf} winners={w}"
    )
    index.scan_strategy = "pallas"
    _, i_def = index.query_arrays(10, q)
    ceiling = dist_recall(i_hi)
    got = dist_recall(i_def)
    print(
        f"DEFAULT FlatIndex (auto):     {got:.4f} "
        f"({got / max(ceiling, 1e-9):.4f}x of ceiling)"
    )


if __name__ == "__main__":
    main()
