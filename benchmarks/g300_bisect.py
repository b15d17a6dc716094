"""Bisect the glove300 fused-kernel recall gap into its noise sources.

g300_quality.py shows the fused kernel saturating at ~0.91x of the
decode-scan ceiling even with a 120x f32 rerank — so true near-cutoff rows
never enter the candidate pool. The kernel differs from the (ceiling-hitting)
decode scan in exactly three per-row-noise sources:

  S1  norms ride the matmul as TWO bf16 rows (hi/lo split, ~16-bit mantissa,
      absolute error ~2^-17 * ||x||^2, sawtooth-uncorrelated across rows)
      vs the decode scan's f32 add;
  S2  v7 selection clears the 7 low mantissa bits of the f32 score to pack
      the row-in-block (absolute error ~2^-17 * |score|, |score| ~ ||x||^2
      because the kernel scores norms - 2<q,x> WITHOUT the query norm);
  S3  one-winner-per-128-row-block granularity.

This probe emulates the kernel's exact arithmetic in XLA and toggles each
source, then measures the centered-score repair: score' = dist (add the
query norm via a query lane, center norms by their mean) which turns S1+S2
from absolute-in-norm to relative-in-distance noise. Run on the chip.
"""

import sys


def main():
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from gulon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.common import low_rank_corpus_device
    from gulon_tpu.ops.pq import PQConfig, train_product_quantizer
    from gulon_tpu.ops.scan import exact_scan, rescore_exact, split_subspaces

    n, d, m, K = 2_200_000, 300, 16, 256
    fetch = 120
    rng = np.random.default_rng(0)
    x = low_rank_corpus_device(0, n, d, intrinsic=32)
    q_idx = np.sort(rng.choice(n, 256, replace=False))
    q = jnp.take(x, jnp.asarray(q_idx), axis=0)
    nq = q.shape[0]

    pq = train_product_quantizer(
        x,
        PQConfig(
            num_clusters=K, num_quantizers=m, max_iters=25,
            train_sample=200_000,
        ),
    )
    codes = pq.encode(x)
    norms = pq.reconstruction_norms(codes)  # [N] f32
    dsub = pq.pad_width

    _, i_ex = exact_scan(q, x, k=10)
    # the one shared dist-cutoff protocol definition (Tests.scala:22-40)
    from benchmarks.common import dist_recall_fn

    dist_recall = dist_recall_fn(x, q, np.asarray(i_ex), k=10)

    # ---- kernel-arithmetic emulation ------------------------------------
    # dec rows are bf16 codebook gathers; q is bf16 at -2x scale; the matmul
    # accumulates in f32 (bf16 x bf16 products are exact in f32).
    qs = split_subspaces(q, pq.bounds, dsub)  # [m, Q, dsub]
    q_pad = jnp.transpose(qs, (1, 0, 2)).reshape(nq, m * dsub)
    q_bf = (-2.0 * q_pad).astype(jnp.bfloat16)
    qn = jnp.sum(q_pad * q_pad, axis=1)  # [Q] f32 (padded lanes are zero)
    cb_bf = pq.codebooks.astype(jnp.bfloat16)  # [m, K, dsub]

    def hi_lo(v):
        hi = v.astype(jnp.bfloat16)
        lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi.astype(jnp.float32) + lo.astype(jnp.float32)

    nmean = float(jnp.mean(norms))

    CHUNK = 448_000  # multiple of 128; 5 chunks cover 2.2M
    n_pad = ((n + CHUNK - 1) // CHUNK) * CHUNK
    codes_p = jnp.pad(codes, ((0, n_pad - n), (0, 0)))
    norms_p = jnp.pad(norms, (0, n_pad - n), constant_values=jnp.inf)

    def chunk_scores(c0, *, centered):
        ct = jax.lax.dynamic_slice(codes_p, (c0, 0), (CHUNK, m))
        nt = jax.lax.dynamic_slice(norms_p, (c0,), (CHUNK,))
        # 3.0e38 like the kernel's _BIG: anything >= ~3.396e38 rounds to
        # bf16 inf and hi_lo would produce inf - inf = NaN
        nt = jnp.minimum(nt, 3.0e38)
        dec = jnp.take_along_axis(
            cb_bf, ct.astype(jnp.int32).T[:, :, None], axis=1
        )  # [m, CHUNK, dsub] bf16
        dec = jnp.transpose(dec, (1, 0, 2)).reshape(CHUNK, m * dsub)
        ip = jax.lax.dot_general(
            q_bf, dec,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Q, CHUNK] f32 = -2<q, dec>
        if centered:
            # norms centered by their mean ride hi/lo; the per-query lane
            # restores qn + nmean so the score ~= the true ADC distance
            s = hi_lo(nt - nmean)[None, :] + ip + hi_lo(qn + nmean)[:, None]
        else:
            s = hi_lo(nt)[None, :] + ip  # the kernel today
        return s

    def clear7(s):
        b = jax.lax.bitcast_convert_type(s, jnp.int32)
        return jax.lax.bitcast_convert_type(b & ~jnp.int32(127), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("variant",))
    def scan(variant):
        def body(c0, carry):
            bv, bi = carry
            s = chunk_scores(c0 * CHUNK, centered="centered" in variant)
            if "pack7" in variant:
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (nq, CHUNK // 128, 128), 2
                )
                b = jax.lax.bitcast_convert_type(
                    s.reshape(nq, CHUNK // 128, 128), jnp.int32
                )
                packed = jax.lax.bitcast_convert_type(
                    (b & ~jnp.int32(127)) | lane, jnp.float32
                )
                if "block" in variant:
                    vmin = jnp.min(packed, axis=2)  # [Q, CHUNK/128]
                    neg, idx = jax.lax.top_k(-vmin, fetch)
                    vals = -neg
                    lanes = (
                        jax.lax.bitcast_convert_type(vals, jnp.int32) & 127
                    )
                    ids = c0 * CHUNK + idx * 128 + lanes
                else:
                    neg, idx = jax.lax.top_k(
                        -packed.reshape(nq, CHUNK), fetch
                    )
                    vals = -neg
                    ids = c0 * CHUNK + idx
            else:
                sv = clear7(s) if "clear7" in variant else s
                neg, idx = jax.lax.top_k(-sv, fetch)
                vals = -neg
                ids = c0 * CHUNK + idx
            cv = jnp.concatenate([bv, vals], axis=1)
            ci = jnp.concatenate([bi, ids], axis=1)
            nb, sel = jax.lax.top_k(-cv, fetch)
            return -nb, jnp.take_along_axis(ci, sel, axis=1)

        bv = jnp.full((nq, fetch), jnp.inf, jnp.float32)
        bi = jnp.full((nq, fetch), -1, jnp.int32)
        return jax.lax.fori_loop(0, n_pad // CHUNK, body, (bv, bi))

    def run(variant, label):
        _, cand = scan(variant)
        cand = jnp.where(cand >= n, -1, cand)
        _, i_rr = rescore_exact(
            q, pq.codebooks, codes, norms, cand, bounds=pq.bounds, k=10
        )
        print(f"{label:46s} {dist_recall(i_rr):.4f}", flush=True)

    print(f"ceiling protocol: fetch={fetch} + exact f32 rescore", flush=True)
    run("plain", "A  kernel math, exact top-fetch (no pack/block)")
    run("clear7", "B  A + 7-bit mantissa clear")
    run("pack7", "B' A + lane-pack (7 bits + lane tiebreak)")
    run("pack7+block", "C  B' + 128-block single-winner min")
    run("centered", "D  centered score, exact top-fetch")
    run("centered+pack7+block", "E  centered + pack + block (proposed)")


if __name__ == "__main__":
    main()
