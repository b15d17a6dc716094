"""BASELINE-bar oracle parity at the BASELINE dimensionality.

Measures ours/oracle recall@10 at ~500k x 300d, PQ 16x256 — the
"GloVe 840B-300d"-class configuration (16 code bytes/vector). The oracle
is ``tests/oracle.py``: an independent pure-numpy reimplementation of the
reference's exact Lloyd/PQ semantics (``KMeans.scala:24-55,188-226``,
``ProductQuantizer.scala:121-153`` — random tie-break, with-replacement
init, empty->zero, assignment-fixpoint convergence). The bar is the
BASELINE "recall@10 >= 0.95x reference at equal code bytes" requirement,
previously measured only at 100d shapes (VERDICT r4 item 3 / weak #3).

The oracle trains on the host CPU (minutes); our build runs on whatever
jax backend is live (TPU through the tunnel, or CPU). Both sides train
on the FULL corpus with the same iteration budget and are evaluated with
the identical protocol (exact NN over each reconstruction vs exact NN
over the raw corpus, id-set recall@10 over 256 self-queries).

Usage: python benchmarks/oracle300.py [n] [iters]   (defaults 500000, 15)
Result recorded in benchmarks/RESULTS.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
    ),
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    d, m, k_codes = 300, 16, 256
    n_q = 256

    from generators import planted_clusters, random_keys
    from oracle import recall_at_k, train_pq_reference

    rng = np.random.default_rng(20260819)
    # 1024 planted clusters at unit scale: cluster structure comparable
    # to the glove300 bench corpus (intrinsic structure + broad noise)
    t0 = time.monotonic()
    x, _, _ = planted_clusters(rng, n, d, 1024, scale=1.0)
    q_ids = rng.choice(n, n_q, replace=False)
    queries = x[q_ids]
    print(f"corpus {n}x{d} generated in {time.monotonic()-t0:.1f}s",
          flush=True)

    # --- ours (jax; TPU if the tunnel is up) ---
    t0 = time.monotonic()
    from gulon_tpu.models.build import build_flat_index
    from gulon_tpu.ops.pq import PQConfig
    from gulon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    keys = random_keys(rng, n)
    index = build_flat_index(
        keys, x,
        pq_config=PQConfig(
            num_clusters=k_codes, num_quantizers=m, max_iters=iters,
            precision="highest",
        ),
    )
    order = np.argsort(keys, kind="stable")
    recon_sorted = np.asarray(index.pq.decode(index.codes))
    recon_ours = np.empty_like(recon_sorted)
    recon_ours[order] = recon_sorted
    ours_s = time.monotonic() - t0
    print(f"ours trained+decoded in {ours_s:.1f}s", flush=True)

    t0 = time.monotonic()
    r_ours = recall_at_k(queries, x, recon_ours, k=10)
    print(f"ours recall@10 = {r_ours:.4f} "
          f"(eval {time.monotonic()-t0:.1f}s)", flush=True)
    del recon_ours, recon_sorted, index

    # --- oracle (numpy, reference semantics) ---
    t0 = time.monotonic()
    recon_ref = train_pq_reference(x, m, k_codes, max_iters=iters)
    oracle_s = time.monotonic() - t0
    print(f"oracle trained in {oracle_s:.1f}s", flush=True)
    r_oracle = recall_at_k(queries, x, recon_ref, k=10)

    ratio = r_ours / max(r_oracle, 1e-9)
    print(
        f"\n[oracle300] n={n} d={d} PQ {m}x{k_codes} iters={iters} "
        f"code_bytes={m}\n"
        f"  oracle recall@10 = {r_oracle:.4f}\n"
        f"  ours   recall@10 = {r_ours:.4f}\n"
        f"  ratio ours/oracle = {ratio:.4f}  "
        f"(BASELINE bar: >= 0.95)",
        flush=True,
    )
    if ratio < 0.95:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
