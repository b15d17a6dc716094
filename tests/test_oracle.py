"""Recall parity vs an independent reimplementation of the reference.

BASELINE's primary quality bar ("recall@10 >= 0.95x the reference at equal
code bytes") was previously argued only against this repo's own PQ ceiling;
here it is measured against a from-scratch numpy implementation of the
reference's exact Lloyd/PQ semantics (see ``oracle.py`` — random tie-break,
with-replacement init, empty->zero, assignment-fixpoint convergence).
"""

import numpy as np
import pytest

from generators import planted_clusters, random_keys
from oracle import recall_at_k, train_pq_reference
from gulon_tpu.models.build import build_flat_index
from gulon_tpu.ops.pq import PQConfig


def test_recall_ratio_vs_reference_oracle():
    rng = np.random.default_rng(42)
    n, d, m, k_codes = 6000, 32, 8, 32
    x, _, _ = planted_clusters(rng, n, d, 24, scale=1.0)
    q_ids = rng.choice(n, 200, replace=False)
    queries = x[q_ids]

    # oracle: reference-semantics PQ, recall over its reconstruction
    recon_ref = train_pq_reference(x, m, k_codes, max_iters=25)
    r_oracle = recall_at_k(queries, x, recon_ref, k=10)

    # this framework at the same code budget, exact-parity query settings
    keys = random_keys(rng, n)
    index = build_flat_index(
        keys, x,
        pq_config=PQConfig(
            num_clusters=k_codes, num_quantizers=m, max_iters=25,
            precision="highest",
        ),
    )
    # recall over OUR reconstruction, same protocol (queries are raw rows;
    # key order permuted the corpus, so map ids back through the key sort)
    order = np.argsort(keys, kind="stable")
    recon_ours_sorted = np.asarray(index.pq.decode(index.codes))
    recon_ours = np.empty_like(recon_ours_sorted)
    recon_ours[order] = recon_ours_sorted
    r_ours = recall_at_k(queries, x, recon_ours, k=10)

    assert r_oracle > 0.3, f"oracle degenerate: {r_oracle}"
    ratio = r_ours / r_oracle
    assert ratio >= 0.95, (
        f"recall ratio {ratio:.3f} (ours {r_ours:.3f} vs oracle "
        f"{r_oracle:.3f}) below the 0.95x BASELINE bar"
    )


def test_oracle_sane_on_spread_data():
    """Sanity: with one dim per subspace and a generous codebook the oracle
    reconstructs spread gaussian data finely enough for high recall —
    guards against a broken oracle making the ratio test vacuous."""
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2000, 8)).astype(np.float32)
    recon = train_pq_reference(x, 8, 64, max_iters=30)
    r = recall_at_k(x[:100], x, recon, k=5)
    assert r > 0.6, r


@pytest.mark.slow
def test_recall_ratio_vs_oracle_at_scale():
    """The >= 0.95x BASELINE ratio at a production-class shape: 100k x
    100d, PQ 8x256 (the glove100 configuration scaled to what a CPU run
    tolerates). Round-2 verdict: the ratio was previously asserted only
    at a 6k x 32d toy."""
    rng = np.random.default_rng(1234)
    n, d, m, k_codes = 100_000, 100, 8, 256
    x, _, _ = planted_clusters(rng, n, d, 64, scale=1.0)
    q_ids = rng.choice(n, 256, replace=False)
    queries = x[q_ids]

    recon_ref = train_pq_reference(x, m, k_codes, max_iters=15)
    r_oracle = recall_at_k(queries, x, recon_ref, k=10)

    keys = random_keys(rng, n)
    index = build_flat_index(
        keys, x,
        pq_config=PQConfig(
            num_clusters=k_codes, num_quantizers=m, max_iters=15,
            precision="highest",
        ),
    )
    order = np.argsort(keys, kind="stable")
    recon_ours_sorted = np.asarray(index.pq.decode(index.codes))
    recon_ours = np.empty_like(recon_ours_sorted)
    recon_ours[order] = recon_ours_sorted
    r_ours = recall_at_k(queries, x, recon_ours, k=10)

    # absolute recall at 8 bytes/vector over a 100d near-uniform corpus is
    # genuinely low (~0.15 here, ~0.19 on the glove100 bench corpus) — the
    # BASELINE bar is the RATIO at equal code bytes, not the absolute
    assert r_oracle > 0.05, f"oracle degenerate: {r_oracle}"
    ratio = r_ours / r_oracle
    assert ratio >= 0.95, (
        f"recall ratio {ratio:.3f} (ours {r_ours:.3f} vs oracle "
        f"{r_oracle:.3f}) below the 0.95x BASELINE bar at 100k x 100d"
    )


@pytest.mark.slow
def test_tie_break_rule_is_immaterial_at_scale():
    """KMeans.scala:47 breaks exact-equal assignment ties with a seeded
    coin flip; the rebuild picks the smallest index (ops/distance.py).
    The oracle itself run both ways at 100k x 100d shows the recall
    difference is far below the 0.95x bar's resolution — the recorded
    null result for the one reference semantic the rebuild does not
    reproduce (measured: random 0.1551 vs first 0.1578, |delta| =
    0.0027 absolute; see benchmarks/RESULTS.md)."""
    rng = np.random.default_rng(99)
    n, d, m, k_codes = 100_000, 100, 8, 256
    x, _, _ = planted_clusters(rng, n, d, 64, scale=1.0)
    queries = x[rng.choice(n, 256, replace=False)]

    recon_rand = train_pq_reference(x, m, k_codes, max_iters=15)
    recon_first = train_pq_reference(x, m, k_codes, max_iters=15, tie="first")
    r_rand = recall_at_k(queries, x, recon_rand, k=10)
    r_first = recall_at_k(queries, x, recon_first, k=10)
    assert abs(r_rand - r_first) < 0.01, (r_rand, r_first)


@pytest.mark.slow
def test_recall_ratio_vs_oracle_at_reference_defaults_300d():
    """The same >= 0.95x ratio at the reference's DEFAULT code config and
    the BASELINE corpus dimensionality: m=25 x 256 clusters (25 B/vector,
    ``BuildIndex.scala:34,43``) over 300d rows (the 10M x 300d headline
    shape at CPU-tolerable row count). Low-rank corpus: the regime real
    300d embedding tables live in."""
    rng = np.random.default_rng(7)
    n, d, m, k_codes = 60_000, 300, 25, 256
    basis = rng.normal(size=(24, d)).astype(np.float32)
    x = (
        rng.normal(size=(n, 24)).astype(np.float32) @ basis
        + rng.normal(0, 0.3, size=(n, d)).astype(np.float32)
    )
    queries = x[rng.choice(n, 256, replace=False)]

    recon_ref = train_pq_reference(x, m, k_codes, max_iters=12)
    r_oracle = recall_at_k(queries, x, recon_ref, k=10)

    keys = random_keys(rng, n)
    index = build_flat_index(
        keys, x,
        pq_config=PQConfig(
            num_clusters=k_codes, num_quantizers=m, max_iters=12,
            precision="highest",
        ),
    )
    order = np.argsort(keys, kind="stable")
    recon_sorted = np.asarray(index.pq.decode(index.codes))
    recon_ours = np.empty_like(recon_sorted)
    recon_ours[order] = recon_sorted
    r_ours = recall_at_k(queries, x, recon_ours, k=10)

    assert r_oracle > 0.05, f"oracle degenerate: {r_oracle}"
    ratio = r_ours / r_oracle
    assert ratio >= 0.95, (
        f"recall ratio {ratio:.3f} (ours {r_ours:.3f} vs oracle "
        f"{r_oracle:.3f}) below the 0.95x bar at 60k x 300d, m=25x256"
    )
