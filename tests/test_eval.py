"""Recall harness properties: exact index must score recall 1.0; a PQ index
scores high on planted clusters; epsilon loosens the cutoff (ref Tests.scala
protocol)."""

import numpy as np
import pytest

from generators import planted_clusters, random_keys
from gulon_tpu.models.build import build_flat_index
from gulon_tpu.models.metric import Metric
from gulon_tpu.ops.pq import PQConfig
from gulon_tpu.utils.eval import (
    format_recall,
    recall_of,
    sample_ground_truth,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(23)
    n, d = 600, 16
    x, _, _ = planted_clusters(rng, n, d, 8, scale=0.3)
    keys = random_keys(rng, n)
    # 1-dim subspaces with 64 codewords each: near-exact quantization, so
    # the harness (not PQ quality) is what's being exercised.
    index = build_flat_index(
        keys,
        x,
        metric=Metric.L2,
        pq_config=PQConfig(num_clusters=64, num_quantizers=16, max_iters=30),
    )
    return keys, x, index


def test_ground_truth_shapes(setup):
    keys, x, _ = setup
    truth = sample_ground_truth(keys, x, num_samples=50, ks=(1, 5, 10))
    assert truth.queries.shape == (50, x.shape[1])
    assert set(truth.kth_distances) == {1, 5, 10}
    # self-queries: the 1-NN distance of a DB vector is ~0
    np.testing.assert_allclose(truth.kth_distances[1], 0.0, atol=1e-4)
    # kth distances non-decreasing in k
    assert np.all(truth.kth_distances[5] <= truth.kth_distances[10] + 1e-6)


def test_ks_larger_than_corpus_dropped(setup):
    keys, x, _ = setup
    truth = sample_ground_truth(keys, x, num_samples=10, ks=(1, 10, 5000))
    assert truth.ks == (1, 10)


def test_pq_index_high_recall(setup):
    keys, x, index = setup
    truth = sample_ground_truth(keys, x, num_samples=40, ks=(1, 5, 10))
    per_k = recall_of(index, truth, x, keys)
    # PQ with 8x64 codes on well-separated planted clusters: near-perfect
    assert per_k[10].mean > 0.8, format_recall(per_k)
    assert per_k[10].count == 40


def test_epsilon_monotone(setup):
    keys, x, index = setup
    truth = sample_ground_truth(keys, x, num_samples=30, ks=(5, 10))
    tight = recall_of(index, truth, x, keys, epsilon=0.0)
    loose = recall_of(index, truth, x, keys, epsilon=0.5)
    for k in (5, 10):
        assert loose[k].mean >= tight[k].mean - 1e-9


def test_exactish_index_perfect_recall():
    """An index with lossless codes scores exactly 1.0 — the harness's
    self-consistency check. The lossless index is constructed directly
    (codebook = the points themselves, one code per row) so the property
    always asserts instead of depending on k-means memorizing."""
    import jax.numpy as jnp

    from gulon_tpu.models.flat import FlatIndex
    from gulon_tpu.models.keyindex import SortedKeyIndex
    from gulon_tpu.models.metric import Metric
    from gulon_tpu.ops.pq import ProductQuantizer, subspace_bounds

    rng = np.random.default_rng(7)
    n, d, K = 60, 8, 64
    x = rng.normal(size=(n, d)).astype(np.float32)
    keys = random_keys(rng, n)
    order = np.argsort(keys, kind="stable")
    keys_s, x_s = keys[order], x[order]
    cb = np.zeros((1, K, d), np.float32)
    cb[0, :n] = x_s
    pq = ProductQuantizer(
        codebooks=jnp.asarray(cb),
        bounds=subspace_bounds(d, 1),
        num_clusters=K,
    )
    codes = jnp.asarray(np.arange(n, dtype=np.uint8)[:, None])
    index = FlatIndex(
        _key_index=SortedKeyIndex(keys_s),
        pq=pq,
        codes=codes,
        recon_norms=pq.reconstruction_norms(codes),
        metric=Metric.L2,
    )
    dec = np.asarray(index.pq.decode(np.asarray(index.codes)))
    np.testing.assert_array_equal(dec, x_s)  # lossless by construction
    truth = sample_ground_truth(keys, x, num_samples=20, ks=(1, 5, 10))
    per_k = recall_of(index, truth, x, keys)
    for k in (1, 5, 10):
        assert per_k[k].mean == pytest.approx(1.0), format_recall(per_k)


def test_progress_reports(setup):
    keys, x, index = setup
    truth = sample_ground_truth(keys, x, num_samples=20, ks=(1, 10))
    reports = []
    recall_of(index, truth, x, keys, report_fn=reports.append, batch_size=8)
    assert reports[-1].completed == 20
    assert reports[-1].qps > 0


def test_for_queries_matches_sample_on_same_rows(setup):
    """Tests.forQueries (Tests.scala:100-107): sampling IS forQueries on
    the sampled rows — both builders must produce identical truth."""
    from gulon_tpu.utils.eval import ground_truth_for_queries

    keys, x, _ = setup
    sampled = sample_ground_truth(keys, x, num_samples=40, ks=(1, 5, 10))
    explicit = ground_truth_for_queries(
        sampled.queries, x, ks=(1, 5, 10), query_keys=sampled.query_keys
    )
    for k in (1, 5, 10):
        np.testing.assert_array_equal(
            sampled.kth_distances[k], explicit.kth_distances[k]
        )


def test_for_queries_external_recall(setup):
    """External (non-corpus) queries: an exact-quantization index scores
    near-perfect recall against forQueries ground truth."""
    from gulon_tpu.utils.eval import ground_truth_for_queries

    keys, x, index = setup
    rng = np.random.default_rng(77)
    queries = x[rng.choice(len(x), 30, replace=False)]
    queries = queries + rng.normal(0, 0.01, queries.shape).astype(np.float32)
    truth = ground_truth_for_queries(queries, x, ks=(1, 10))
    assert len(truth.query_keys) == 30  # synthesized names
    per_k = recall_of(index, truth, x, keys, epsilon=0.05)
    assert per_k[10].mean > 0.9


def test_for_queries_cosine_normalizes_both_sides():
    from gulon_tpu.utils.eval import ground_truth_for_queries

    rng = np.random.default_rng(5)
    x = rng.normal(size=(200, 8)).astype(np.float32)
    q = rng.normal(size=(10, 8)).astype(np.float32) * 100.0
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    a = ground_truth_for_queries(q, x, ks=(5,), normalize=True)
    b = ground_truth_for_queries(qn, xn, ks=(5,))
    np.testing.assert_allclose(
        a.kth_distances[5], b.kth_distances[5], rtol=1e-5, atol=1e-6
    )
