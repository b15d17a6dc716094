"""ExactIndex: brute-force results, metric handling, npz round-trip,
sharded variant parity, grouped word-vectors state."""

import numpy as np
import pytest

from generators import planted_clusters, random_keys
from gulon_tpu.models.exact import ExactIndex, build_exact_index
from gulon_tpu.models.metric import Metric
from gulon_tpu.ops.kmeans import KMeansConfig, fit_kmeans
from gulon_tpu.parallel import make_mesh, shard_index
from gulon_tpu.utils.word2vec import WordVectors


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(77)
    x, _, _ = planted_clusters(rng, 1200, 16, 6, scale=0.3)
    return random_keys(rng, 1200), x


def test_exact_matches_numpy_bruteforce(data):
    keys, x = data
    index = build_exact_index(keys, x)
    index.precision = "highest"
    index.topk_impl = "exact"
    q = x[:5] + 0.01
    results = index.batch_query(8, q)
    keys_sorted = index.key_index.keys
    xs = np.asarray(index.vectors)
    for qi, res in enumerate(results):
        d = ((xs - q[qi][None]) ** 2).sum(1)
        expect = np.sort(d)[:8]
        np.testing.assert_allclose(res.distances, expect, rtol=1e-4, atol=1e-4)
        assert res.keys[0] == keys_sorted[int(np.argmin(d))]


def test_exact_cosine_and_lookup(data):
    keys, x = data
    index = build_exact_index(keys, x, metric=Metric.COSINE)
    w = keys[3]
    vec = index.lookup(w)
    assert vec is not None
    np.testing.assert_allclose(np.linalg.norm(vec), 1.0, rtol=1e-5)
    res = index.query_by_word(3, w)
    assert res.keys[0] == w
    assert index.lookup("zzz-missing") is None


def test_exact_npz_roundtrip(data, tmp_path):
    keys, x = data
    index = build_exact_index(keys, x, metric=Metric.COSINE)
    p = tmp_path / "exact.npz"
    index.save(p)
    loaded = ExactIndex.load(p)
    q = x[:4]
    a = index.batch_query(5, q)
    b = loaded.batch_query(5, q)
    for ra, rb in zip(a, b):
        assert list(ra.keys) == list(rb.keys)
        np.testing.assert_allclose(ra.distances, rb.distances, rtol=1e-6)


def test_sharded_exact_index_matches(data):
    keys, x = data
    index = build_exact_index(keys, x)
    sharded = shard_index(index, make_mesh())
    q = x[:6] + 0.02
    a = index.batch_query(7, q)
    b = sharded.batch_query(7, q)
    for ra, rb in zip(a, b):
        np.testing.assert_allclose(ra.distances, rb.distances, rtol=1e-4,
                                   atol=1e-4)
        assert list(ra.keys) == list(rb.keys)


def test_grouped_word_vectors_state(data):
    """WordVectors.grouped: stable (cluster, key) order, empty clusters
    dropped, residuals invert (ref WordVectorsSpec:73-124)."""
    keys, x = data
    wv = WordVectors(keys, x)
    res = fit_kmeans(x, KMeansConfig(k=10, max_iters=10, seed=1))
    grouped = wv.grouped(np.asarray(res.centroids), np.asarray(res.assignments))
    # groups contiguous & keys sorted within each group
    gids = grouped.group_ids
    assert np.all(np.diff(gids) >= 0)
    bounds = np.concatenate([[0], grouped.group_offsets, [len(grouped)]])
    for g in range(grouped.num_groups):
        seg = grouped.keys[bounds[g] : bounds[g + 1]]
        assert list(seg) == sorted(seg)
    # mapping preserved
    orig = {k: v for k, v in zip(keys, x)}
    for i in range(0, len(grouped), 97):
        np.testing.assert_array_equal(grouped.vectors[i], orig[grouped.keys[i]])
    # residual + centroid == original
    rec = grouped.residuals() + grouped.centroids[gids]
    np.testing.assert_allclose(rec, grouped.vectors, rtol=1e-5, atol=1e-5)
    # cluster_of consistent
    assert grouped.cluster_of(0) == gids[0]


def test_exact_index_int8_operand_matches_bf16():
    """ExactIndex(operand='int8'): same neighbours and exact distances as
    the default bf16 operand under the shared exact f32 rescore (the
    pallas strategy forced via interpret on CPU)."""
    import jax.numpy as jnp

    from benchmarks.common import low_rank_corpus_device
    from gulon_tpu.models.exact import ExactIndex, build_exact_index
    from gulon_tpu.models.metric import Metric
    import dataclasses

    n, d, k = 20480, 48, 10
    x = np.asarray(low_rank_corpus_device(9, n, d, intrinsic=12))
    keys = np.array([f"w{i:06d}" for i in range(n)], dtype=object)
    idx = build_exact_index(keys, x, Metric.L2)
    idx_bf = dataclasses.replace(idx, scan_strategy="pallas")
    idx_i8 = dataclasses.replace(idx, scan_strategy="pallas", operand="int8")
    q = jnp.asarray(x[:8])
    d_bf, i_bf = idx_bf.query_arrays(k, q)
    d_i8, i_i8 = idx_i8.query_arrays(k, q)
    d_bf, i_bf, d_i8, i_i8 = map(np.asarray, (d_bf, i_bf, d_i8, i_i8))
    agree = np.mean(
        [len(set(i_i8[j]) & set(i_bf[j])) / k for j in range(8)]
    )
    assert agree >= 0.9, agree
    # both rescore from the same f32 rows: agreeing slots match exactly
    for j in range(8):
        common = set(i_i8[j]) & set(i_bf[j])
        m_bf = {i_: v for i_, v in zip(i_bf[j], d_bf[j])}
        m_i8 = {i_: v for i_, v in zip(i_i8[j], d_i8[j])}
        for c in common:
            np.testing.assert_allclose(m_bf[c], m_i8[c], rtol=1e-4, atol=1e-4)


def test_exact_rescore_requires_rescore_factor():
    """exact_rescore=True with rescore_factor=0 would silently disable
    the re-rank and report approximate distances from an index named
    Exact — it must raise instead (ADVICE r4)."""
    import dataclasses

    import jax.numpy as jnp

    from benchmarks.common import low_rank_corpus_device

    n, d = 4096, 16
    x = np.asarray(low_rank_corpus_device(3, n, d, intrinsic=8))
    keys = np.array([f"w{i:06d}" for i in range(n)], dtype=object)
    idx = build_exact_index(keys, x, Metric.L2)
    bad = dataclasses.replace(
        idx, scan_strategy="pallas", rescore_factor=0, exact_rescore=True
    )
    with pytest.raises(ValueError, match="rescore_factor"):
        bad.query_arrays(5, jnp.asarray(x[:2]))
