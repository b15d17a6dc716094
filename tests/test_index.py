import numpy as np
import pytest

from generators import planted_clusters, random_keys
from gulon_tpu.models.build import build_flat_index
from gulon_tpu.models.metric import Metric
from gulon_tpu.ops.pq import PQConfig


@pytest.fixture(scope="module", params=[Metric.L2, Metric.COSINE])
def flat(request):
    rng = np.random.default_rng(17)
    n, d = 400, 12
    x, _, _ = planted_clusters(rng, n, d, 6, scale=0.4)
    keys = random_keys(rng, n)
    index = build_flat_index(
        keys,
        x,
        metric=request.param,
        pq_config=PQConfig(
            num_clusters=16, num_quantizers=4, max_iters=20, block_rows=128
        ),
    )
    index.tile_rows = 64  # force multi-tile streaming
    index.precision = "highest"  # exact-parity assertions below
    return index, keys, x


def _expected_bruteforce(index, queries, k):
    """Exact NN over the decoded vectors — the key parity property
    (ref IndexSpec:24-43)."""
    codes = np.asarray(index.codes)
    decoded = np.asarray(index.pq.decode(codes))
    if index.metric.normalized:
        qn = np.linalg.norm(queries, axis=1, keepdims=True)
        queries = np.where(qn > 0, queries / np.where(qn > 0, qn, 1), queries)
    d = ((queries[:, None, :] - decoded[None, :, :]) ** 2).sum(-1)
    order = np.argsort(d, axis=1, kind="stable")[:, :k]
    return d, order


@pytest.mark.parametrize("strategy", ["decode", "lut"])
def test_query_matches_bruteforce_on_decoded(flat, strategy):
    index, keys, x = flat
    index.scan_strategy = strategy
    rng = np.random.default_rng(3)
    queries = x[rng.choice(len(x), 20, replace=False)] + rng.normal(
        0, 0.05, (20, x.shape[1])
    ).astype(np.float32)
    k = 10
    results = index.batch_query(k, queries)
    d, order = _expected_bruteforce(index, queries.astype(np.float32), k)
    for qi, res in enumerate(results):
        assert len(res) == k
        expected_d = np.sort(d[qi])[:k]
        np.testing.assert_allclose(
            res.distances, expected_d, rtol=1e-3, atol=1e-3
        )
        # distances ascending
        assert np.all(np.diff(res.distances) >= -1e-6)


def test_lut_and_decode_strategies_agree(flat):
    index, keys, x = flat
    rng = np.random.default_rng(5)
    queries = x[:8] + rng.normal(0, 0.02, (8, x.shape[1])).astype(np.float32)
    index.scan_strategy = "lut"
    r_lut = index.batch_query(5, queries)
    index.scan_strategy = "decode"
    r_dec = index.batch_query(5, queries)
    for a, b in zip(r_lut, r_dec):
        np.testing.assert_allclose(a.distances, b.distances, rtol=1e-3, atol=1e-3)


def test_query_by_word_finds_itself(flat):
    """Duplicate-aware, like the reference's IndexSpec:45-73: rows sharing
    the word's exact PQ codes tie at distance 0, so k must cover them."""
    index, keys, x = flat
    codes = np.asarray(index.codes)
    key_list = list(index.key_index.keys)
    for word in keys[:10]:
        row = key_list.index(word)
        dups = int((codes == codes[row]).all(axis=1).sum())
        res = index.query_by_word(dups + 3, word)
        assert res is not None
        assert word in set(res.keys)
        if not index.metric.normalized:
            # under L2 the query IS the word's reconstruction -> distance 0;
            # under cosine the query gets re-normalized (Index.scala:324-331)
            # so the self-distance is only near zero.
            assert res.distances[list(res.keys).index(word)] == pytest.approx(
                0.0, abs=1e-3
            )
    assert index.query_by_word(3, "\x00not-a-word") is None


def test_lookup_returns_reconstruction(flat):
    index, keys, x = flat
    vec = index.lookup(keys[0])
    assert vec is not None and vec.shape == (x.shape[1],)
    row = index.key_index.lookup(keys[0])
    expected = np.asarray(index.pq.decode(index.codes[row : row + 1]))[0]
    np.testing.assert_allclose(vec, expected, atol=1e-6)


def test_k_larger_than_index(flat):
    index, keys, x = flat
    res = index.query(10_000, x[0])
    assert len(res) == index.size


def test_pack_memory_preserves_results():
    """In-HBM packed sub-byte codes: 2-4x memory, identical query results,
    lookup still decodes (memory counterpart of the wire Coder)."""
    rng = np.random.default_rng(55)
    x = rng.normal(size=(1500, 12)).astype(np.float32)
    keys = np.array([f"p{i:04d}" for i in range(1500)], dtype=object)
    index = build_flat_index(
        keys, x,
        pq_config=PQConfig(num_clusters=4, num_quantizers=6, max_iters=8),
    )
    index.scan_strategy = "decode"
    q = x[:6]
    a = index.batch_query(7, q)
    before = np.asarray(index.codes).nbytes
    index.pack_memory()
    assert index.packed_width == 2  # 4 clusters -> 2-bit codes
    # 6 subquantizers x 2 bits -> ceil(12/8) = 2 bytes/row (was 6)
    assert np.asarray(index.codes).shape[1] == 2
    assert np.asarray(index.codes).nbytes < before
    b = index.batch_query(7, q)
    for ra, rb in zip(a, b):
        assert list(ra.keys) == list(rb.keys)
        np.testing.assert_allclose(ra.distances, rb.distances, rtol=1e-5)
    # lookup still reconstructs
    vec = index.lookup("p0003")
    assert vec is not None and vec.shape == (12,)
    # incompatible strategies refuse clearly
    index.scan_strategy = "lut"
    with pytest.raises(ValueError):
        index.batch_query(3, q)
