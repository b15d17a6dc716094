import numpy as np
import pytest

from generators import planted_clusters, random_keys
from gulon_tpu.models.build import build_ivf_index
from gulon_tpu.models.ivf import LimitGroups, LimitVectors
from gulon_tpu.models.metric import Metric
from gulon_tpu.ops.pq import PQConfig


@pytest.fixture(scope="module")
def ivf():
    rng = np.random.default_rng(23)
    n, d = 500, 10
    x, _, _ = planted_clusters(rng, n, d, 8, scale=0.3, spread=2.0)
    keys = random_keys(rng, n)
    index = build_ivf_index(
        keys,
        x,
        metric=Metric.L2,
        pq_config=PQConfig(
            num_clusters=16, num_quantizers=5, max_iters=20, block_rows=128
        ),
        num_partitions=10,
        strategy=LimitGroups(4),
        coarse_max_iters=20,
    )
    index.tile_rows = 128
    index.precision = "highest"  # exact-parity assertions below
    return index, keys, x


def _reference_probe_and_scan(index, queries, k):
    """Reimplement GroupedIndex.query host-side (Index.scala:267-299)."""
    centroids = np.asarray(index.centroids)
    codes = np.asarray(index.codes)
    residuals = np.asarray(index.pq.decode(codes))
    gids = np.asarray(index.group_ids)
    sizes = index.partition_sizes()
    results = []
    for q in queries:
        cd = ((q[None, :] - centroids) ** 2).sum(-1)
        order = np.argsort(cd, kind="stable")
        if isinstance(index.strategy, LimitGroups):
            probed = order[: index.strategy.count]
        else:
            cum = 0
            probed = []
            for g in order:
                if cum >= index.strategy.count:
                    break
                probed.append(g)
                cum += sizes[g]
            probed = np.array(probed)
        mask = np.isin(gids, probed)
        rows = np.nonzero(mask)[0]
        recon = residuals[rows] + centroids[gids[rows]]
        d = ((q[None, :] - recon) ** 2).sum(-1)
        top = np.argsort(d, kind="stable")[:k]
        results.append((rows[top], np.sort(d)[:k]))
    return results


def test_grouping_invariants(ivf):
    index, keys, x = ivf
    # centroids == offsets + 1 invariant (Index.scala:241-242)
    assert index.num_partitions == len(index.key_index.group_offsets) + 1
    # keys sorted within each group
    for g in range(index.num_partitions):
        s, e = index.key_index.group_bounds(g)
        grp = list(index.key_index.keys[s:e])
        assert grp == sorted(grp)
    # group ids nondecreasing
    gids = np.asarray(index.group_ids)
    assert np.all(np.diff(gids) >= 0)
    # no empty groups
    assert (index.partition_sizes() > 0).all()


@pytest.mark.parametrize("strategy_kind", ["groups", "vectors"])
def test_ivf_query_matches_reference_semantics(ivf, strategy_kind):
    index, keys, x = ivf
    if strategy_kind == "groups":
        index.strategy = LimitGroups(4)
    else:
        index.strategy = LimitVectors(150)
    rng = np.random.default_rng(7)
    queries = x[rng.choice(len(x), 12, replace=False)].astype(np.float32)
    k = 8
    got = index.batch_query(k, queries)
    expected = _reference_probe_and_scan(index, queries, k)
    for res, (exp_rows, exp_d) in zip(got, expected):
        np.testing.assert_allclose(
            res.distances, exp_d[: len(res)], rtol=2e-3, atol=2e-3
        )


def test_ivf_lookup_and_query_by_word(ivf):
    index, keys, x = ivf
    for word in keys[:5]:
        vec = index.lookup(word)
        assert vec is not None
        res = index.query_by_word(5, word)
        assert word in set(res.keys)
        assert res.distances[list(res.keys).index(word)] == pytest.approx(
            0.0, abs=1e-3
        )


def test_ivf_cosine_roundtrip():
    rng = np.random.default_rng(31)
    n, d = 200, 8
    x, _, _ = planted_clusters(rng, n, d, 4, scale=0.3)
    keys = random_keys(rng, n)
    index = build_ivf_index(
        keys,
        x,
        metric=Metric.COSINE,
        pq_config=PQConfig(
            num_clusters=8, num_quantizers=4, max_iters=15, block_rows=64
        ),
        num_partitions=5,
        strategy=LimitGroups(5),  # probe everything -> flat equivalence
    )
    res = index.query_by_word(3, keys[0])
    assert keys[0] in set(res.keys)


def test_gathered_strategy_matches_masked():
    """The sublinear gathered scan returns the same probed results as the
    masked full scan (both implement the reference's probed-partition
    semantics, Index.scala:267-283)."""
    from generators import planted_clusters, random_keys
    from gulon_tpu.models.build import build_ivf_index
    from gulon_tpu.models.ivf import LimitGroups, LimitVectors
    from gulon_tpu.models.metric import Metric
    from gulon_tpu.ops.pq import PQConfig

    rng = np.random.default_rng(13)
    x, _, _ = planted_clusters(rng, 4000, 20, 8, scale=0.3)
    keys = random_keys(rng, 4000)
    for strategy in (LimitGroups(5), LimitVectors(900)):
        index = build_ivf_index(
            keys, x,
            metric=Metric.COSINE,
            pq_config=PQConfig(
                num_clusters=32, num_quantizers=5, max_iters=8
            ),
            num_partitions=14,
            strategy=strategy,
        )
        q = (x[:10] + rng.normal(0, 0.02, (10, 20))).astype(np.float32)
        a = index.batch_query(7, q)
        index.scan_strategy = "gathered"
        index.topk_impl = "exact"
        b = index.batch_query(7, q)
        assert index.recon_cache is not None  # lazily built
        for ra, rb in zip(a, b):
            np.testing.assert_allclose(
                ra.distances, rb.distances, rtol=2e-2, atol=1e-2
            )
            assert set(ra.keys) == set(rb.keys)


def test_gathered_rejects_bogus_strategy():
    from generators import planted_clusters, random_keys
    from gulon_tpu.models.build import build_ivf_index
    from gulon_tpu.ops.pq import PQConfig

    rng = np.random.default_rng(3)
    x, _, _ = planted_clusters(rng, 500, 8, 4)
    index = build_ivf_index(
        random_keys(rng, 500), x,
        pq_config=PQConfig(num_clusters=8, num_quantizers=2, max_iters=5),
        num_partitions=4,
    )
    index.scan_strategy = "compacted"
    with pytest.raises(ValueError):
        index.query(3, x[0])


def test_bucketed_strategy_matches_masked():
    """Partition-centric bucketed scan returns the masked scan's results
    (same probed-partition semantics; zero overflow at default qcap)."""
    from generators import planted_clusters, random_keys
    from gulon_tpu.models.build import build_ivf_index
    from gulon_tpu.models.ivf import LimitGroups, LimitVectors
    from gulon_tpu.ops.pq import PQConfig

    rng = np.random.default_rng(23)
    x, _, _ = planted_clusters(rng, 6000, 24, 12, scale=0.3)
    keys = random_keys(rng, 6000)
    for strategy in (LimitGroups(4), LimitVectors(900)):
        index = build_ivf_index(
            keys, x,
            pq_config=PQConfig(
                num_clusters=32, num_quantizers=6, max_iters=8
            ),
            num_partitions=20,
            strategy=strategy,
        )
        q = (x[:32] + rng.normal(0, 0.02, (32, 24))).astype(np.float32)
        a = index.batch_query(8, q)
        index.scan_strategy = "bucketed"
        index.topk_impl = "exact"
        b = index.batch_query(8, q)
        assert index.last_overflow == 0
        for ra, rb in zip(a, b):
            np.testing.assert_allclose(
                ra.distances, rb.distances, rtol=2e-2, atol=1e-2
            )
            assert set(ra.keys) == set(rb.keys)
