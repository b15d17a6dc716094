"""Sharded-layer properties on the virtual 8-device CPU mesh.

The central property: sharding is a pure placement transform — every sharded
scan / index / trainer must produce results identical (or equal-quality for
k-means, which is seed-deterministic and therefore exactly equal) to its
single-chip counterpart.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generators import planted_clusters, random_keys
from gulon_tpu.models.build import build_flat_index, build_ivf_index
from gulon_tpu.models.ivf import LimitGroups, LimitVectors
from gulon_tpu.models.metric import Metric
from gulon_tpu.ops.kmeans import KMeansConfig, fit_kmeans, kmeans_objective
from gulon_tpu.ops.pq import PQConfig, train_product_quantizer
from gulon_tpu.ops.scan import adc_scan_decode, exact_scan
from gulon_tpu.parallel import (
    make_mesh,
    shard_index,
    shard_rows,
    sharded_adc_scan,
    sharded_exact_scan,
    sharded_fit_kmeans,
)




def _assert_same_topk(d_a, i_a, d_b, i_b, rtol=1e-4, atol=1e-4):
    """Top-k equality up to ordering within exact-distance ties (the
    reference's IndexSpec compares order-insensitively too)."""
    d_a, i_a, d_b, i_b = map(np.asarray, (d_a, i_a, d_b, i_b))
    np.testing.assert_allclose(d_a, d_b, rtol=rtol, atol=atol)
    for q in range(d_a.shape[0]):
        # ids must agree on slots whose distance is strictly untied
        da = d_a[q]
        near = np.isclose(da[1:], da[:-1], rtol=rtol, atol=atol)
        strict = np.ones(len(da), bool)
        strict[1:] &= ~near
        strict[:-1] &= ~near
        np.testing.assert_array_equal(i_a[q][strict], i_b[q][strict])
        # and be permutations overall (ties at the k boundary aside)
        assert set(i_a[q]) == set(i_b[q]) or np.allclose(
            sorted(da), sorted(d_b[q]), rtol=rtol, atol=atol
        )


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(31)
    n, d = 3000, 16
    x, _, _ = planted_clusters(rng, n, d, 8, scale=0.4)
    keys = random_keys(rng, n)
    queries = x[rng.choice(n, 12, replace=False)] + rng.normal(
        0, 0.05, (12, d)
    ).astype(np.float32)
    return keys, x, queries.astype(np.float32)


def test_mesh_shapes():
    assert dict(make_mesh().shape) == {"rows": 8, "sub": 1}
    assert dict(make_mesh(sub_parallel=2).shape) == {"rows": 4, "sub": 2}
    assert dict(make_mesh(4).shape) == {"rows": 4, "sub": 1}
    with pytest.raises(ValueError):
        make_mesh(sub_parallel=3)


def test_sharded_adc_scan_matches_single_chip(data):
    _, x, queries = data
    mesh = make_mesh()
    pq = train_product_quantizer(
        x, PQConfig(num_clusters=32, num_quantizers=4, max_iters=10)
    )
    codes = np.asarray(pq.encode(x))
    norms = np.asarray(pq.reconstruction_norms(jnp.asarray(codes)))
    d_sh, i_sh = sharded_adc_scan(
        jnp.asarray(queries),
        pq.codebooks,
        shard_rows(codes, mesh, 0),
        shard_rows(norms, mesh, np.inf),
        mesh=mesh,
        bounds=pq.bounds,
        k=10,
        tile_rows=256,
    )
    d_1c, i_1c = adc_scan_decode(
        jnp.asarray(queries), pq.codebooks, jnp.asarray(codes),
        jnp.asarray(norms), bounds=pq.bounds, k=10, tile_rows=256,
    )
    _assert_same_topk(d_sh, i_sh, d_1c, i_1c, rtol=1e-5, atol=1e-5)


def test_sharded_exact_scan_matches_single_chip(data):
    _, x, queries = data
    mesh = make_mesh()
    d_sh, i_sh = sharded_exact_scan(
        jnp.asarray(queries),
        shard_rows(x, mesh),
        shard_rows((x * x).sum(1), mesh, np.inf),
        mesh=mesh,
        k=10,
        tile_rows=256,
    )
    d_1c, i_1c = exact_scan(
        jnp.asarray(queries), jnp.asarray(x), k=10, tile_rows=256
    )
    _assert_same_topk(d_sh, i_sh, d_1c, i_1c)


def test_sharded_exact_scan_unpadded_rows():
    """Corpus size not divisible by the shard count: padding must be inert."""
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1001, 8)).astype(np.float32)
    q = x[:3]
    mesh = make_mesh()
    d_sh, i_sh = sharded_exact_scan(
        jnp.asarray(q),
        shard_rows(x, mesh),
        shard_rows((x * x).sum(1), mesh, np.inf),
        mesh=mesh,
        k=5,
        tile_rows=64,
    )
    d_1c, i_1c = exact_scan(jnp.asarray(q), jnp.asarray(x), k=5, tile_rows=64)
    np.testing.assert_allclose(
        np.asarray(d_sh), np.asarray(d_1c), rtol=1e-4, atol=1e-4
    )
    assert np.all(np.asarray(i_sh) < 1001)


@pytest.mark.parametrize("sub_parallel", [1, 2, 4])
def test_sharded_kmeans_matches_quality(data, sub_parallel):
    _, x, _ = data
    mesh = make_mesh(sub_parallel=sub_parallel)
    xs = np.stack([x[:, i * 4 : (i + 1) * 4] for i in range(4)])
    cfg = KMeansConfig(k=16, max_iters=15, seed=3)
    res_sh = sharded_fit_kmeans(xs, cfg, mesh)
    res_1c = fit_kmeans(xs, cfg)
    for s in range(4):
        o_sh = float(
            kmeans_objective(
                xs[s],
                np.asarray(res_sh.centroids)[s],
                np.asarray(res_sh.assignments)[s],
            )
        )
        o_1c = float(
            kmeans_objective(
                xs[s],
                np.asarray(res_1c.centroids)[s],
                np.asarray(res_1c.assignments)[s],
            )
        )
        # same seeded init + same update rule => identical trajectories
        assert o_sh == pytest.approx(o_1c, rel=1e-4)


def test_sharded_flat_index_matches(data):
    keys, x, queries = data
    mesh = make_mesh()
    index = build_flat_index(
        keys,
        x,
        pq_config=PQConfig(num_clusters=32, num_quantizers=4, max_iters=10),
    )
    sharded = shard_index(index, mesh)
    assert sharded.size == index.size
    index.scan_strategy = "decode"
    a = index.batch_query(8, queries)
    b = sharded.batch_query(8, queries)
    for ra, rb in zip(a, b):
        np.testing.assert_allclose(
            ra.distances, rb.distances, rtol=1e-4, atol=1e-4
        )
        # keys agree up to exact-distance ties
        tied = np.concatenate(
            [[False], np.isclose(ra.distances[1:], ra.distances[:-1],
                                 rtol=1e-4, atol=1e-4)]
        )
        tied[:-1] |= tied[1:].copy()
        # ties can also straddle the k boundary: only slots strictly below
        # the k-th distance are comparable
        cutoff = ra.distances[-1] - (1e-4 + 1e-4 * abs(ra.distances[-1]))
        cmp = ~tied & (ra.distances < cutoff)
        assert list(ra.keys[cmp]) == list(rb.keys[cmp])
    assert sharded.lookup("nope") is None


@pytest.mark.parametrize(
    "strategy", [LimitGroups(4), LimitVectors(600)]
)
def test_sharded_ivf_index_matches(data, strategy):
    keys, x, queries = data
    mesh = make_mesh()
    index = build_ivf_index(
        keys,
        x,
        metric=Metric.COSINE,
        pq_config=PQConfig(num_clusters=32, num_quantizers=4, max_iters=10),
        num_partitions=12,
        strategy=strategy,
    )
    sharded = shard_index(index, mesh)
    a = index.batch_query(8, queries)
    b = sharded.batch_query(8, queries)
    for ra, rb in zip(a, b):
        np.testing.assert_allclose(
            ra.distances, rb.distances, rtol=1e-4, atol=1e-4
        )
        tied = np.concatenate(
            [[False], np.isclose(ra.distances[1:], ra.distances[:-1],
                                 rtol=1e-4, atol=1e-4)]
        )
        tied[:-1] |= tied[1:].copy()
        # ties can also straddle the k boundary: only slots strictly below
        # the k-th distance are comparable
        cutoff = ra.distances[-1] - (1e-4 + 1e-4 * abs(ra.distances[-1]))
        cmp = ~tied & (ra.distances < cutoff)
        assert list(ra.keys[cmp]) == list(rb.keys[cmp])


def test_sharded_cached_strategy_matches(data):
    """Sharded cached-decode scan returns the same results as the
    single-chip decode scan (pure placement + storage transform)."""
    keys, x, queries = data
    index = build_flat_index(
        keys, x,
        pq_config=PQConfig(num_clusters=32, num_quantizers=4, max_iters=10),
    )
    index.scan_strategy = "decode"
    a = index.batch_query(8, queries)
    index.enable_cache()
    index.scan_strategy = "cached"
    sharded = shard_index(index, make_mesh())
    b = sharded.batch_query(8, queries)
    for ra, rb in zip(a, b):
        np.testing.assert_allclose(
            ra.distances, rb.distances, rtol=2e-2, atol=1e-2
        )
        assert len(set(ra.keys) & set(rb.keys)) >= 7  # float-tie slack


def test_sharded_cached_requires_cache(data):
    keys, x, queries = data
    index = build_flat_index(
        keys, x,
        pq_config=PQConfig(num_clusters=32, num_quantizers=4, max_iters=5),
    )
    index.scan_strategy = "cached"
    sharded = shard_index(index, make_mesh())
    with pytest.raises(ValueError):
        sharded.batch_query(3, queries[:2])


def test_sharded_k_exceeds_shard_rows():
    """k larger than rows-per-shard must not crash the approx top-k
    (regression: the final reduce used to run top_k(k) on a narrower
    candidate set)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(64, 8)).astype(np.float32)
    keys = np.array([f"s{i:03d}" for i in range(64)], dtype=np.object_)
    index = build_flat_index(
        keys, x,
        pq_config=PQConfig(num_clusters=8, num_quantizers=2, max_iters=5),
    )
    sharded = shard_index(index, make_mesh())  # 8 rows per shard
    res = sharded.batch_query(40, x[:2])  # 40 > 8 rows/shard
    assert len(res[0]) == 40
    assert np.all(np.diff(res[0].distances) >= -1e-6)


def test_sharded_bucketed_matches_single_chip(data):
    """Partition-aware sharded bucketed scan == single-chip bucketed ==
    single-chip masked (whole partitions per shard, per-shard entry scans,
    ICI top-k merge)."""
    keys, x, queries = data
    mesh = make_mesh()
    index = build_ivf_index(
        keys, x,
        pq_config=PQConfig(num_clusters=32, num_quantizers=4, max_iters=10),
        num_partitions=12,
        strategy=LimitGroups(4),
    )
    index.topk_impl = "exact"
    a = index.batch_query(8, queries)  # masked single-chip
    index.scan_strategy = "bucketed"
    sharded = shard_index(index, mesh)
    b = sharded.batch_query(8, queries)
    for ra, rb in zip(a, b):
        np.testing.assert_allclose(
            ra.distances, rb.distances, rtol=1e-4, atol=1e-4
        )
        assert set(ra.keys) == set(rb.keys)


def test_sharded_encode_matches(data):
    """Mesh-parallel bulk encode returns the single-chip code matrix."""
    from gulon_tpu.parallel.ops import sharded_encode

    keys, x, queries = data
    pq = train_product_quantizer(
        x, PQConfig(num_clusters=32, num_quantizers=4, max_iters=10)
    )
    single = np.asarray(pq.encode(x))
    mesh = make_mesh()
    # chunk smaller than the corpus to exercise the streaming path
    multi = sharded_encode(pq, x, mesh, chunk=700)
    np.testing.assert_array_equal(single, multi)


def test_mesh_build_ivf_end_to_end(data):
    """build_ivf_index(mesh=...) never funnels the corpus through one
    device (sharded coarse k-means + sharded PQ train + sharded encode)
    and queries match a replicated exact reference scan."""
    keys, x, queries = data
    mesh = make_mesh()
    index = build_ivf_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=6),
        num_partitions=8,
        strategy=LimitGroups(8),  # probe everything -> flat equivalence
        coarse_max_iters=6,
        mesh=mesh,
    )
    res = index.batch_query(5, queries[:4])
    # probing all partitions makes results flat-scan-grade: each query's
    # nearest planted neighbor should appear
    for r in res:
        assert len(r.keys) == 5


def test_sharded_kmeans_kmeanspp_init(data):
    """kmeans++ seeding works on the mesh path and lands at a sane
    objective (comparable to uniform seeding on the same budget)."""
    _, x, _ = data
    mesh = make_mesh()
    xs = np.stack([x[:, i * 4 : (i + 1) * 4] for i in range(4)])
    res_pp = sharded_fit_kmeans(
        xs, KMeansConfig(k=12, max_iters=10, seed=3, init="kmeans++"), mesh
    )
    res_u = sharded_fit_kmeans(
        xs, KMeansConfig(k=12, max_iters=10, seed=3), mesh
    )
    for s in range(4):
        o_pp = float(kmeans_objective(
            xs[s], np.asarray(res_pp.centroids)[s],
            np.asarray(res_pp.assignments)[s]))
        o_u = float(kmeans_objective(
            xs[s], np.asarray(res_u.centroids)[s],
            np.asarray(res_u.assignments)[s]))
        assert np.isfinite(o_pp)
        assert o_pp <= o_u * 1.25, (o_pp, o_u)


def test_sharded_ivf_pallas_matches_single_chip():
    """The per-shard fused-kernel IVF scan (interpret mode on the CPU
    mesh) returns the single-chip pallas strategy's results."""
    rng = np.random.default_rng(17)
    from generators import planted_clusters as _pc

    x, _, _ = _pc(rng, 4096, 16, 16, scale=0.3, spread=2.0)
    keys = random_keys(rng, 4096)
    index = build_ivf_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=6),
        num_partitions=8,
        strategy=LimitGroups(4),
        coarse_max_iters=6,
    )
    index.scan_strategy = "pallas"
    q = x[:16]
    d1, i1 = index.query_arrays(5, q)
    from gulon_tpu.parallel.index import shard_index

    sharded = shard_index(index, make_mesh())
    d8, i8 = sharded.query_arrays(5, q)
    d1, d8 = np.asarray(d1), np.asarray(d8)
    np.testing.assert_allclose(d1, d8, rtol=1e-4, atol=1e-4)
    # ids equal wherever distances are untied
    i1, i8 = np.asarray(i1), np.asarray(i8)
    for r in range(len(q)):
        tied = np.concatenate(
            [[False], np.isclose(d1[r][1:], d1[r][:-1], atol=1e-4)]
        )
        tied[:-1] |= tied[1:].copy()
        assert np.array_equal(i1[r][~tied], i8[r][~tied])


def test_sharded_ivf_pallas_rescore_matches_single_chip():
    """pallas_rescore survives sharding: per-shard exact f32 re-rank +
    ICI merge returns the single-chip rescored distances (the attribute
    was previously dropped by the sharded path)."""
    rng = np.random.default_rng(19)
    from generators import planted_clusters as _pc

    x, _, _ = _pc(rng, 4096, 16, 16, scale=0.3, spread=2.0)
    keys = random_keys(rng, 4096)
    index = build_ivf_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=6),
        num_partitions=8,
        strategy=LimitGroups(4),
        coarse_max_iters=6,
    )
    index.scan_strategy = "pallas"
    index.pallas_winners = 1
    index.pallas_rescore = 4
    q = x[:16]
    d1, _ = index.query_arrays(5, q)
    from gulon_tpu.parallel.index import shard_index

    sharded = shard_index(index, make_mesh())
    d8, _ = sharded.query_arrays(5, q)
    # exact rescored distances on both sides: sharding only changes which
    # shard evaluates a row, not its exact ADC distance
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d8), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("exact_rescore", [True, False])
def test_sharded_exact_pallas_matches_single_chip(exact_rescore):
    """Per-shard fused dense kernel (interpret mode on the CPU mesh)
    agrees with the single-chip pallas ExactIndex: same nearest
    neighbour, near-complete top-k overlap. The sharded path re-ranks
    every shard's block winners, so its distances can only improve on
    the single-chip fetch — assert one-sided closeness, not identity."""
    from gulon_tpu.models.exact import build_exact_index

    rng = np.random.default_rng(23)
    x, _, _ = planted_clusters(rng, 4096, 16, 16, scale=0.3, spread=2.0)
    keys = random_keys(rng, 4096)
    index = build_exact_index(keys, x)
    index.scan_strategy = "pallas"
    index.exact_rescore = exact_rescore
    q = x[:8]
    k = 4
    d1, i1 = map(np.asarray, index.query_arrays(k, q))
    sharded = shard_index(index, make_mesh(4))
    d8, i8 = map(np.asarray, sharded.query_arrays(k, q))
    # a DB vector's nearest neighbour is itself on both paths (rows are
    # key-sorted, so compare the two paths' ids, not the input order)
    np.testing.assert_array_equal(i1[:, 0], i8[:, 0])
    # bf16 operand rescore: 2^-8 relative on ||x||^2 ~ 60 -> ~0.4 abs
    atol = 1e-4 if exact_rescore else 0.5
    np.testing.assert_allclose(d1[:, 0], 0.0, atol=atol)
    np.testing.assert_allclose(d8[:, 0], 0.0, atol=atol)
    for r in range(len(q)):
        assert len(set(i1[r]) & set(i8[r])) >= k - 1, (i1[r], i8[r])
        # sharded re-ranks a superset of the single-chip candidates
        assert np.all(d8[r] <= d1[r] + atol + 1e-6)


def test_sharded_cached_dense_kernel_matches():
    """Forced dense-kernel sharded cached scan (interpret mode on the
    CPU mesh) returns the XLA sharded cached scan's neighbours."""
    rng = np.random.default_rng(29)
    x, _, _ = planted_clusters(rng, 4096, 16, 16, scale=0.3, spread=2.0)
    keys = random_keys(rng, 4096)
    index = build_flat_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=8),
    )
    index.enable_cache()
    index.scan_strategy = "cached"
    q = x[:8]
    k = 4
    mesh = make_mesh(4)
    sharded = shard_index(index, mesh)
    sharded.dense_cached = False
    d_x, i_x = map(np.asarray, sharded.query_arrays(k, q))
    sharded.dense_cached = True
    d_p, i_p = map(np.asarray, sharded.query_arrays(k, q))
    # the dense kernel scores a bf16 operand; the XLA path scans the f32
    # CPU cache — same neighbour quality, distances differ by bf16
    # rounding amplified through the ||x||^2 - 2<x,q> cancellation
    np.testing.assert_allclose(d_x, d_p, rtol=5e-2, atol=0.3)
    # the coarse PQ collapses whole clusters onto one code, so the tie
    # classes are huge and id sets differ freely; instead check each
    # returned id is a valid member of its tie class — its true cached
    # distance matches the reported one
    cache = np.asarray(index.decoded_cache)
    qp = np.asarray(index._q_pad(jnp.asarray(q, jnp.float32)))
    for r in range(len(q)):
        for ids, ds in ((i_x[r], d_x[r]), (i_p[r], d_p[r])):
            ref = ((cache[ids] - qp[r]) ** 2).sum(1)
            np.testing.assert_allclose(ref, ds, rtol=5e-2, atol=0.3)


def test_sharded_update_delegates_and_matches(data):
    """add/remove on a sharded index = update the base + re-shard; results
    must equal the updated single-chip index."""
    keys, x, queries = data
    mesh = make_mesh()
    base = build_flat_index(
        keys[:2500], x[:2500],
        pq_config=PQConfig(num_clusters=32, num_quantizers=4, max_iters=10),
    )
    sharded = shard_index(base, mesh)
    grown = sharded.add(keys[2500:], x[2500:])
    assert grown.size == 3000
    single = base.add(keys[2500:], x[2500:])
    d_s, i_s = grown.query_arrays(8, queries)
    d_1, i_1 = single.query_arrays(8, queries)
    d_s, i_s, d_1, i_1 = map(np.asarray, (d_s, i_s, d_1, i_1))
    np.testing.assert_allclose(d_s, d_1, rtol=1e-4, atol=1e-4)
    # id agreement as SETS strictly below the k-th distance (near-ties at
    # the boundary are path-arbitrary; same protocol as the flat test)
    for q in range(len(queries)):
        cut = d_1[q, -1] - (1e-4 + 1e-4 * abs(d_1[q, -1]))
        set_1 = set(i_1[q][d_1[q] < cut].tolist())
        set_s = set(i_s[q][d_s[q] < cut].tolist())
        assert set_1 == set_s

    shrunk = grown.remove(keys[:100])
    assert shrunk.size == 2900
    single2 = single.remove(keys[:100])
    d_s2, i_s2 = shrunk.query_arrays(8, queries)
    d_12, i_12 = single2.query_arrays(8, queries)
    np.testing.assert_allclose(
        np.asarray(d_s2), np.asarray(d_12), rtol=1e-4, atol=1e-4
    )


def test_sharded_adc_scan_winners_rerank_matches_exact():
    """The sharded fused-kernel flat scan honors FlatIndex's serving
    knobs: block winners + per-shard exact rescore (previously silently
    dropped). With rerank, distances must be the exact f32 ADC top-k."""
    rng = np.random.default_rng(41)
    n, d, k = 16384, 16, 2
    x, _, _ = planted_clusters(rng, n, d, 16, scale=0.3, spread=2.0)
    queries = x[rng.choice(n, 8, replace=False)].astype(np.float32)
    mesh = make_mesh()
    pq = train_product_quantizer(
        x, PQConfig(num_clusters=16, num_quantizers=4, max_iters=6)
    )
    codes = np.asarray(pq.encode(x))
    norms = np.asarray(pq.reconstruction_norms(jnp.asarray(codes)))
    d_sh, i_sh = sharded_adc_scan(
        jnp.asarray(queries),
        pq.codebooks,
        shard_rows(codes, mesh, 0),
        shard_rows(norms, mesh, np.inf),
        mesh=mesh,
        bounds=pq.bounds,
        k=k,
        winners=2,
        rerank_k=8,  # local_n=2048 == 256*8: inside the kernel envelope
        force_pallas=True,  # interpret-mode kernel on the CPU mesh
    )
    d_ex, i_ex = adc_scan_decode(
        jnp.asarray(queries), pq.codebooks, jnp.asarray(codes),
        jnp.asarray(norms), bounds=pq.bounds, k=k,
        precision="highest", topk_impl="exact",
    )
    _assert_same_topk(d_sh, i_sh, d_ex, i_ex, rtol=1e-4, atol=1e-4)
