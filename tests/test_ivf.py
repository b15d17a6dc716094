import dataclasses

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
    base = build_ivf_index(
        keys, x,
        metric=Metric.COSINE,
        pq_config=PQConfig(
            num_clusters=32, num_quantizers=5, max_iters=8
        ),
        num_partitions=14,
        strategy=LimitGroups(5),
    )
    # strategy is a query-time knob: swap it on the SAME build instead of
    # paying a second coarse-kmeans + PQ train
    for strategy in (LimitGroups(5), LimitVectors(900)):
        index = dataclasses.replace(base, strategy=strategy)
        q = (x[:10] + rng.normal(0, 0.02, (10, 20))).astype(np.float32)
        a = index.batch_query(7, q)
        index.scan_strategy = "gathered"
        index.topk_impl = "exact"
        b = index.batch_query(7, q)
        # code-resident by default: no reconstruction cache materialized
        assert index.recon_cache is None
        index.enable_cache()
        c = index.batch_query(7, q)
        for ra, rb, rc in zip(a, b, c):
            for other in (rb, rc):
                np.testing.assert_allclose(
                    ra.distances, other.distances, rtol=2e-2, atol=1e-2
                )
                assert set(ra.keys) == set(other.keys)


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
    base = build_ivf_index(
        keys, x,
        pq_config=PQConfig(
            num_clusters=32, num_quantizers=6, max_iters=8
        ),
        num_partitions=20,
        strategy=LimitGroups(4),
    )
    for strategy in (LimitGroups(4), LimitVectors(900)):
        index = dataclasses.replace(base, strategy=strategy)
        q = (x[:32] + rng.normal(0, 0.02, (32, 24))).astype(np.float32)
        a = index.batch_query(8, q)
        index.scan_strategy = "bucketed"
        index.topk_impl = "exact"
        b = index.batch_query(8, q)
        assert index.recon_cache is None  # code-resident by default
        index.enable_cache()
        c = index.batch_query(8, q)
        for ra, rb, rc in zip(a, b, c):
            for other in (rb, rc):
                np.testing.assert_allclose(
                    ra.distances, other.distances, rtol=2e-2, atol=1e-2
                )
                assert set(ra.keys) == set(other.keys)


def test_bucketed_skewed_batch_exact():
    """Every query probing the SAME partition (worst-case skew) returns
    exact parity with the masked scan — the entry schedule replicates hot
    partitions across query sub-buckets instead of dropping overflow pairs
    (reference probes are never lossy, Index.scala:273-281)."""
    from generators import random_keys
    from gulon_tpu.models.build import build_ivf_index
    from gulon_tpu.models.ivf import LimitGroups
    from gulon_tpu.ops.pq import PQConfig

    rng = np.random.default_rng(5)
    # one dominant cluster so every query ranks the same partition first
    hot = rng.normal(0, 0.05, (3000, 16)).astype(np.float32)
    cold = (rng.normal(0, 0.05, (1000, 16)) + 8.0).astype(np.float32)
    x = np.concatenate([hot, cold]).astype(np.float32)
    keys = random_keys(rng, 4000)
    index = build_ivf_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=8),
        num_partitions=8,
        strategy=LimitGroups(1),  # exactly one probed partition per query
    )
    q = (hot[:96] + rng.normal(0, 0.01, (96, 16))).astype(np.float32)
    index.topk_impl = "exact"
    a = index.batch_query(5, q)
    index.scan_strategy = "bucketed"
    b = index.batch_query(5, q)
    for ra, rb in zip(a, b):
        np.testing.assert_allclose(ra.distances, rb.distances, rtol=1e-5)
        assert set(ra.keys) == set(rb.keys)


def test_entry_schedule_covers_all_pairs():
    """Planner property: for every valid (query, partition) pair, the
    entries referenced by its pair_slots cover EXACTLY the partition's rows
    (split across rcap row chunks), with the query occupying its slot in
    every one of them — lossless scheduling regardless of skew or
    partition-size outliers."""
    from gulon_tpu.models.ivf import _plan_entry_schedule

    rng = np.random.default_rng(7)
    sizes = np.array([1300, 7, 430, 256, 3], np.int64)  # outlier + tiny
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    num_q, L, rcap, qcap, kk = 50, 3, 512, 8, 4
    probe = rng.integers(-1, len(sizes), (num_q, L)).astype(np.int32)
    probe[:30, 0] = 0  # hot partition: 30 queries -> multiple sub-buckets
    e_start, e_size, e_part, e_bucket, pair_slots = _plan_entry_schedule(
        probe, sizes, starts, rcap, qcap, kk
    )
    n_e = e_start.shape[0]
    w = pair_slots.shape[1] // L
    for qi in range(num_q):
        for li in range(L):
            p = probe[qi, li]
            slots = pair_slots[qi, li * w : (li + 1) * w]
            real = slots[slots < n_e * qcap]
            if p < 0:
                assert len(real) == 0
                continue
            rows_covered = []
            for s in real:
                e, slot = divmod(int(s), qcap)
                assert e_part[e] == p
                assert e_bucket[e, slot] == qi  # query owns its slot
                rows_covered.append((int(e_start[e]), int(e_size[e])))
            rows_covered.sort()
            # row chunks tile [starts[p], starts[p]+sizes[p]) exactly
            pos = starts[p]
            for st, sz in rows_covered:
                assert st == pos and sz > 0
                pos += sz
            assert pos == starts[p] + sizes[p]


def test_max_partition_size_bounds_pmax():
    """Oversized partitions split into capacity-bounded children with their
    own centroids; query quality holds and the bound is strict."""
    rng = np.random.default_rng(77)
    # deliberately skewed: half of all rows land in one tight blob
    blob = rng.normal(0, 0.05, (400, 8)).astype(np.float32)
    rest, _, _ = planted_clusters(rng, 400, 8, 10, scale=0.2, spread=3.0)
    x = np.concatenate([blob + 5.0, rest], 0)
    keys = random_keys(rng, len(x))
    cap = 64
    index = build_ivf_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=10,
                           block_rows=128),
        num_partitions=8,
        strategy=LimitGroups(4),
        coarse_max_iters=10,
        max_partition_size=cap,
    )
    assert index.partition_sizes().max() <= cap
    # the blob needed >= ceil(400/64)=7 children, so partitions grew
    assert index.num_partitions > 8 - 2
    # blob self-queries come back with a blob-resident neighbour at
    # near-zero true distance (within the blob everything is within ~0.2;
    # the nearest non-blob cluster is >= several units away) — i.e. the
    # split children still get probed and scanned correctly
    index.strategy = LimitGroups(10)
    res = index.batch_query(1, x[:16])
    key_row = {k_: i for i, k_ in enumerate(keys)}
    for i, r in enumerate(res):
        true_d = float(((x[key_row[r.keys[0]]] - x[i]) ** 2).sum())
        assert true_d < 1.0, (i, true_d)


def test_max_partition_size_roundtrip_and_sublinear(tmp_path):
    """A split index serializes/loads and its gathered scan agrees with the
    masked scan."""
    from gulon_tpu.utils.serde import load_index, save_index

    rng = np.random.default_rng(3)
    x, _, _ = planted_clusters(rng, 600, 8, 6, scale=0.3, spread=2.0)
    keys = random_keys(rng, len(x))
    index = build_ivf_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=10,
                           block_rows=128),
        num_partitions=6,
        strategy=LimitGroups(3),
        coarse_max_iters=10,
        max_partition_size=80,
    )
    assert index.partition_sizes().max() <= 80
    p = str(tmp_path / "split.pb")
    save_index(index, p)
    loaded = load_index(p)
    q = x[:8]
    d0, i0 = index.query_arrays(5, q)
    dl, il = loaded.query_arrays(5, q)
    assert np.allclose(np.asarray(d0), np.asarray(dl), atol=1e-4)
    index.scan_strategy = "gathered"
    dg, ig = index.query_arrays(5, q)
    assert np.array_equal(np.asarray(i0), np.asarray(ig))


def test_balanced_split_capacity_and_quality():
    from gulon_tpu.models.build import _balanced_split

    rng = np.random.default_rng(0)
    xp = rng.normal(0, 1, (333, 6)).astype(np.float32)
    assign = _balanced_split(xp, 5, 70, rng)
    counts = np.bincount(assign, minlength=5)
    assert counts.sum() == 333
    assert counts.max() <= 70


def test_pallas_strategy_matches_masked_probe_semantics():
    """The fused-kernel IVF scan probes exactly the masked scan's
    partitions; top-1 agrees and top-k overlaps at block granularity."""
    rng = np.random.default_rng(13)
    x, _, _ = planted_clusters(rng, 8192, 16, 32, scale=0.3, spread=2.0)
    keys = random_keys(rng, 8192)
    index = build_ivf_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=8),
        num_partitions=8,
        strategy=LimitGroups(4),
        coarse_max_iters=8,
    )
    q = x[:32]
    d_m, i_m = index.query_arrays(5, q)
    index.scan_strategy = "pallas"
    d_p, i_p = index.query_arrays(5, q)
    i_m, i_p = np.asarray(i_m), np.asarray(i_p)
    assert i_p.shape == i_m.shape
    # returned rows must lie inside the strategy's probed partitions
    gids = np.asarray(index.group_ids)
    cents = np.asarray(index.centroids)
    for qi in range(len(q)):
        cd = ((q[qi][None] - cents) ** 2).sum(-1)
        probed = set(np.argsort(cd, kind="stable")[:4])
        got = set(gids[i_p[qi][i_p[qi] >= 0]])
        assert got <= probed, (qi, got - probed)
    # PQ collapses same-cluster rows into exact distance ties, so compare
    # distances (the algebra), not tie-broken ids: the global probed min is
    # always its block's winner -> top-1 distance parity; deeper ranks may
    # differ by block granularity but must stay close
    d_m, d_p = np.asarray(d_m), np.asarray(d_p)
    np.testing.assert_allclose(d_p[:, 0], d_m[:, 0], rtol=0.08, atol=0.05)
    assert float(np.mean(d_p[:, :5] <= d_m[:, :5] * 1.05 + 0.05)) >= 0.8


def test_pallas_strategy_falls_back_small_corpus(ivf):
    """Below the kernel envelope the pallas strategy serves via the masked
    scan (identical results)."""
    index, keys, x = ivf
    import dataclasses as _dc

    d_m, i_m = index.query_arrays(4, x[:8])
    idx_p = _dc.replace(index, scan_strategy="pallas")
    d_p, i_p = idx_p.query_arrays(4, x[:8])
    assert np.array_equal(np.asarray(i_m), np.asarray(i_p))
    assert np.allclose(np.asarray(d_m), np.asarray(d_p))


def test_pallas_rescore_exact_distances():
    """pallas_rescore re-ranks block winners with exact f32 ADC
    distances: agreeing ids report the masked scan's exact distances, and
    recall does not drop vs the raw fused epilogue."""
    rng = np.random.default_rng(17)
    x, _, _ = planted_clusters(rng, 8192, 16, 32, scale=0.3, spread=2.0)
    keys = random_keys(rng, 8192)
    index = build_ivf_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=8),
        num_partitions=8,
        strategy=LimitGroups(4),
        coarse_max_iters=8,
    )
    q = x[:32]
    # masked scan at highest precision = the exact reference distances
    index.precision = "highest"
    d_m, i_m = index.query_arrays(5, q)
    index.precision = "default"
    index.scan_strategy = "pallas"
    index.pallas_winners = 1
    d_raw, i_raw = index.query_arrays(5, q)
    index.pallas_rescore = 4
    d_rs, i_rs = index.query_arrays(5, q)
    d_m, i_m, d_rs, i_rs = map(np.asarray, (d_m, i_m, d_rs, i_rs))
    d_raw = np.asarray(d_raw)
    # PQ collapses same-cluster rows into exact distance ties, so ids are
    # tie-arbitrary; the rescored DISTANCES must equal the masked scan's
    # exact f32 distances (raw bf16 block values differ by ~1e-2). The
    # probed global min is always its block's winner -> top-1 parity;
    # deeper slots can miss at one-winner-per-block granularity.
    np.testing.assert_allclose(d_rs[:, 0], d_m[:, 0], rtol=1e-4, atol=1e-4)
    close = np.isclose(d_rs, d_m, rtol=1e-4, atol=1e-4)
    assert close.mean() >= 0.9, close.mean()
    # and each returned id's independently reconstructed distance equals
    # the reported one: decode residual + add back the coarse centroid
    dec = np.asarray(index.pq.decode(index.codes))
    full = dec + np.asarray(index.centroids)[np.asarray(index.group_ids)]
    for j in range(len(q)):
        ids = i_rs[j][i_rs[j] >= 0]
        truth = ((full[ids] - q[j][None]) ** 2).sum(-1)
        np.testing.assert_allclose(
            d_rs[j][: len(ids)], truth, rtol=1e-4, atol=1e-4
        )
    # distance-protocol recall can only improve vs the raw fused epilogue
    cutoff = d_m[:, -1] * (1 + 1e-6)
    assert (d_rs <= cutoff[:, None]).mean() >= (
        d_raw <= cutoff[:, None]
    ).mean() - 1e-9


def test_auto_strategy_policy():
    """The default "auto" strategy goes sublinear for small batches whose
    probes touch far less than the corpus, and reverts to a covering scan
    for large batches (VERDICT r3 item 7: default single-query latency
    must be sublinear in N, no knob). Also: auto results match masked."""
    from generators import planted_clusters, random_keys
    from gulon_tpu.models.build import build_ivf_index
    from gulon_tpu.models.ivf import LimitGroups, LimitVectors
    from gulon_tpu.ops.pq import PQConfig

    rng = np.random.default_rng(11)
    x, _, _ = planted_clusters(rng, 8000, 24, 16, scale=0.3)
    keys = random_keys(rng, 8000)
    index = build_ivf_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=8),
        num_partitions=40,
        strategy=LimitGroups(3),
        coarse_max_iters=8,
    )
    assert index.scan_strategy == "auto"
    pmax = int(index.partition_sizes().max())
    # single query: 3 probes x pmax rows vs the 8000-row corpus
    expect_single = "gathered" if 2 * 3 * pmax < 8000 else "bucketed"
    assert index._resolve_auto(1, 5) == expect_single
    # large batches cover the corpus -> masked on CPU (pallas is TPU-only)
    assert index._resolve_auto(1024, 5) == "masked"
    # batches beyond the gathered limit never pick gathered
    assert index._resolve_auto(64, 5) in ("bucketed", "masked")
    # LimitVectors estimates probes from mean partition size (~2 probes
    # at count=400, mean 200): single query still goes sublinear
    index.strategy = LimitVectors(400)
    assert index._resolve_auto(1, 5) in ("gathered", "bucketed")

    # auto == masked results (exact sublinear scans, same distances)
    q = (x[:4] + rng.normal(0, 0.02, (4, 24))).astype(np.float32)
    index.strategy = LimitGroups(3)
    index.topk_impl = "exact"
    d_a, i_a = map(np.asarray, index.query_arrays(5, q))
    index.scan_strategy = "masked"
    d_m, i_m = map(np.asarray, index.query_arrays(5, q))
    np.testing.assert_allclose(d_a, d_m, rtol=2e-4, atol=2e-4)
    for j in range(len(q)):
        assert set(i_a[j]) == set(i_m[j])
