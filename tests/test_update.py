"""Incremental updates (``Index.add`` / ``Index.remove``) — an extra over
the reference (which only builds indices whole, ``BuildIndex.scala:110-121``).

The load-bearing property for ``add`` is *equivalence*: adding rows to an
index must produce exactly the index a from-scratch construction with the
SAME frozen quantizer over the union would produce (same key sort, same
codes, same distances). ``remove`` mirrors it over the complement.
"""

import dataclasses

import numpy as np
import pytest

from generators import planted_clusters, random_keys
from gulon_tpu.models.build import build_flat_index, build_ivf_index
from gulon_tpu.models.exact import build_exact_index
from gulon_tpu.models.flat import FlatIndex
from gulon_tpu.models.ivf import LimitGroups
from gulon_tpu.models.keyindex import SortedKeyIndex
from gulon_tpu.models.metric import Metric
from gulon_tpu.ops.pq import PQConfig
from gulon_tpu.utils.serde import load_index, save_index

_PQ = PQConfig(num_clusters=16, num_quantizers=4, max_iters=15, block_rows=128)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(91)
    n, d = 600, 16
    x, _, labels = planted_clusters(rng, n, d, 8, scale=0.3)
    keys = random_keys(rng, n)
    return keys, x, labels


def _flat_reference(base: FlatIndex, keys, x):
    """From-scratch FlatIndex over (keys, x) with base's frozen pq."""
    import jax.numpy as jnp

    order = np.argsort(keys, kind="stable")
    codes = base.pq.encode(jnp.asarray(x[order]))
    return FlatIndex(
        _key_index=SortedKeyIndex(keys[order]),
        pq=base.pq,
        codes=codes,
        recon_norms=base.pq.reconstruction_norms(codes),
        metric=base.metric,
    )


def test_flat_add_matches_fresh_construction(corpus):
    keys, x, _ = corpus
    base = build_flat_index(keys[:400], x[:400], pq_config=_PQ)
    updated = base.add(keys[400:], x[400:])
    assert updated.size == 600
    assert base.size == 400  # functional: the old index is untouched
    expected = _flat_reference(base, keys, x)
    assert list(updated.key_index.keys) == list(expected.key_index.keys)
    np.testing.assert_array_equal(
        np.asarray(updated.codes), np.asarray(expected.codes)
    )
    q = x[::97]
    dq, iq = updated.query_arrays(10, q)
    de, ie = expected.query_arrays(10, q)
    np.testing.assert_array_equal(np.asarray(iq), np.asarray(ie))
    np.testing.assert_allclose(np.asarray(dq), np.asarray(de), rtol=1e-6)


def test_flat_remove_matches_fresh_construction(corpus):
    keys, x, _ = corpus
    base = build_flat_index(keys, x, pq_config=_PQ)
    victims = keys[100:200]
    updated = base.remove(victims)
    assert updated.size == 500
    keep = ~np.isin(keys, victims)
    expected = _flat_reference(base, keys[keep], x[keep])
    assert list(updated.key_index.keys) == list(expected.key_index.keys)
    np.testing.assert_array_equal(
        np.asarray(updated.codes), np.asarray(expected.codes)
    )
    for w in victims[:5]:
        assert updated.lookup(w) is None
    dq, iq = updated.query_arrays(5, x[::131])
    de, ie = expected.query_arrays(5, x[::131])
    np.testing.assert_array_equal(np.asarray(iq), np.asarray(ie))


def test_flat_add_cosine_normalizes_and_finds_self(corpus):
    keys, x, _ = corpus
    base = build_flat_index(
        keys[:500], x[:500], metric=Metric.COSINE, pq_config=_PQ
    )
    # scale invariance: cosine ingest normalizes, so a scaled add must
    # produce byte-identical codes (the discriminative property; top-1
    # self-retrieval is tie-arbitrary under coarse PQ on normalized rows)
    updated = base.add(keys[500:], 3.5 * x[500:])
    plain = base.add(keys[500:], x[500:])
    np.testing.assert_array_equal(
        np.asarray(updated.codes), np.asarray(plain.codes)
    )
    res = updated.query(10, x[510])
    d_self = float(
        np.sum((x[510] / np.linalg.norm(x[510])
                - np.asarray(updated.lookup(keys[510]))) ** 2)
    )
    # the self row's reconstruction is within the returned top-10 band
    assert d_self <= float(res.distances[-1]) + 1e-5


def test_flat_add_opq_rotates_ingest(corpus):
    keys, x, _ = corpus
    import jax
    import jax.numpy as jnp

    base = build_flat_index(keys[:500], x[:500], pq_config=_PQ, opq_iters=2)
    assert base.rotation is not None
    updated = base.add(keys[500:], x[500:])
    # equivalence: added rows must be encoded in the ROTATED basis — codes
    # byte-identical to a fresh construction with the same pq + rotation
    order = np.argsort(keys, kind="stable")
    xr = jnp.matmul(
        jnp.asarray(x[order]), base.rotation,
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_array_equal(
        np.asarray(updated.codes), np.asarray(base.pq.encode(xr))
    )
    assert keys[505] in list(updated.query(10, x[505]).keys)
    rec = updated.lookup(keys[505])  # reported in the ORIGINAL basis
    assert np.linalg.norm(rec - x[505]) < np.linalg.norm(x[505])


def test_flat_update_packed_index_stays_packed(corpus):
    keys, x, _ = corpus
    base = build_flat_index(keys[:500], x[:500], pq_config=_PQ)
    base.pack_memory()
    updated = base.add(keys[500:], x[500:]).remove(keys[:50])
    assert updated.packed_width == base.packed_width
    assert updated.size == 550
    res = updated.query(5, x[502])
    assert res.keys[0] == keys[502]


def test_flat_update_drops_stale_caches(corpus):
    keys, x, _ = corpus
    base = build_flat_index(keys[:500], x[:500], pq_config=_PQ)
    base.enable_cache()
    base.scan_strategy = "cached"
    # pin rerank off: this test checks cache staleness, and the auto
    # degeneracy rerank would exact-rescore the cached path's candidates
    # (different tie order than the unrescored decode scan)
    base.rerank_factor = 1
    updated = base.remove(keys[:100])
    assert updated.decoded_cache is None
    # the cached strategy must rebuild over the NEW row set lazily
    d_cached, i_cached = updated.query_arrays(5, x[300:310])
    upd2 = dataclasses.replace(updated, scan_strategy="decode")
    d_dec, i_dec = upd2.query_arrays(5, x[300:310])
    np.testing.assert_array_equal(np.asarray(i_cached), np.asarray(i_dec))


def test_exact_add_remove_equivalence(corpus):
    keys, x, _ = corpus
    base = build_exact_index(keys[:400], x[:400])
    updated = base.add(keys[400:], x[400:]).remove(keys[:100])
    keep = np.ones(600, bool)
    keep[:100] = False
    expected = build_exact_index(keys[keep], x[keep])
    assert list(updated.key_index.keys) == list(expected.key_index.keys)
    dq, iq = updated.query_arrays(10, x[::89])
    de, ie = expected.query_arrays(10, x[::89])
    np.testing.assert_array_equal(np.asarray(iq), np.asarray(ie))
    np.testing.assert_allclose(np.asarray(dq), np.asarray(de), rtol=1e-6)


def _ivf_invariants(ix):
    gids = np.asarray(ix.group_ids)
    sizes = ix.partition_sizes()
    assert sizes.sum() == ix.size
    bounds = np.concatenate([[0], ix.key_index.group_offsets, [ix.size]])
    for g in range(ix.num_partitions):
        lo, hi = bounds[g], bounds[g + 1]
        assert (gids[lo:hi] == g).all()
        seg = list(ix.key_index.keys[lo:hi])
        assert seg == sorted(seg)  # keys sorted within each group


def test_ivf_add_self_query_and_invariants(corpus):
    keys, x, _ = corpus
    base = build_ivf_index(
        keys[:450], x[:450], pq_config=_PQ,
        num_partitions=12, strategy=LimitGroups(12),
    )
    updated = base.add(keys[450:], x[450:])
    assert updated.size == 600
    assert base.size == 450
    _ivf_invariants(updated)
    for i in (455, 500, 599):
        res = updated.query(3, x[i])
        assert res.keys[0] == keys[i]
    # lookup reconstructs (centroid + residual decode) for an added row
    rec = updated.lookup(keys[470])
    assert rec is not None and rec.shape == (x.shape[1],)
    assert np.linalg.norm(rec - x[470]) < np.linalg.norm(x[470])


def test_ivf_add_strategy_parity(corpus):
    """Post-update, the masked and bucketed scans must agree — catches a
    stale partition-padded layout or bad offsets."""
    keys, x, _ = corpus
    base = build_ivf_index(
        keys[:450], x[:450], pq_config=_PQ,
        num_partitions=12, strategy=LimitGroups(12),
    )
    updated = base.add(keys[450:], x[450:])
    updated.precision = "highest"
    updated.topk_impl = "exact"
    q = x[::113]
    d_m, i_m = updated.query_arrays(5, q)
    upd2 = dataclasses.replace(
        updated, scan_strategy="bucketed",
        precision="highest", topk_impl="exact",
    )
    d_b, i_b = upd2.query_arrays(5, q)
    np.testing.assert_array_equal(np.asarray(i_m), np.asarray(i_b))
    np.testing.assert_allclose(np.asarray(d_m), np.asarray(d_b), rtol=1e-5)


def test_ivf_remove_can_empty_a_partition(corpus):
    keys, x, _ = corpus
    base = build_ivf_index(
        keys, x, pq_config=_PQ,
        num_partitions=10, strategy=LimitGroups(10),
    )
    # empty out one whole partition
    gids = np.asarray(base.group_ids)
    victim = int(np.argmin(base.partition_sizes()))
    victims = base.key_index.keys[gids == victim]
    updated = base.remove(victims)
    assert updated.num_partitions == base.num_partitions  # centroids kept
    assert updated.partition_sizes()[victim] == 0
    _ivf_invariants(updated)
    for w in victims[:3]:
        assert updated.lookup(w) is None
    surviving = np.flatnonzero(gids != victim)[::71]
    for i in surviving[:4]:
        # tie-robust self check: the self row's reconstruction distance
        # is within the returned top-k band (top-1 identity is arbitrary
        # when coarse PQ collapses same-cluster rows onto equal codes)
        res = updated.query(10, x[i])
        d_self = float(np.sum((np.asarray(updated.lookup(keys[i])) - x[i]) ** 2))
        assert d_self <= float(res.distances[-1]) + 1e-5


def test_ivf_add_cosine_and_rotation(corpus):
    keys, x, _ = corpus
    base = build_ivf_index(
        keys[:500], x[:500], metric=Metric.COSINE, pq_config=_PQ,
        num_partitions=10, strategy=LimitGroups(10), opq_iters=2,
    )
    # cosine ingest must normalize added rows (scale-invariant)
    updated = base.add(keys[500:], 2.0 * x[500:])
    res = updated.query(3, x[520])
    assert res.keys[0] == keys[520]


def test_update_serde_roundtrip(tmp_path, corpus):
    keys, x, _ = corpus
    flat = build_flat_index(keys[:500], x[:500], pq_config=_PQ).add(
        keys[500:], x[500:]
    )
    p = tmp_path / "flat.pb"
    save_index(flat, p)
    loaded = load_index(p)
    d0, i0 = flat.query_arrays(5, x[::151])
    d1, i1 = loaded.query_arrays(5, x[::151])
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    ivf = build_ivf_index(
        keys[:500], x[:500], pq_config=_PQ,
        num_partitions=10, strategy=LimitGroups(10),
    ).add(keys[500:], x[500:])
    p2 = tmp_path / "ivf.pb"
    save_index(ivf, p2)
    loaded2 = load_index(p2)
    d2, i2 = ivf.query_arrays(5, x[::151])
    d3, i3 = loaded2.query_arrays(5, x[::151])
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i3))


def test_update_errors(corpus):
    keys, x, _ = corpus
    base = build_flat_index(keys[:300], x[:300], pq_config=_PQ)
    with pytest.raises(ValueError):
        base.add(keys[300:305], x[300:305, :8])  # wrong dim
    with pytest.raises(ValueError):
        base.add([], np.zeros((0, x.shape[1]), np.float32))
    with pytest.raises(KeyError):
        base.remove(["definitely-not-a-key"])
    with pytest.raises(ValueError):
        base.remove(keys[:300])  # would empty the index
    # mismatched lengths
    with pytest.raises(ValueError):
        base.add(keys[300:302], x[300:305])


def test_remove_scalar_key(corpus):
    """A single string key (like add()'s scalar path) must work, not
    raise 'iteration over a 0-d array'."""
    keys, x, _ = corpus
    base = build_flat_index(keys[:100], x[:100], pq_config=_PQ)
    victim = str(keys[7])
    updated = base.remove(victim)
    assert updated.size == 99
    assert updated.lookup(victim) is None
