"""OPQ (learned rotation before PQ) — a quality capability beyond the
reference's fixed coordinate-range subspace split (``Vectors.scala:91-103``).

The corpus that separates the two: correlated dimensions. We draw data with
axis-aligned, *unbalanced* per-dimension variance and mix it with a random
rotation — the fixed split then straddles correlated coordinates, while OPQ
can learn to undo the mixing.
"""

import numpy as np
import pytest

from generators import random_keys
from gulon_tpu.models.build import build_flat_index
from gulon_tpu.ops.opq import (
    procrustes_rotation,
    reconstruction_mse,
    train_opq,
)
from gulon_tpu.ops.pq import PQConfig, train_product_quantizer


def _random_rotation(rng, d):
    q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    return q.astype(np.float32)


def _correlated_corpus(rng, n=3000, d=16):
    # unbalanced axis variances (geometric decay), then a dense mixing
    # rotation so no coordinate split is aligned with the structure
    scales = (0.9 ** np.arange(d)).astype(np.float32) * 2.0
    z = rng.normal(size=(n, d)).astype(np.float32) * scales
    return z @ _random_rotation(rng, d)


CFG = PQConfig(num_clusters=16, num_quantizers=4, max_iters=15)


def test_procrustes_identity_fixpoint():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 8)).astype(np.float32)
    r = np.asarray(procrustes_rotation(x, x))
    np.testing.assert_allclose(r, np.eye(8), atol=1e-4)


def test_procrustes_recovers_planted_rotation():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(500, 8)).astype(np.float32)
    r_true = _random_rotation(rng, 8)
    r = np.asarray(procrustes_rotation(x, x @ r_true))
    np.testing.assert_allclose(r, r_true, atol=1e-3)


def test_rotation_is_orthogonal():
    rng = np.random.default_rng(2)
    x = _correlated_corpus(rng)
    rot, _ = train_opq(x, CFG, opq_iters=3, inner_iters=5)
    rot = np.asarray(rot)
    np.testing.assert_allclose(rot @ rot.T, np.eye(16), atol=1e-4)


def test_opq_beats_plain_pq_on_correlated_corpus():
    rng = np.random.default_rng(3)
    x = _correlated_corpus(rng)
    pq_plain = train_product_quantizer(x, CFG)
    mse_plain = reconstruction_mse(pq_plain, x)
    rot, pq_opq = train_opq(x, CFG, opq_iters=6, inner_iters=8)
    mse_opq = reconstruction_mse(pq_opq, x, rot)
    # the margin is comfortably >10% on this corpus; assert a safe bound
    assert mse_opq < 0.9 * mse_plain, (mse_opq, mse_plain)


def test_opq_zero_iters_is_plain_pq():
    rng = np.random.default_rng(4)
    x = _correlated_corpus(rng, n=800)
    rot, pq = train_opq(x, CFG, opq_iters=0)
    np.testing.assert_allclose(np.asarray(rot), np.eye(16))
    pq_plain = train_product_quantizer(x, CFG)
    np.testing.assert_allclose(
        np.asarray(pq.codebooks), np.asarray(pq_plain.codebooks)
    )


@pytest.fixture(scope="module")
def opq_index():
    rng = np.random.default_rng(5)
    x = _correlated_corpus(rng)
    keys = random_keys(rng, len(x))
    index = build_flat_index(keys, x, pq_config=CFG, opq_iters=4)
    return index, x, keys


def test_opq_index_query_and_lookup(opq_index):
    index, x, keys = opq_index
    assert index.rotation is not None
    res = index.query(5, x[11])
    assert res.keys[0] == keys[11]
    # lookup reconstructs in the ORIGINAL basis: close to the true vector
    rec = index.lookup(keys[11])
    assert rec.shape == (16,)
    err = float(((rec - x[11]) ** 2).sum())
    base = float((x[11] ** 2).sum())
    assert err < base, (err, base)  # a real reconstruction, not noise


def test_opq_index_recall_not_worse_than_plain(opq_index):
    index, x, keys = opq_index
    plain = build_flat_index(keys, x, pq_config=CFG)
    from gulon_tpu.ops.scan import exact_scan

    q = x[:64]
    _, i_true = exact_scan(q, x[np.argsort(keys, kind="stable")], k=10)
    i_true = np.asarray(i_true)

    def recall(ix):
        _, ids = ix.query_arrays(10, q)
        ids = np.asarray(ids)
        return np.mean(
            [
                len(set(ids[r]) & set(i_true[r])) / 10.0
                for r in range(len(q))
            ]
        )

    r_opq, r_plain = recall(index), recall(plain)
    # at equal code bytes the learned rotation should help (and must not
    # meaningfully hurt) on a correlated corpus
    assert r_opq >= r_plain - 0.02, (r_opq, r_plain)


def test_opq_index_serde_roundtrip(tmp_path, opq_index):
    index, x, _ = opq_index
    from gulon_tpu.utils.serde import load_index, save_index

    p = tmp_path / "opq.pb"
    save_index(index, p)
    loaded = load_index(p)
    assert loaded.rotation is not None
    np.testing.assert_allclose(
        np.asarray(loaded.rotation), np.asarray(index.rotation), atol=1e-6
    )
    d0, i0 = map(np.asarray, index.query_arrays(5, x[:8]))
    d1, i1 = map(np.asarray, loaded.query_arrays(5, x[:8]))
    np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(i0, i1)


def test_plain_index_bytes_unchanged_by_schema_extension(tmp_path):
    """A plain-PQ index must serialize WITHOUT the rotation field — its
    wire bytes stay identical to the reference writer's schema."""
    rng = np.random.default_rng(6)
    x = _correlated_corpus(rng, n=400)
    keys = random_keys(rng, len(x))
    index = build_flat_index(keys, x, pq_config=CFG)
    from gulon_tpu.utils.serde import index_to_proto

    msg = index_to_proto(index)
    assert not msg.sorted.HasField("rotation")


@pytest.fixture(scope="module")
def opq_ivf_index():
    rng = np.random.default_rng(7)
    x = _correlated_corpus(rng, n=4000)
    keys = random_keys(rng, len(x))
    from gulon_tpu.models.build import build_ivf_index
    from gulon_tpu.models.ivf import LimitGroups

    index = build_ivf_index(
        keys, x, pq_config=CFG, num_partitions=16,
        strategy=LimitGroups(6), opq_iters=3,
    )
    return index, x, keys


def test_opq_ivf_query_and_lookup(opq_ivf_index):
    index, x, keys = opq_ivf_index
    assert index.rotation is not None
    res = index.query(5, x[23])
    assert res.keys[0] == keys[23]
    rec = index.lookup(keys[23])
    err = float(((rec - x[23]) ** 2).sum())
    assert err < float((x[23] ** 2).sum()), err


def test_opq_ivf_beats_plain_mse(opq_ivf_index):
    """The rotated residual codebooks must reconstruct (rotated) residuals
    better than plain residual PQ reconstructs plain residuals."""
    index, x, keys = opq_ivf_index
    from gulon_tpu.models.build import build_ivf_index
    from gulon_tpu.models.ivf import LimitGroups

    plain = build_ivf_index(
        keys, x, pq_config=CFG, num_partitions=16, strategy=LimitGroups(6)
    )

    by_key = {k: i for i, k in enumerate(keys)}

    def recon_mse(ix):
        # lookup reconstructs in the ORIGINAL basis for both variants
        errs = [
            float(((ix.lookup(w) - x[by_key[w]]) ** 2).sum())
            for w in np.asarray(ix.key_index.keys)[:400]
        ]
        return float(np.mean(errs))

    m_opq, m_plain = recon_mse(index), recon_mse(plain)
    assert m_opq < m_plain * 1.02, (m_opq, m_plain)


def test_opq_ivf_serde_roundtrip(tmp_path, opq_ivf_index):
    index, x, _ = opq_ivf_index
    from gulon_tpu.utils.serde import load_index, save_index

    p = tmp_path / "opq_ivf.pb"
    save_index(index, p)
    loaded = load_index(p)
    assert loaded.rotation is not None
    d0, i0 = map(np.asarray, index.query_arrays(5, x[:8]))
    d1, i1 = map(np.asarray, loaded.query_arrays(5, x[:8]))
    np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(i0, i1)


def test_opq_ivf_aot_roundtrip(tmp_path, opq_ivf_index):
    index, x, _ = opq_ivf_index
    from gulon_tpu.utils.aot import export_serving, load_serving, save_serving

    bundle = export_serving(index, shapes=((8, 5),), warm_cache=False)
    p = tmp_path / "opq_ivf.pb.aot"
    save_serving(p, bundle)
    serving = load_serving(p, index)
    d0, i0 = map(np.asarray, index.query_arrays(5, x[:8]))
    d1, i1 = map(np.asarray, serving.query_arrays(5, x[:8]))
    np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(i0, i1)


def test_opq_ivf_sharded_parity(opq_ivf_index):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    index, x, _ = opq_ivf_index
    from gulon_tpu.parallel.index import shard_index
    from gulon_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(min(4, len(jax.devices())))
    sharded = shard_index(index, mesh)
    d0, i0 = map(np.asarray, index.query_arrays(5, x[:8]))
    d1, i1 = map(np.asarray, sharded.query_arrays(5, x[:8]))
    np.testing.assert_allclose(d0, d1, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(i0, i1)


def test_opq_index_aot_roundtrip(tmp_path, opq_index):
    """AOT-exported serving must bake the rotation into the artifact."""
    index, x, _ = opq_index
    from gulon_tpu.utils.aot import export_serving, load_serving, save_serving

    bundle = export_serving(index, shapes=((8, 5),), warm_cache=False)
    p = tmp_path / "opq.pb.aot"
    save_serving(p, bundle)
    serving = load_serving(p, index)
    d0, i0 = map(np.asarray, index.query_arrays(5, x[:8]))
    d1, i1 = map(np.asarray, serving.query_arrays(5, x[:8]))
    np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(i0, i1)
