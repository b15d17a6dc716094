"""AOT-exported serving artifacts: export -> save -> load -> call, no jit.

Parity property: the deserialized computation returns exactly what the
index's jitted path returns (same distances, same ids) for both index
kinds, both metrics, across padded batch sizes.
"""

import numpy as np
import pytest

from generators import planted_clusters, random_keys
from gulon_tpu.models.build import build_flat_index, build_ivf_index
from gulon_tpu.models.ivf import LimitGroups, LimitVectors
from gulon_tpu.models.metric import Metric
from gulon_tpu.ops.pq import PQConfig
from gulon_tpu.utils.aot import (
    export_serving,
    load_serving,
    save_serving,
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(9)
    x, _, _ = planted_clusters(rng, 2500, 16, 8, scale=0.3)
    keys = random_keys(rng, 2500)
    q = (x[:40] + rng.normal(0, 0.01, (40, 16))).astype(np.float32)
    return keys, x, q


def test_flat_aot_roundtrip(tmp_path, data):
    keys, x, q = data
    index = build_flat_index(
        keys, x,
        metric=Metric.COSINE,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=8),
    )
    bundle = export_serving(index, shapes=[(64, 5), (8, 5)])
    path = str(tmp_path / "flat.aot")
    save_serving(path, bundle)
    serving = load_serving(path, index)

    d_ref, i_ref = index.query_arrays(5, q)
    d_aot, i_aot = serving.query_arrays(5, q)  # pads 40 -> 64
    np.testing.assert_allclose(
        np.asarray(d_aot), np.asarray(d_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(i_aot), np.asarray(i_ref))
    # small batch uses the tighter artifact; results identical
    d8, i8 = serving.query_arrays(5, q[:3])
    np.testing.assert_allclose(
        np.asarray(d8), np.asarray(d_ref[:3]), rtol=1e-5, atol=1e-6
    )
    # no artifact for this k -> falls back to the jitted path
    d_fb, _ = serving.query_arrays(7, q[:2])
    assert d_fb.shape == (2, 7)
    # Result-level API works
    res = serving.batch_query(5, q[:2])
    assert list(res[0].keys) == list(index.batch_query(5, q[:2])[0].keys)


@pytest.mark.parametrize(
    "strategy", [LimitGroups(3), LimitVectors(600)],
    ids=["groups", "vectors"],
)
def test_ivf_aot_roundtrip(tmp_path, data, strategy):
    keys, x, q = data
    index = build_ivf_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=8),
        num_partitions=10,
        strategy=strategy,
    )
    bundle = export_serving(index, shapes=[(64, 6)])
    path = str(tmp_path / "ivf.aot")
    save_serving(path, bundle)
    serving = load_serving(path, index)
    d_ref, i_ref = index.query_arrays(6, q)
    d_aot, i_aot = serving.query_arrays(6, q)
    np.testing.assert_allclose(
        np.asarray(d_aot), np.asarray(d_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(i_aot), np.asarray(i_ref))


def test_aot_index_api_passthrough(tmp_path, data):
    """AOTServing is a drop-in for the Index surface (lookup, metadata)."""
    keys, x, q = data
    index = build_flat_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=8),
    )
    path = str(tmp_path / "pass.aot")
    save_serving(path, export_serving(index, shapes=[(8, 5)]))
    serving = load_serving(path, index)

    assert serving.dimension == index.dimension
    assert serving.size == index.size
    assert serving.metric == index.metric
    assert serving.key_index is index.key_index
    word = keys[7]
    np.testing.assert_array_equal(serving.lookup(word), index.lookup(word))
    assert serving.lookup("definitely-not-a-key") is None
    assert serving.query_by_word(5, "definitely-not-a-key") is None
    res = serving.query_by_word(5, word)
    ref = index.query_by_word(5, word)
    assert list(res.keys) == list(ref.keys)


def test_aot_dimension_mismatch(tmp_path, data):
    keys, x, q = data
    index = build_flat_index(
        keys, x,
        pq_config=PQConfig(num_clusters=8, num_quantizers=2, max_iters=5),
    )
    path = str(tmp_path / "dim.aot")
    save_serving(path, export_serving(index, shapes=[(8, 3)]))
    other = build_flat_index(
        keys, np.pad(x, ((0, 0), (0, 4))),
        pq_config=PQConfig(num_clusters=8, num_quantizers=2, max_iters=5),
    )
    with pytest.raises(ValueError):
        load_serving(path, other)


def test_ivf_gathered_aot_roundtrip(tmp_path, data):
    """The sublinear (gathered, code-resident) scan exports and matches the
    jitted gathered path exactly."""
    import dataclasses

    keys, x, q = data
    index = build_ivf_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=8),
        num_partitions=10,
        strategy=LimitGroups(3),
        max_partition_size=400,
    )
    index.scan_strategy = "gathered"
    bundle = export_serving(index, shapes=[(64, 6)])
    path = str(tmp_path / "ivfg.aot")
    save_serving(path, bundle)
    serving = load_serving(path, index)
    d_ref, i_ref = index.query_arrays(6, q)
    d_aot, i_aot = serving.query_arrays(6, q)
    np.testing.assert_allclose(
        np.asarray(d_aot), np.asarray(d_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(i_aot), np.asarray(i_ref))


def test_ivf_gathered_aot_rejects_limitvectors_and_bucketed(data):
    keys, x, _ = data
    index = build_ivf_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=8),
        num_partitions=10,
        strategy=LimitVectors(600),
    )
    index.scan_strategy = "gathered"
    with pytest.raises(ValueError, match="LimitGroups"):
        export_serving(index, shapes=[(8, 5)])
    index.strategy = LimitGroups(3)
    index.scan_strategy = "bucketed"
    with pytest.raises(ValueError, match="bucketed"):
        export_serving(index, shapes=[(8, 5)])


def test_exact_aot_roundtrip(tmp_path, data):
    """ExactIndex exports and the artifact matches the jitted path."""
    from gulon_tpu.models.exact import build_exact_index

    keys, x, q = data
    index = build_exact_index(keys, x)
    index.topk_impl = "exact"
    bundle = export_serving(index, shapes=[(64, 5)])
    path = str(tmp_path / "exact.aot")
    save_serving(path, bundle)
    serving = load_serving(path, index)
    d_ref, i_ref = index.query_arrays(5, q)
    d_aot, i_aot = serving.query_arrays(5, q)
    np.testing.assert_allclose(
        np.asarray(d_aot), np.asarray(d_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(i_aot), np.asarray(i_ref))


def test_ivf_pallas_aot_roundtrip(tmp_path):
    """The fused-kernel IVF strategy exports; the artifact matches the
    jitted pallas path exactly."""
    from generators import planted_clusters as _pc

    rng = np.random.default_rng(21)
    x, _, _ = _pc(rng, 8192, 16, 16, scale=0.3, spread=2.0)
    keys = random_keys(rng, 8192)
    index = build_ivf_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=6),
        num_partitions=8,
        strategy=LimitGroups(4),
        coarse_max_iters=6,
    )
    index.scan_strategy = "pallas"
    q = x[:32]
    bundle = export_serving(index, shapes=[(32, 5)])
    path = str(tmp_path / "ivfp.aot")
    save_serving(path, bundle)
    serving = load_serving(path, index)
    d_ref, i_ref = index.query_arrays(5, q)
    d_aot, i_aot = serving.query_arrays(5, q)
    np.testing.assert_allclose(
        np.asarray(d_aot), np.asarray(d_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(i_aot), np.asarray(i_ref))


def test_aot_serves_smaller_k_by_truncation(tmp_path, data):
    """An exported k' >= k serves k: ascending results truncate exactly."""
    keys, x, q = data
    index = build_flat_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=8),
    )
    bundle = export_serving(index, shapes=[(64, 10)])
    path = str(tmp_path / "flat.aot")
    save_serving(path, bundle)
    serving = load_serving(path, index)

    d_ref, i_ref = index.query_arrays(3, q)
    d_aot, i_aot = serving.query_arrays(3, q)
    assert np.asarray(d_aot).shape == (len(q), 3)
    np.testing.assert_allclose(
        np.asarray(d_aot), np.asarray(d_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(i_aot), np.asarray(i_ref))
    # k above every exported k' falls back to the jitted path
    d_fb, _ = serving.query_arrays(20, q)
    assert np.asarray(d_fb).shape == (len(q), 20)


def test_ivf_auto_strategy_aot_resolves_per_batch(tmp_path, data):
    """With the default scan_strategy='auto', export resolves the SAME
    strategy the live path serves at each exported batch size: a
    single-query artifact of a LimitGroups index gets the sublinear
    gathered computation, and results match the live auto path."""
    from gulon_tpu.utils.aot import _callable_for

    keys, x, q = data
    index = build_ivf_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=8),
        num_partitions=10,
        strategy=LimitGroups(3),
        max_partition_size=400,
    )
    assert index.scan_strategy == "auto"
    # the export resolves like the live policy (sublinear at Q=1 here)
    assert index._resolve_auto(1, 5) == "gathered"
    bundle = export_serving(index, shapes=[(1, 5)])
    path = str(tmp_path / "ivf_auto.aot")
    save_serving(path, bundle)
    serving = load_serving(path, index)
    d_ref, i_ref = index.query_arrays(5, q[:1])
    d_aot, i_aot = serving.query_arrays(5, q[:1])
    np.testing.assert_allclose(
        np.asarray(d_aot), np.asarray(d_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(i_aot), np.asarray(i_ref))
    # LimitVectors auto falls back to the masked callable (exportable)
    import dataclasses

    lv = dataclasses.replace(index, strategy=LimitVectors(600))
    fn, ops = _callable_for(lv, 5, batch=1)  # must not raise
    assert fn is not None and len(ops) >= 5
