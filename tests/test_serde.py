"""Protobuf persistence: save -> load is identity for query behavior
(ref IndexSpec:75-80), across index types, metrics, strategies, and code
widths (incl. sub-byte and byte-plus packing on the wire)."""

import numpy as np
import pytest

from generators import planted_clusters, random_keys
from gulon_tpu.models.build import build_flat_index, build_ivf_index
from gulon_tpu.models.ivf import LimitGroups, LimitVectors
from gulon_tpu.models.metric import Metric
from gulon_tpu.ops.pq import PQConfig
from gulon_tpu.proto import index_pb2 as pb
from gulon_tpu.utils.serde import load_index, save_index


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(13)
    x, _, _ = planted_clusters(rng, 400, 12, 5, scale=0.3)
    return random_keys(rng, 400), x


def _roundtrip_and_compare(index, path, queries):
    save_index(index, path)
    loaded = load_index(path)
    a = index.batch_query(6, queries)
    b = loaded.batch_query(6, queries)
    for ra, rb in zip(a, b):
        assert list(ra.keys) == list(rb.keys)
        np.testing.assert_allclose(ra.distances, rb.distances, rtol=1e-5)
    return loaded


@pytest.mark.parametrize(
    "clusters", [4, 16, 256, 1024]  # widths 2, 4, 8, 10 on the wire
)
def test_flat_roundtrip_all_code_widths(data, tmp_path, clusters):
    keys, x = data
    index = build_flat_index(
        keys, x,
        pq_config=PQConfig(
            num_clusters=clusters, num_quantizers=3, max_iters=5
        ),
    )
    loaded = _roundtrip_and_compare(
        index, tmp_path / "f.idx", x[:5]
    )
    assert loaded.pq.num_clusters == clusters
    np.testing.assert_array_equal(
        np.asarray(loaded.codes), np.asarray(index.codes)
    )


@pytest.mark.parametrize(
    "metric,strategy",
    [
        (Metric.L2, LimitGroups(3)),
        (Metric.COSINE, LimitVectors(150)),
    ],
)
def test_ivf_roundtrip(data, tmp_path, metric, strategy):
    keys, x = data
    index = build_ivf_index(
        keys, x,
        metric=metric,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=5),
        num_partitions=8,
        strategy=strategy,
    )
    loaded = _roundtrip_and_compare(index, tmp_path / "g.idx", x[:5])
    assert type(loaded.strategy) is type(strategy)
    assert loaded.strategy.count == strategy.count
    assert loaded.metric == metric
    np.testing.assert_array_equal(
        np.asarray(loaded.group_ids), np.asarray(index.group_ids)
    )


def test_wire_format_structure(data, tmp_path):
    """The on-disk bytes parse as the reference proto schema: oneof set,
    quantizer-major encodings, one blob per subquantizer."""
    keys, x = data
    index = build_flat_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=5),
    )
    path = tmp_path / "w.idx"
    save_index(index, path)
    msg = pb.Index()
    msg.ParseFromString(path.read_bytes())
    assert msg.WhichOneof("implementation") == "sorted"
    si = msg.sorted
    assert len(si.sorted_words) == len(keys)
    assert list(si.sorted_words) == sorted(keys)
    em = si.vector_index.data
    assert em.code_width == 4  # 16 clusters -> 4-bit storage
    assert len(em.encodings) == 4  # one blob per subquantizer
    assert em.length == len(keys)
    pq_msg = si.vector_index.product_quantizer
    assert len(pq_msg.quantizers) == 4
    assert pq_msg.quantizers[0].start_index == 0


def test_corrupt_file_raises(tmp_path):
    p = tmp_path / "junk.idx"
    p.write_bytes(b"\x00\x01nonsense\xff" * 10)
    with pytest.raises(Exception):
        load_index(p)


def test_build_is_seed_deterministic(data, tmp_path):
    """Same inputs + same seed -> byte-identical serialized index
    (reproducible builds, the reference's seeded init/training)."""
    keys, x = data
    cfg = PQConfig(num_clusters=16, num_quantizers=4, max_iters=8, seed=7)
    a = build_flat_index(keys, x, pq_config=cfg)
    b = build_flat_index(keys, x, pq_config=cfg)
    pa, pb = tmp_path / "a.idx", tmp_path / "b.idx"
    save_index(a, pa)
    save_index(b, pb)
    assert pa.read_bytes() == pb.read_bytes()


def test_save_sharded_index_persists_base(tmp_path):
    """save_index on a sharded index persists the base (placement is
    runtime state); the loaded index re-shards to identical results."""
    import numpy as np

    from generators import planted_clusters, random_keys
    from gulon_tpu.models.build import build_flat_index
    from gulon_tpu.ops.pq import PQConfig
    from gulon_tpu.parallel import make_mesh, shard_index
    from gulon_tpu.utils.serde import load_index, save_index

    rng = np.random.default_rng(7)
    x, _, _ = planted_clusters(rng, 600, 16, 6, scale=0.3)
    keys = random_keys(rng, 600)
    base = build_flat_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=8),
    )
    sharded = shard_index(base, make_mesh())
    path = str(tmp_path / "sh.idx")
    save_index(sharded, path)
    loaded = load_index(path)
    d1, i1 = map(np.asarray, base.query_arrays(5, x[:8]))
    d2, i2 = map(np.asarray, loaded.query_arrays(5, x[:8]))
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i1, i2)
