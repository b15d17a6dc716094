"""Streaming build pipeline: parse-index mode + double-buffered encode.

Central property: with a training sample covering the whole corpus, the
streaming builders produce indices IDENTICAL to the in-memory builders
(same codebooks, same codes, same results) — streaming is a memory-layout
transform, not an approximation. Chunk sizes are chosen to force multiple
pipeline iterations and an unterminated final line.
"""

import numpy as np
import pytest

from generators import planted_clusters, random_keys
from gulon_tpu.models.build import build_flat_index, build_ivf_index
from gulon_tpu.models.metric import Metric
from gulon_tpu.models.ivf import LimitGroups
from gulon_tpu.ops.pq import PQConfig
from gulon_tpu.utils import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native IO library unavailable"
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    rng = np.random.default_rng(77)
    n, d = 3000, 12
    x, _, _ = planted_clusters(rng, n, d, 10, scale=0.4)
    keys = random_keys(rng, n)
    path = tmp_path_factory.mktemp("w2v") / "vecs.txt"
    with open(path, "w") as f:
        f.write(f"{n} {d}\n")
        for i in range(n):
            f.write(keys[i] + " " + " ".join(f"{v:.6f}" for v in x[i]))
            if i < n - 1:
                f.write("\n")  # last line left unterminated on purpose
    return str(path), keys, x


def test_stream_rows_and_gather(corpus):
    path, keys, x = corpus
    with native.Word2VecStream(path) as s:
        assert s.num_rows == len(x) and s.dim == x.shape[1]
        assert list(s.keys[:3]) == list(keys[:3])
        tol = dict(rtol=1e-5, atol=1e-5)  # %.6f text round-trip
        np.testing.assert_allclose(s.rows(0, 7), x[:7], **tol)
        np.testing.assert_allclose(
            s.rows(len(x) - 5, 5), x[-5:], **tol
        )  # crosses the unterminated tail line
        ids = np.array([2999, 0, 1500, 7], np.int64)
        np.testing.assert_allclose(s.gather(ids), x[ids], **tol)
        with pytest.raises(ValueError):
            s.rows(len(x) - 1, 2)
        with pytest.raises(ValueError):
            s.gather([len(x)])


def test_streaming_flat_matches_inmemory(corpus):
    from gulon_tpu.models.streaming import build_flat_index_streaming

    path, keys, x = corpus
    # the in-memory reference must see EXACTLY the file's values
    with native.Word2VecStream(path) as s:
        x = s.rows(0, s.num_rows)
    cfg = PQConfig(
        num_clusters=16, num_quantizers=4, max_iters=8, train_sample=None
    )
    a = build_flat_index(keys, x, metric=Metric.COSINE, pq_config=cfg)
    b = build_flat_index_streaming(
        path, metric=Metric.COSINE, pq_config=cfg, encode_chunk=700
    )
    np.testing.assert_allclose(
        np.asarray(a.pq.codebooks), np.asarray(b.pq.codebooks),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(b.codes))
    assert list(a.key_index.keys) == list(b.key_index.keys)
    q = x[5:9]
    ra, rb = a.batch_query(6, q), b.batch_query(6, q)
    for p, r in zip(ra, rb):
        assert list(p.keys) == list(r.keys)
        np.testing.assert_allclose(p.distances, r.distances, rtol=1e-5)


def test_streaming_ivf_matches_inmemory(corpus):
    from gulon_tpu.models.streaming import build_ivf_index_streaming

    path, keys, x = corpus
    with native.Word2VecStream(path) as s:
        x = s.rows(0, s.num_rows)
    cfg = PQConfig(
        num_clusters=16, num_quantizers=3, max_iters=8, train_sample=None
    )
    kw = dict(
        pq_config=cfg, num_partitions=8, strategy=LimitGroups(3),
        coarse_max_iters=8,
    )
    a = build_ivf_index(keys, x, **kw)
    b = build_ivf_index_streaming(path, encode_chunk=701, **kw)
    np.testing.assert_allclose(
        np.asarray(a.centroids), np.asarray(b.centroids), rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(b.codes))
    np.testing.assert_array_equal(
        np.asarray(a.group_ids), np.asarray(b.group_ids)
    )
    np.testing.assert_allclose(
        np.asarray(a.row_const), np.asarray(b.row_const), rtol=1e-4,
        atol=1e-4,
    )
    q = x[40:48]
    ra, rb = a.batch_query(5, q), b.batch_query(5, q)
    for p, r in zip(ra, rb):
        assert list(p.keys) == list(r.keys)


def test_streaming_reports_progress(corpus):
    from gulon_tpu.models.streaming import build_flat_index_streaming

    path, keys, x = corpus
    seen = []
    build_flat_index_streaming(
        path,
        pq_config=PQConfig(
            num_clusters=8, num_quantizers=2, max_iters=4,
            train_sample=500,
        ),
        encode_chunk=1000,
        report_fn=seen.append,
    )
    rows = [p.rows_done for p in seen]
    assert rows[-1] == len(x)
    assert rows == sorted(rows)


def test_streaming_flat_mesh_matches_single_device(corpus):
    """Mesh streaming build == single-device streaming build: the chunk
    fan-out over mesh rows is a pure layout transform."""
    from gulon_tpu.models.streaming import build_flat_index_streaming
    from gulon_tpu.parallel import make_mesh

    path, keys, x = corpus
    cfg = PQConfig(num_clusters=16, num_quantizers=4, max_iters=8,
                   block_rows=256, train_sample=1024)
    one = build_flat_index_streaming(path, pq_config=cfg, encode_chunk=700)
    mesh = build_flat_index_streaming(
        path, pq_config=cfg, encode_chunk=700, mesh=make_mesh()
    )
    assert np.array_equal(np.asarray(one.codes), np.asarray(mesh.codes))
    d1, i1 = one.query_arrays(5, x[:8])
    d2, i2 = mesh.query_arrays(5, x[:8])
    assert np.array_equal(np.asarray(i1), np.asarray(i2))


def test_streaming_ivf_split_and_init_knobs(corpus):
    """Streaming IVF honors max_partition_size (bounded pmax, O(pmax)
    gathers) and coarse_init='kmeans++'."""
    from gulon_tpu.models.streaming import build_ivf_index_streaming

    path, keys, x = corpus
    cfg = PQConfig(num_clusters=16, num_quantizers=4, max_iters=8,
                   block_rows=256, train_sample=1024)
    index = build_ivf_index_streaming(
        path, pq_config=cfg,
        num_partitions=6, strategy=LimitGroups(4),
        coarse_max_iters=8, coarse_init="kmeans++",
        max_partition_size=200, encode_chunk=700,
    )
    assert index.partition_sizes().max() <= 200
    res = index.batch_query(1, x[:12])
    key_row = {k_: i for i, k_ in enumerate(keys)}
    # a correct scan returns the row itself or a same-cluster neighbour:
    # within a planted cluster E||a-b||^2 ~ 2*d*scale^2 ~ 3.8, across
    # clusters ~ 2*d*spread^2 ~ 24 — assert well under the cross-cluster gap
    for i, r in enumerate(res):
        true_d = float(((x[key_row[r.keys[0]]] - x[i]) ** 2).sum())
        assert true_d < 10.0, (i, true_d)
