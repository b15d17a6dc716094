"""TCP query server (an extra over the reference's stdin loop):
protocol round-trips against a resident index."""

import json
import socket
import threading

import numpy as np
import pytest

from generators import planted_clusters, random_keys
from gulon_tpu.models.build import build_flat_index
from gulon_tpu.ops.pq import PQConfig
from gulon_tpu.server import QueryServer


@pytest.fixture(scope="module")
def index():
    rng = np.random.default_rng(13)
    x, _, _ = planted_clusters(rng, 800, 16, 8, scale=0.2)
    keys = random_keys(rng, 800)
    return build_flat_index(
        keys, x,
        pq_config=PQConfig(num_clusters=32, num_quantizers=8, max_iters=20),
    ), keys, x


@pytest.fixture(scope="module")
def server(index):
    idx, _, _ = index
    srv = QueryServer(idx, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _rpc(server, *requests):
    host, port = server.address[0], server.address[1]
    with socket.create_connection((host, port), timeout=10) as s:
        f = s.makefile("rwb")
        out = []
        for req in requests:
            f.write(json.dumps(req).encode() + b"\n")
            f.flush()
            out.append(json.loads(f.readline()))
        return out


def test_ping_and_info(server, index):
    idx, _, _ = index
    ping, info = _rpc(server, {"op": "ping"}, {"op": "info"})
    assert ping == {"ok": True}
    assert info["type"] == "FlatIndex"
    assert info["size"] == idx.size and info["dimension"] == 16


def test_query_vector_and_batch(server, index):
    idx, keys, x = index
    (single,) = _rpc(server, {"k": 5, "vector": x[7].tolist()})
    assert single["keys"][0][0] == str(keys[7])
    assert len(single["keys"][0]) == 5
    assert single["distances"][0] == sorted(single["distances"][0])
    (batch,) = _rpc(server, {"k": 3, "vectors": x[:4].tolist()})
    assert [row[0] for row in batch["keys"]] == [str(k) for k in keys[:4]]
    # identical to the library path
    lib = idx.batch_query(3, x[:4])
    assert batch["keys"] == [[str(w) for w in r.keys] for r in lib]


def test_query_words_and_lookup(server, index):
    _, keys, _ = index
    (resp,) = _rpc(
        server, {"k": 2, "words": [str(keys[3]), "not-a-word"]}
    )
    assert resp["keys"][0][0] == str(keys[3])
    assert resp["keys"][1] is None and resp["distances"][1] is None
    (vec,) = _rpc(server, {"op": "lookup", "word": str(keys[3])})
    assert len(vec["vector"]) == 16
    (miss,) = _rpc(server, {"op": "lookup", "word": "not-a-word"})
    assert miss["vector"] is None


def test_errors_keep_connection_open(server):
    host, port = server.address[0], server.address[1]
    with socket.create_connection((host, port), timeout=10) as s:
        f = s.makefile("rwb")
        for payload, frag in [
            (b"not json\n", "bad json"),
            (b'{"k": 0, "vector": [1]}\n', "k must be"),
            (b'{"k": 1, "vector": [1, 2]}\n', "queries must be"),
            (b'{"op": "nope"}\n', "unknown op"),
        ]:
            f.write(payload)
            f.flush()
            resp = json.loads(f.readline())
            assert frag in resp["error"]
        # still serving after 4 errors
        f.write(b'{"op": "ping"}\n')
        f.flush()
        assert json.loads(f.readline()) == {"ok": True}


def test_cli_serve_smoke(index, tmp_path):
    """cmd_serve end-to-end: save index, serve on an ephemeral port,
    query over the socket, shut down."""
    import gulon_tpu.server as server_mod
    from gulon_tpu import cli
    from gulon_tpu.utils.serde import save_index

    idx, keys, x = index
    path = str(tmp_path / "srv.idx")
    save_index(idx, path)

    ready = {}
    event = threading.Event()
    real_serve = server_mod.serve

    def capture_serve(index_, host="127.0.0.1", port=0, ready_fn=None,
                      **kwargs):
        def on_ready(h, p):
            ready["addr"] = (h, p)
            event.set()
            if ready_fn:
                ready_fn(h, p)
        return real_serve(index_, host, port, on_ready)

    server_mod.serve = capture_serve
    cli_thread = threading.Thread(
        target=cli.main, args=(["serve", "--index", path],), daemon=True
    )
    try:
        cli_thread.start()
        assert event.wait(timeout=120), "server never became ready"
        host, port = ready["addr"]
        with socket.create_connection((host, port), timeout=10) as s:
            f = s.makefile("rwb")
            f.write(
                json.dumps({"k": 2, "vector": x[0].tolist()}).encode()
                + b"\n"
            )
            f.flush()
            resp = json.loads(f.readline())
        assert resp["keys"][0][0] == str(keys[0])
    finally:
        server_mod.serve = real_serve


def test_sharded_index_info_and_query(index):
    """Sharded indices serve info/query (metric passthrough; the server
    must answer an error line, not drop the connection, on any failure)."""
    from gulon_tpu.parallel import make_mesh, shard_index

    idx, keys, x = index
    sharded = shard_index(idx, make_mesh())
    srv = QueryServer(sharded, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        info, resp = _rpc(
            srv, {"op": "info"}, {"k": 3, "vector": x[5].tolist()}
        )
        assert info["type"] == "ShardedFlatIndex"
        assert info["metric"] == "l2"
        assert resp["keys"][0][0] == str(keys[5])
    finally:
        srv.shutdown()


def test_words_batched_single_dispatch(server, index):
    """The words form issues ONE batched device query, not per-word."""
    idx, keys, _ = index
    calls = []
    orig = type(idx).query_arrays

    def counting(self, k, vectors):
        calls.append(len(vectors))
        return orig(self, k, vectors)

    type(idx).query_arrays = counting
    try:
        (resp,) = _rpc(
            server,
            {"k": 2, "words": [str(k) for k in keys[:6]] + ["missing"]},
        )
    finally:
        type(idx).query_arrays = orig
    assert calls == [6]
    assert resp["keys"][6] is None
    assert all(r[0] == str(keys[i]) for i, r in enumerate(resp["keys"][:6]))


def test_ivf_index_server_roundtrip():
    """The server serves a partitioned index too — single-vector queries
    ride the IVF auto (sublinear) default and batch queries still answer
    correctly."""
    from gulon_tpu.models.build import build_ivf_index
    from gulon_tpu.models.ivf import LimitGroups

    rng = np.random.default_rng(21)
    x, _, _ = planted_clusters(rng, 1200, 16, 8, scale=0.2)
    keys = random_keys(rng, 1200)
    idx = build_ivf_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=8),
        num_partitions=10,
        strategy=LimitGroups(3),
    )
    assert idx.scan_strategy == "auto"
    srv = QueryServer(idx, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        info, single, word = _rpc(
            srv,
            {"op": "info"},
            {"k": 5, "vector": x[7].tolist()},
            {"k": 3, "words": [str(keys[7])]},
        )
        assert info["type"] == "IVFIndex"
        assert single["keys"][0][0] == str(keys[7])
        assert single["distances"][0] == sorted(single["distances"][0])
        assert word["keys"][0][0] == str(keys[7])
    finally:
        srv.shutdown()


# -- micro-batching ---------------------------------------------------------


class _CountingIndex:
    """Proxy that counts device-query calls (delegates everything else)."""

    def __init__(self, idx):
        self._idx = idx
        self.calls = 0
        self.batch_sizes = []

    def query_arrays(self, k, q):
        self.calls += 1
        self.batch_sizes.append(int(np.asarray(q).shape[0]))
        return self._idx.query_arrays(k, q)

    def __getattr__(self, name):
        return getattr(self._idx, name)


@pytest.fixture()
def batched_server(index):
    idx, _, _ = index
    counting = _CountingIndex(idx)
    srv = QueryServer(counting, port=0, micro_batch_window_ms=150.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, counting
    srv.shutdown()
    srv.server_close()


def test_micro_batch_coalesces_and_matches(batched_server, index):
    """Concurrent single-vector clients are coalesced into fewer device
    batches, and every client gets exactly the unbatched answer."""
    srv, counting = batched_server
    idx, keys, x = index
    n_clients = 8
    sorted_keys = np.asarray(idx.key_index.keys, dtype=object)
    rows = list(range(0, n_clients * 7, 7))
    want = {}
    for r in rows:
        d, i = idx.query_arrays(5, x[r : r + 1].astype(np.float32))
        want[r] = [str(sorted_keys[j]) for j in np.asarray(i)[0]]
    counting.calls = 0
    counting.batch_sizes = []

    results = {}
    barrier = threading.Barrier(n_clients)

    def client(r):
        barrier.wait()
        (resp,) = _rpc(srv, {"k": 5, "vector": x[r].tolist()})
        results[r] = resp

    threads = [threading.Thread(target=client, args=(r,)) for r in rows]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert len(results) == n_clients
    for r in rows:
        got_keys = results[r]["keys"][0]
        assert got_keys[0] == str(keys[r])
        # identical ids to the direct (unbatched) query
        assert got_keys == want[r]
    # the whole burst coalesced into fewer device calls than clients
    assert counting.calls < n_clients, counting.batch_sizes
    # cohorts are padded to power-of-two buckets
    assert all(b & (b - 1) == 0 for b in counting.batch_sizes)


def test_micro_batch_mixed_k(batched_server, index):
    """A cohort mixing k values answers each caller at its own k (top-k
    truncation of the cohort's k_max results)."""
    srv, _ = batched_server
    idx, keys, x = index
    results = {}
    barrier = threading.Barrier(3)

    def client(r, k):
        barrier.wait()
        (resp,) = _rpc(srv, {"k": k, "vector": x[r].tolist()})
        results[(r, k)] = resp

    specs = [(2, 1), (3, 4), (5, 9)]
    threads = [threading.Thread(target=client, args=s) for s in specs]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    sorted_keys = np.asarray(idx.key_index.keys, dtype=object)
    for r, k in specs:
        resp = results[(r, k)]
        assert len(resp["keys"][0]) == k
        assert resp["keys"][0][0] == str(keys[r])
        d, i = idx.query_arrays(k, x[r : r + 1].astype(np.float32))
        assert resp["keys"][0] == [
            str(sorted_keys[j]) for j in np.asarray(i)[0]
        ]


def test_micro_batch_error_isolated_and_worker_survives(index):
    """A device-side failure fails its cohort with error replies but the
    worker (and the connection) survive for the next request."""
    idx, keys, x = index

    class _FlakyIndex(_CountingIndex):
        def query_arrays(self, k, q):
            self.calls += 1
            if self.calls == 1:
                raise RuntimeError("injected device failure")
            return self._idx.query_arrays(k, q)

    flaky = _FlakyIndex(idx)
    srv = QueryServer(flaky, port=0, micro_batch_window_ms=20.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        first, second = _rpc(
            srv,
            {"k": 3, "vector": x[1].tolist()},
            {"k": 3, "vector": x[1].tolist()},
        )
        assert "injected device failure" in first["error"]
        assert second["keys"][0][0] == str(keys[1])
    finally:
        srv.shutdown()
        srv.server_close()


def test_micro_batch_words_path(batched_server, index):
    """The words path routes through the batcher too."""
    srv, counting = batched_server
    _, keys, _ = index
    (resp,) = _rpc(srv, {"k": 2, "words": [str(keys[11]), "nope"]})
    assert resp["keys"][0][0] == str(keys[11])
    assert resp["keys"][1] is None


def test_micro_batch_info_counters(batched_server):
    """info exposes batcher counters when micro-batching is enabled."""
    srv, _ = batched_server
    (_q, info) = _rpc(
        srv,
        {"k": 1, "vector": [0.0] * 16},
        {"op": "info"},
    )
    mb = info["micro_batch"]
    assert mb["window_ms"] == 150.0
    assert mb["cohorts"] >= 1 and mb["requests"] >= 1 and mb["rows"] >= 1
