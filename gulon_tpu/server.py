"""Line-protocol query server: load an index once, serve batched queries.

A production-serving extra over the reference (whose only interactive
surface is the stdin ``query-words`` loop, ``QueryWords.scala:33-54``):
the expensive parts of serving an index — loading, device placement,
lazy kernel layouts, jit compilation (or AOT artifacts via ``--aot``) —
happen once at startup; every connection then queries the resident index
at device-batch speed.

Protocol: newline-delimited JSON over TCP (trivially scriptable with
``nc`` or a few lines of any language). Requests:

    {"k": 10, "vector": [0.1, ...]}          one query vector
    {"k": 10, "vectors": [[...], [...]]}     a batch
    {"k": 5, "words": ["tokyo", "paris"]}    query by key
    {"op": "lookup", "word": "tokyo"}        approximate reconstruction
    {"op": "info"}                           index metadata
    {"op": "ping"}                           liveness

Responses (one JSON line per request): ``{"keys": [[...]], "distances":
[[...]]}`` for queries (``null`` entries for words not in the index),
``{"vector": [...]}``/``{"vector": null}`` for lookup, ``{"error": msg}``
on bad input (the connection stays open).

Concurrency: connections are handled on threads, but device work is
serialized under a lock — one TPU executes one program at a time anyway,
and batching inside a request is the throughput lever (see SERVING.md).
"""

from __future__ import annotations

import json
import socketserver
import threading
from typing import Optional

import numpy as np


_MAX_LINE = 64 << 20  # 64 MiB: far above any sane query batch, far below RAM


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        server = self.server  # QueryServer
        while True:
            raw = self.rfile.readline(_MAX_LINE)
            if not raw:
                break
            if len(raw) >= _MAX_LINE and not raw.endswith(b"\n"):
                # unbounded line: reply once and drop the connection
                # rather than buffering arbitrary bytes next to the
                # resident index
                self.wfile.write(
                    b'{"error": "request line exceeds 64MiB"}\n'
                )
                self.wfile.flush()
                break
            line = raw.strip()
            if not line:
                continue
            try:
                reply = server.handle_payload(json.loads(line))
            except json.JSONDecodeError as e:
                reply = {"error": f"bad json: {e}"}
            except Exception as e:  # noqa: BLE001 — a serving loop must
                # answer SOMETHING for any failed request (the protocol
                # contract is one reply line per request, connection
                # stays open); bare `except` would also trap
                # KeyboardInterrupt/SystemExit, Exception does not
                reply = {"error": f"{type(e).__name__}: {e}"}
            self.wfile.write(json.dumps(reply).encode("utf-8") + b"\n")
            self.wfile.flush()


class QueryServer(socketserver.ThreadingTCPServer):
    """TCP server around a loaded index (see module docstring)."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, index, host: str = "127.0.0.1", port: int = 0):
        super().__init__((host, port), _Handler)
        self.index = index
        self._device_lock = threading.Lock()

    @property
    def address(self):
        return self.server_address  # (host, bound_port)

    def handle_payload(self, req: dict) -> dict:
        # NOT named handle_request: socketserver.BaseServer already has a
        # handle_request() ("accept one socket request"), which embedders
        # may call — shadowing it with an incompatible signature would
        # break the stdlib API
        if not isinstance(req, dict):
            raise ValueError("request must be a JSON object")
        op = req.get("op", "query")
        if op == "ping":
            return {"ok": True}
        if op == "info":
            idx = self.index
            return {
                "type": type(getattr(idx, "index", idx)).__name__,
                "size": int(idx.size),
                "dimension": int(idx.dimension),
                "metric": idx.metric.name.lower(),
            }
        if op == "lookup":
            vec = self.index.lookup(str(req["word"]))
            return {"vector": None if vec is None else
                    np.asarray(vec, np.float32).tolist()}
        if op != "query":
            raise ValueError(f"unknown op {op!r}")

        k = int(req.get("k", 1))
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        if "words" in req:
            # look every word up first, then ONE batched device query for
            # the found ones (per-word query_by_word would be a device
            # dispatch per word — the opposite of the batching this
            # server exists for)
            words = [str(w) for w in req["words"]]
            found = [(i, self.index.lookup(w)) for i, w in enumerate(words)]
            rows = [(i, v) for i, v in found if v is not None]
            keys_out = [None] * len(words)
            dists_out = [None] * len(words)
            if rows:
                q = np.stack([v for _, v in rows]).astype(np.float32)
                with self._device_lock:
                    results = self.index.batch_query(k, q)
                for (i, _), res in zip(rows, results):
                    keys_out[i] = [str(x) for x in res.keys]
                    dists_out[i] = [float(d) for d in res.distances]
            return {"keys": keys_out, "distances": dists_out}

        if "vector" in req:
            q = np.asarray([req["vector"]], np.float32)
        elif "vectors" in req:
            q = np.asarray(req["vectors"], np.float32)
        else:
            raise ValueError(
                "query needs 'vector', 'vectors', or 'words'"
            )
        if q.ndim != 2 or q.shape[1] != self.index.dimension:
            raise ValueError(
                f"queries must be [n, {self.index.dimension}], "
                f"got {list(q.shape)}"
            )
        with self._device_lock:
            dists, ids = self.index.query_arrays(k, q)
        dists = np.asarray(dists)
        ids = np.asarray(ids)
        # same validity rule as Index._make_results: drop -1 padding AND
        # non-finite distances (inf/NaN would serialize as non-RFC JSON
        # tokens that strict clients reject)
        valid = (ids >= 0) & np.isfinite(dists)
        all_keys = np.asarray(self.index.key_index.keys, dtype=object)
        keys_out = [
            [str(w) for w in all_keys[row[v]]]
            for row, v in zip(ids, valid)
        ]
        dists_out = [
            [float(d) for d in drow[v]] for drow, v in zip(dists, valid)
        ]
        return {"keys": keys_out, "distances": dists_out}


def serve(
    index,
    host: str = "127.0.0.1",
    port: int = 0,
    ready_fn: Optional[callable] = None,
) -> None:
    """Run a :class:`QueryServer` until interrupted.

    ``ready_fn(host, port)`` is called once the socket is bound (the CLI
    prints the address; tests grab the ephemeral port).
    """
    with QueryServer(index, host, port) as server:
        h, p = server.address[0], server.address[1]
        if ready_fn is not None:
            ready_fn(h, p)
        try:
            server.serve_forever(poll_interval=0.2)
        except KeyboardInterrupt:
            pass
