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


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        server = self.server  # QueryServer
        for raw in self.rfile:
            line = raw.strip()
            if not line:
                continue
            try:
                reply = server.handle_request(json.loads(line))
            except json.JSONDecodeError as e:
                reply = {"error": f"bad json: {e}"}
            except (ValueError, KeyError, TypeError) as e:
                reply = {"error": str(e)}
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

    def handle_request(self, req: dict) -> dict:
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
            words = [str(w) for w in req["words"]]
            keys_out, dists_out = [], []
            with self._device_lock:
                for w in words:
                    res = self.index.query_by_word(k, w)
                    if res is None:
                        keys_out.append(None)
                        dists_out.append(None)
                    else:
                        keys_out.append([str(x) for x in res.keys])
                        dists_out.append(
                            [float(d) for d in res.distances]
                        )
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
        all_keys = np.asarray(self.index.key_index.keys, dtype=object)
        keys_out = [
            [str(w) for w in all_keys[row[row >= 0]]] for row in ids
        ]
        dists_out = [
            [float(d) for d, i in zip(drow, irow) if i >= 0]
            for drow, irow in zip(dists, ids)
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
