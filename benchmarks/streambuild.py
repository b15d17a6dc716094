"""End-to-end disk-to-device build benchmark (VERDICT r4 item 6).

The build10m bench config streams a SYNTHETIC on-device corpus; this
harness measures the real thing: a 10M x 300d word2vec TEXT file on disk
(~18 GB) -> native mmap parse -> chunked device encode, overlapped
(``models/streaming.py`` + ``native/word2vec_parser.cpp``; the ingest
hot loop whose role this replaces is ``WordVectors.scala:162-197``).

Captured: parse-only throughput (MB/s), streaming-build wall, the
pipeline's time split (main thread blocked on parse vs device encode),
and the overlap fraction ``1 - wait_s / parse_only_s`` (how much of the
parse the device work hid). Results recorded in benchmarks/RESULTS.md.

Steps (each idempotent):
  python benchmarks/streambuild.py gen   [n] [path]   # write the corpus
  python benchmarks/streambuild.py parse [n] [path]   # parse-only pass
  python benchmarks/streambuild.py build [n] [path]   # streaming build
  python benchmarks/streambuild.py all   [n] [path]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

DEFAULT_PATH = "/root/w2v10m.txt"
D = 300


def gen(n: int, path: str, chunk: int = 65536):
    """Vectorized byte-level writer: each value is a fixed-width
    ``0.ddd``/``-0.ddd``-style token assembled from random digit bytes
    (GB/s-class generation; Python float formatting of 3e9 values would
    take hours on this box). Values are uniform per-digit — encode
    quality is irrelevant here, the benchmark measures the parse/encode
    pipeline."""
    if os.path.exists(path) and os.path.getsize(path) > n * 1000:
        print(f"corpus already present: {path}")
        return
    rng = np.random.default_rng(0)
    t0 = time.monotonic()
    tok_w = 6  # "0.ddd "
    key_w = 10  # "rXXXXXXXX "
    row_w = key_w + D * tok_w  # last token's space becomes '\n'
    # one reusable buffer: this box allocates/copies at ~100 MB/s, so
    # per-chunk np.full + .tobytes() would dominate the generation
    row = np.full((chunk, row_w), ord(" "), np.uint8)
    vals = row[:, key_w:].reshape(chunk, D, tok_w)
    vals[:, :, 0] = ord("0")
    vals[:, :, 1] = ord(".")
    row[:, 0] = ord("r")
    row[:, -1] = ord("\n")
    with open(path, "wb", buffering=1 << 22) as f:
        f.write(f"{n} {D}\n".encode())
        for s0 in range(0, n, chunk):
            c = min(chunk, n - s0)
            ids = np.arange(s0, s0 + c, dtype=np.int64)
            for pos in range(8):  # key field "r%08d "
                row[:c, 1 + pos] = (
                    ids // 10 ** (7 - pos) % 10 + ord("0")
                ).astype(np.uint8)
            vals[:c, :, 2:5] = rng.integers(
                ord("0"), ord("9") + 1, (c, D, 3), dtype=np.uint8
            )
            f.write(row[:c].data)
            if s0 % (chunk * 16) == 0:
                mb = (s0 + c) * row_w / 1e6
                el = time.monotonic() - t0
                print(
                    f"  gen {s0 + c}/{n} rows "
                    f"({mb:.0f} MB, {mb / el:.0f} MB/s)",
                    flush=True,
                )
    sz = os.path.getsize(path)
    print(
        f"[gen] {n} rows, {sz / 1e9:.2f} GB in "
        f"{time.monotonic() - t0:.1f}s",
        flush=True,
    )


def parse_only(n: int, path: str):
    """Pure host pass: native parse of every row, no device work."""
    from gulon_tpu.utils.native import Word2VecStream

    t0 = time.monotonic()
    with Word2VecStream(path, 0) as stream:
        assert stream.num_rows == n, (stream.num_rows, n)
        index_s = time.monotonic() - t0  # key+offset indexing pass
        t1 = time.monotonic()
        chunk = 1 << 18
        total = 0
        for s0 in range(0, n, chunk):
            x = stream.rows(s0, min(chunk, n - s0))
            total += x.shape[0]
        rows_s = time.monotonic() - t1
    sz = os.path.getsize(path)
    print(
        f"[parse] index {index_s:.1f}s, rows {rows_s:.1f}s "
        f"({sz / 1e6 / rows_s:.0f} MB/s row-parse, "
        f"{sz / 1e6 / (index_s + rows_s):.0f} MB/s end-to-end)",
        flush=True,
    )
    return index_s, rows_s


def build(n: int, path: str, parse_only_s=None):
    from gulon_tpu.models.metric import Metric
    from gulon_tpu.models.streaming import build_flat_index_streaming
    from gulon_tpu.ops.pq import PQConfig
    from gulon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    stats = {}
    t0 = time.monotonic()
    index = build_flat_index_streaming(
        path,
        Metric.L2,
        PQConfig(
            num_clusters=256, num_quantizers=25, max_iters=10,
            train_sample=200_000,
        ),
        pipeline_stats=stats,
    )
    wall = time.monotonic() - t0
    sz = os.path.getsize(path)
    out = {
        "rows": n,
        "file_gb": round(sz / 1e9, 2),
        "build_wall_s": round(wall, 1),
        "encode_pipeline_s": round(stats.get("wall_s", 0.0), 1),
        "main_thread_parse_wait_s": round(stats.get("wait_s", 0.0), 1),
        "device_consume_s": round(stats.get("consume_s", 0.0), 1),
        "index_rows": int(index.codes.shape[0]),
    }
    if parse_only_s:
        out["parse_only_s"] = round(parse_only_s, 1)
        out["parse_hidden_fraction"] = round(
            1.0 - stats.get("wait_s", 0.0) / parse_only_s, 3
        )
    print(f"[build] {out}", flush=True)
    # serve a sanity query so the artifact is demonstrably a live index
    q = np.asarray(index.pq.decode(index.codes[:4]))
    d_, i_ = index.query_arrays(5, q)
    print(f"[build] sanity top-1 ids {np.asarray(i_)[:, 0].tolist()}",
          flush=True)
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    path = sys.argv[3] if len(sys.argv) > 3 else DEFAULT_PATH
    if which in ("gen", "all"):
        gen(n, path)
    ps = None
    if which in ("parse", "all"):
        idx_s, rows_s = parse_only(n, path)
        ps = idx_s + rows_s
    if which in ("build", "all"):
        build(n, path, parse_only_s=ps)


if __name__ == "__main__":
    main()
