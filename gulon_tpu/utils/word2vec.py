"""Streaming word2vec text-format reader.

Counterpart of reference ``WordVectors.scala``:

- optional ``"<count> <dim>"`` header sniffing with pushback
  (``WordVectors.scala:141-160``): if the first line is exactly two integer
  tokens it is a header, otherwise it is data;
- single-pass chunked parse with progress reports including a memory
  estimate (``WordVectors.scala:199-257``);
- optional L2-normalize-on-read (``WordVectors.scala:221-234``), the ingest
  half of the Cosine metric.

The hand-rolled JVM char scanner (``readFast``, ``WordVectors.scala:162-197``)
is replaced by either the native C parser (``gulon_tpu.utils.native``, a
memory-mapped single-pass float parser) or a numpy fallback; both produce
identical float32 arrays.
"""

from __future__ import annotations

import dataclasses
import io
import os
from typing import Callable, Iterable, List, Optional, TextIO, Tuple

import numpy as np

DEFAULT_CHUNK_LINES = 10_000


@dataclasses.dataclass(frozen=True)
class ReadProgress:
    """Mirrors ``WordVectors.ProgressReport`` (``WordVectors.scala:199-209``)."""

    lines_read: int
    total_lines: Optional[int]  # None when the file had no header
    size_estimate_bytes: int

    @property
    def percentage(self) -> Optional[float]:
        if not self.total_lines:
            return None
        return 100.0 * self.lines_read / self.total_lines


@dataclasses.dataclass(frozen=True)
class WordVectors:
    """Keyed embedding matrix in read order (``WordVectors.Unindexed``)."""

    keys: np.ndarray  # [n] object (str)
    vectors: np.ndarray  # [n, d] f32

    def __post_init__(self):
        if len(self.keys) != len(self.vectors):
            raise ValueError("keys and vectors must have equal length")

    def __len__(self) -> int:
        return len(self.keys)

    @property
    def dimension(self) -> int:
        return int(self.vectors.shape[1])

    def sorted(self) -> "WordVectors":
        """Sort by key, permuting rows (``WordVectors.scala:60-68``)."""
        order = np.argsort(self.keys, kind="stable")
        return WordVectors(self.keys[order], self.vectors[order])

    def normalized(self) -> "WordVectors":
        norms = np.linalg.norm(self.vectors, axis=1, keepdims=True)
        safe = np.where(norms > 0, norms, 1.0)
        return WordVectors(self.keys, np.where(norms > 0, self.vectors / safe, self.vectors))

    def grouped(self, centroids, assignments) -> "GroupedWordVectors":
        """Group rows by coarse cluster (``WordVectors.scala:24-58``).

        Rows sort stably by (cluster, key); empty clusters are dropped (and
        the surviving centroids renumbered), matching the reference's
        ``WordVectors.grouped``.
        """
        centroids = np.asarray(centroids, np.float32)
        assignments = np.asarray(assignments)
        if len(assignments) != len(self):
            raise ValueError("assignments must cover every row")
        order = np.lexsort((self.keys, assignments))
        keys_g = self.keys[order]
        x_g = self.vectors[order]
        assign_g = assignments[order]
        used = np.unique(assign_g)  # ascending
        remap = np.zeros(int(assignments.max()) + 1 if len(self) else 1,
                         np.int32)
        remap[used] = np.arange(len(used), dtype=np.int32)
        group_ids = remap[assign_g]
        change = np.nonzero(np.diff(group_ids))[0] + 1
        return GroupedWordVectors(
            keys=keys_g,
            vectors=x_g,
            centroids=centroids[used],
            group_ids=group_ids.astype(np.int32),
            group_offsets=change.astype(np.int32),
        )


@dataclasses.dataclass(frozen=True)
class GroupedWordVectors:
    """Rows grouped by coarse cluster (``WordVectors.Grouped``).

    ``group_offsets`` are the *internal* boundaries (num_groups - 1 entries,
    the ``centroids == offsets + 1`` invariant of ``Index.scala:241-242``).
    """

    keys: np.ndarray  # [n] object, sorted within each group
    vectors: np.ndarray  # [n, d] f32, grouped row order
    centroids: np.ndarray  # [G, d] f32, empty clusters dropped
    group_ids: np.ndarray  # [n] i32
    group_offsets: np.ndarray  # [G - 1] i32

    def __len__(self) -> int:
        return len(self.keys)

    @property
    def num_groups(self) -> int:
        return len(self.centroids)

    def cluster_of(self, row: int) -> int:
        """Group containing ``row`` (``WordVectors.scala:110-113``)."""
        return int(self.group_ids[row])

    def residuals(self) -> np.ndarray:
        """``vector - its centroid`` (``WordVectors.scala:115-138``; computed
        on demand — the reference caches via WeakReference, same idea)."""
        return self.vectors - self.centroids[self.group_ids]


def _sniff_header(first_line: str) -> Optional[Tuple[int, int]]:
    """Header iff the line is exactly two base-10 ints (``WordVectors.scala:143-160``)."""
    parts = first_line.split()
    if len(parts) != 2:
        return None
    try:
        return int(parts[0]), int(parts[1])
    except ValueError:
        return None


def _parse_lines(
    lines: List[str], dimension: Optional[int]
) -> Tuple[List[str], np.ndarray]:
    """Parse 'word f f f ...' lines into (keys, [n, d] f32)."""
    keys: List[str] = []
    rows: List[np.ndarray] = []
    for line in lines:
        line = line.rstrip("\n")
        if not line:
            continue
        sep = line.find(" ")
        if sep < 0:
            raise ValueError(f"malformed word2vec line: {line!r}")
        keys.append(line[:sep])
        vec = np.array(line[sep + 1 :].split(), dtype=np.float32)
        if dimension is not None and len(vec) != dimension:
            raise ValueError(
                f"expected {dimension} dims, got {len(vec)} in line for {keys[-1]!r}"
            )
        rows.append(vec)
    if not rows:
        return keys, np.zeros((0, dimension or 0), np.float32)
    return keys, np.vstack(rows)


def read_word2vec(
    source: TextIO,
    normalize: bool = False,
    report_fn: Optional[Callable[[ReadProgress], None]] = None,
    chunk_lines: int = DEFAULT_CHUNK_LINES,
) -> WordVectors:
    """Stream-parse word2vec text from a file-like object.

    Counterpart of ``WordVectors.readWord2Vec`` (``WordVectors.scala:213-257``):
    header sniff with pushback, chunked parsing with progress callbacks,
    optional normalize-on-read.
    """
    first = source.readline()
    total: Optional[int] = None
    dimension: Optional[int] = None
    pushback: Optional[str] = None
    header = _sniff_header(first) if first else None
    if header is not None:
        total, dimension = header
    elif first:
        pushback = first

    all_keys: List[str] = []
    all_rows: List[np.ndarray] = []
    lines_read = 0
    size_estimate = 0

    def flush(chunk: List[str]):
        nonlocal lines_read, size_estimate, dimension
        keys, vecs = _parse_lines(chunk, dimension)
        if dimension is None and len(vecs):
            dimension = vecs.shape[1]
        all_keys.extend(keys)
        all_rows.append(vecs)
        lines_read += len(keys)
        size_estimate += vecs.nbytes + sum(len(k) for k in keys)
        if report_fn is not None:
            report_fn(ReadProgress(lines_read, total, size_estimate))

    chunk: List[str] = [pushback] if pushback else []
    for line in source:
        chunk.append(line)
        if len(chunk) >= chunk_lines:
            flush(chunk)
            chunk = []
    if chunk:
        flush(chunk)

    keys = np.array(all_keys, dtype=object)
    vectors = (
        np.vstack(all_rows)
        if all_rows
        else np.zeros((0, dimension or 0), np.float32)
    )
    wv = WordVectors(keys, vectors.astype(np.float32, copy=False))
    if normalize:
        wv = wv.normalized()
    return wv


def read_word2vec_path(
    path: os.PathLike | str,
    normalize: bool = False,
    report_fn: Optional[Callable[[ReadProgress], None]] = None,
    chunk_lines: int = DEFAULT_CHUNK_LINES,
    use_native: bool = True,
) -> WordVectors:
    """Read a word2vec text file from disk (``WordVectors.readWord2VecPath``).

    Prefers the native C parser when available (an order of magnitude faster
    on multi-GB files); falls back to the streaming Python reader.
    """
    if use_native:
        try:
            from gulon_tpu.utils import native

            if native.available():
                wv = native.read_word2vec(str(path), report_fn=report_fn)
                return wv.normalized() if normalize else wv
        except ImportError:
            pass
    with open(path, "r", encoding="utf-8") as f:
        return read_word2vec(f, normalize, report_fn, chunk_lines)


def write_word2vec(wv: WordVectors, sink: TextIO, header: bool = True) -> None:
    """Write word2vec text (round-trip helper for tests and the CLI)."""
    if header:
        sink.write(f"{len(wv)} {wv.dimension}\n")
    for key, row in zip(wv.keys, wv.vectors):
        sink.write(str(key))
        sink.write(" ")
        sink.write(" ".join(repr(float(v)) for v in row))
        sink.write("\n")
