"""Recall@k evaluation harness.

Counterpart of reference ``Tests.scala``: ground truth is built by sampling
queries *from the indexed vectors themselves* (seed 0, 1000 samples —
``Tests.scala:76-87``) and recording, per k, the exact k-th-nearest distance
via brute force (``Tests.scala:89-97``). Recall@k of an index is measured by
the *distance-cutoff* definition (``Tests.scala:22-40``): a returned
neighbour counts iff its EXACT distance to the query is within
``(sqrt(true_kth_dist_sq) * (1 + eps))^2`` — robust to ties and duplicate
vectors, unlike id-set intersection.

TPU-native redesign: the reference evaluates per query on a thread pool
(``Tests.scala:109-122``); here ground truth is one batched ``exact_scan``
and the index side is one ``batch_query``, so the whole protocol is a few
device launches.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

from gulon_tpu.models.index import Index
from gulon_tpu.ops.scan import exact_scan
from gulon_tpu.ops.stats import SummaryStats

# ``Tests.scala:53``
DEFAULT_KS: Tuple[int, ...] = (1, 2, 3, 5, 10, 25, 50, 100, 500, 1000)


@dataclasses.dataclass(frozen=True)
class GroundTruth:
    """Sampled queries + their exact k-th-nearest squared distances."""

    queries: np.ndarray  # [Q, D] f32
    query_keys: np.ndarray  # [Q] object — the sampled words
    kth_distances: Dict[int, np.ndarray]  # k -> [Q] f32 squared L2
    ks: Tuple[int, ...]


@dataclasses.dataclass(frozen=True)
class EvalProgress:
    """Mirrors ``Tests.ProgressReport`` (``Tests.scala:55-74``)."""

    completed: int
    total: int
    qps: float


def _normalized(vectors: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(vectors, axis=1, keepdims=True)
    safe = np.where(norms > 0, norms, 1.0)
    return np.where(norms > 0, vectors / safe, vectors)


def ground_truth_for_queries(
    queries: np.ndarray,
    vectors: np.ndarray,
    ks: Sequence[int] = DEFAULT_KS,
    normalize: bool = False,
    query_keys: Optional[Sequence[str]] = None,
) -> GroundTruth:
    """Build ground truth for an explicit query set (``Tests.forQueries``,
    ``Tests.scala:100-107``).

    ``ks`` entries larger than the corpus are dropped. ``normalize``
    applies the Cosine transform to BOTH sides (the ingest transform on
    the corpus and the query-time transform of ``Index.scala:267-269``),
    so the truth matches what a cosine index actually ranks.
    """
    vectors = np.asarray(vectors, np.float32)
    queries = np.asarray(queries, np.float32)
    n = len(vectors)
    if normalize:
        vectors = _normalized(vectors)
        queries = _normalized(queries)
    ks = tuple(k for k in ks if k <= n)
    if not ks:
        raise ValueError("corpus smaller than every requested k")
    max_k = max(ks)
    _, ids = exact_scan(queries, vectors, k=max_k)
    ids = np.asarray(ids)
    # k-th distances recomputed in the DIRECT sum((a-b)^2) form: the scan's
    # matmul formulation carries ~1e-6 cancellation noise (can even go
    # negative at d=0), while the reference's protocol relies on
    # MathUtils.distanceSq being exactly 0 for identical vectors — the
    # recall cutoff and the per-result recompute must agree at d=0.
    kth = {
        k: ((vectors[ids[:, k - 1]] - queries) ** 2)
        .sum(axis=1)
        .astype(np.float32)
        for k in ks
    }
    if query_keys is None:
        query_keys = np.array(
            [f"query{i}" for i in range(len(queries))], dtype=object
        )
    return GroundTruth(
        queries=queries,
        query_keys=np.asarray(query_keys, dtype=object),
        kth_distances=kth,
        ks=ks,
    )


def sample_ground_truth(
    keys: Sequence[str],
    vectors: np.ndarray,
    num_samples: int = 1000,
    seed: int = 0,
    ks: Sequence[int] = DEFAULT_KS,
    normalize: bool = False,
) -> GroundTruth:
    """Build ground truth from self-queries (``Tests.sample``).

    ``ks`` entries larger than the corpus are dropped, and queries are drawn
    without replacement from the indexed vectors (seed-deterministic).
    ``normalize`` applies the Cosine ingest transform so the truth matches
    what a cosine index scans.
    """
    vectors = np.asarray(vectors, np.float32)
    keys = np.asarray(keys, dtype=object)
    n = len(vectors)
    if normalize:
        vectors = _normalized(vectors)
    rng = np.random.default_rng(seed)
    num_samples = min(num_samples, n)
    idx = rng.choice(n, size=num_samples, replace=False)
    # queries are already ingest-normalized rows; normalize=False below
    # keeps them bit-identical to the corpus rows they were drawn from
    return ground_truth_for_queries(
        vectors[idx], vectors, ks=ks, normalize=False, query_keys=keys[idx]
    )


def recall_of(
    index: Index,
    truth: GroundTruth,
    true_vectors: np.ndarray,
    true_keys: Sequence[str],
    epsilon: float = 0.0,
    report_fn: Optional[Callable[[EvalProgress], None]] = None,
    batch_size: int = 256,
) -> Dict[int, SummaryStats]:
    """Recall@k of ``index`` against ``truth`` (``Tests#recallOf``).

    ``true_vectors``/``true_keys`` are the exact source vectors (the
    reference looks returned words up in the original word-vector file,
    ``Tests.scala:25-31``). For Cosine indices pass the normalized vectors
    (ingest-side transform), matching what the reference stores.
    """
    true_vectors = np.asarray(true_vectors, np.float32)
    max_k = max(truth.ks)
    q_total = len(truth.queries)
    per_k: Dict[int, SummaryStats] = {k: SummaryStats() for k in truth.ks}

    # Map index rows -> evaluation rows ONCE (by key), so per-batch work is
    # pure array indexing via ``query_arrays`` — no host Result assembly, no
    # per-result string lookups (the reference does the string lookup per
    # returned word, Tests.scala:25-31; one upfront pass is equivalent).
    key_to_row = {k: i for i, k in enumerate(true_keys)}
    index_keys = np.asarray(index.key_index.keys, dtype=object)
    try:
        idx_to_eval = np.fromiter(
            (key_to_row[w] for w in index_keys),
            np.int64,
            count=len(index_keys),
        )
    except KeyError as e:
        raise ValueError(
            f"index contains key {e.args[0]!r} that is not present "
            "in the evaluation vectors — the index was built from a "
            "different corpus than --vectors"
        ) from None

    start = time.monotonic()
    done = 0
    # vectorized sub-batch bound: the gathered [q, max_k, D] difference
    # tensor (kept in the direct sum((a-b)^2) form so d=0 stays exactly 0,
    # see ground_truth_for_queries) is capped at ~20M f32 elements
    d = true_vectors.shape[1]
    sub = max(1, int(2e7) // max(max_k * d, 1))
    for b0 in range(0, q_total, batch_size):
        qb = truth.queries[b0 : b0 + batch_size]
        _, ids = index.query_arrays(max_k, qb)
        ids = np.asarray(ids)
        for s0 in range(0, len(qb), sub):
            qs = qb[s0 : s0 + sub]
            ids_s = ids[s0 : s0 + sub]
            nq = len(qs)
            valid = ids_s >= 0  # -1 = padding (k wider than coverage)
            rows = idx_to_eval[np.where(valid, ids_s, 0)]
            diffs = (
                true_vectors[rows.reshape(-1)].reshape(nq, max_k, d)
                - qs[:, None, :]
            )
            exact = np.where(
                valid, (diffs ** 2).sum(axis=2), np.inf
            )  # [nq, max_k]
            for k in truth.ks:
                true_kth = truth.kth_distances[k][b0 + s0 : b0 + s0 + nq]
                # cutoff = (sqrt(d_k) * (1+eps))^2  (``Tests.scala:33-35``)
                cutoff = true_kth * (1.0 + epsilon) ** 2
                hits = (exact[:, :k] <= cutoff[:, None]).sum(axis=1)
                per_k[k] = per_k[k] + SummaryStats.of(hits / k)
        done += len(qb)
        if report_fn is not None:
            elapsed = max(time.monotonic() - start, 1e-9)
            report_fn(EvalProgress(done, q_total, done / elapsed))
    return per_k


def format_recall(per_k: Dict[int, SummaryStats]) -> str:
    """``R@k: mean +/- stdDev`` lines (``Test.scala:39-43``)."""
    lines = []
    for k in sorted(per_k):
        s = per_k[k]
        lines.append(f"R@{k}: {s.mean:.4f} +/- {s.stddev:.4f}")
    return "\n".join(lines)
