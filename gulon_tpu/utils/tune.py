"""Probe-limit auto-tuning for partitioned indices.

The reference leaves the IVF probe limit to the operator (``--limit``,
default ``max(5% of partitions, 5)``, ``BuildIndex.scala:45,104-105``) with
no feedback loop. This extra closes the loop: given a recall target, find
the SMALLEST probe limit that meets it on sampled self-queries, using the
reference's own distance-cutoff recall protocol (``Tests.scala:22-40``,
``utils/eval.py``). Recall is monotone non-decreasing in the probe limit
(probing more partitions only adds candidates), so a binary search over the
limit needs O(log P) recall evaluations, each one batched device sweep.

Returns a NEW index (JAX value semantics) with the tuned strategy; the
expensive lazy serving layouts are shared with the input index (they do not
depend on the probe strategy).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import numpy as np

from gulon_tpu.models.ivf import IVFIndex, LimitGroups, LimitVectors
from gulon_tpu.utils.eval import recall_of, sample_ground_truth


@dataclasses.dataclass(frozen=True)
class TuneResult:
    index: IVFIndex          # strategy replaced with the tuned limit
    limit: int               # the chosen probe limit
    achieved_recall: float   # measured recall@k at the chosen limit
    target_recall: float
    k: int
    evaluations: int         # recall sweeps the search spent
    met: bool                # False: even the maximum limit fell short


def tune_probe_limit(
    index: IVFIndex,
    vectors,
    keys: Sequence[str],
    *,
    target_recall: float = 0.9,
    k: int = 10,
    num_samples: int = 256,
    seed: int = 0,
    epsilon: float = 0.0,
    report_fn: Optional[Callable[[int, int, float], None]] = None,
) -> TuneResult:
    """Binary-search the smallest probe limit meeting ``target_recall``.

    ``vectors``/``keys`` are the original corpus (the recall protocol needs
    exact distances, which codes alone cannot provide — same requirement as
    ``gulon-tpu test``). The tuned knob matches the index's strategy kind:
    ``LimitGroups`` tunes partitions probed (1..P), ``LimitVectors`` tunes
    candidate rows covered (k..N). ``report_fn(limit, evals, recall)`` is
    called after each evaluation.
    """
    if not isinstance(index, IVFIndex):
        raise ValueError(
            f"tune_probe_limit needs a partitioned (IVF) index, got "
            f"{type(index).__name__}"
        )
    if not 0.0 < target_recall <= 1.0:
        raise ValueError(f"target_recall must be in (0, 1], got {target_recall}")
    x = np.asarray(vectors, np.float32)
    keys = np.asarray(keys, dtype=object)
    if index.metric.normalized:
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        x = np.where(norms > 0, x / np.where(norms > 0, norms, 1.0), x)
    truth = sample_ground_truth(
        keys, x, num_samples=num_samples, seed=seed, ks=(k,)
    )

    if isinstance(index.strategy, LimitVectors):
        lo, hi = k, index.size
        make = LimitVectors
    else:
        lo, hi = 1, index.num_partitions
        make = LimitGroups

    # Warm the strategy-independent lazy serving layouts ONCE on the input
    # index; ``dataclasses.replace`` then shares the built fields with
    # every trial. Without this each trial starts from the fresh-load None
    # fields, rebuilds the full-corpus device relayout on its first query
    # and discards it — ~1+log2(P) redundant rebuilds per tune.
    index.query_arrays(min(k, index.size), truth.queries[:1])

    evals = 0

    def recall_at(limit: int) -> float:
        nonlocal evals
        trial = dataclasses.replace(index, strategy=make(limit))
        per_k = recall_of(trial, truth, x, keys, epsilon=epsilon)
        evals += 1
        r = float(per_k[k].mean)
        if report_fn is not None:
            report_fn(limit, evals, r)
        return r

    r_hi = recall_at(hi)
    if r_hi < target_recall:
        # even exhaustive probing misses the target: a code-budget limit,
        # not a probe limit — return the best achievable, flagged
        return TuneResult(
            index=dataclasses.replace(index, strategy=make(hi)),
            limit=hi, achieved_recall=r_hi, target_recall=target_recall,
            k=k, evaluations=evals, met=False,
        )
    best, best_r = hi, r_hi
    while lo < hi:
        mid = (lo + hi) // 2
        r = recall_at(mid)
        if r >= target_recall:
            best, best_r = mid, r
            hi = mid
        else:
            lo = mid + 1
    return TuneResult(
        index=dataclasses.replace(index, strategy=make(best)),
        limit=best, achieved_recall=best_r, target_recall=target_recall,
        k=k, evaluations=evals, met=True,
    )
