"""Probe-limit auto-tuning (``utils/tune.py``) — an extra over the
reference's operator-chosen ``--limit`` (``BuildIndex.scala:45,104-105``)."""

import numpy as np
import pytest

from generators import planted_clusters, random_keys
from gulon_tpu.models.build import build_flat_index, build_ivf_index
from gulon_tpu.models.ivf import LimitGroups, LimitVectors
from gulon_tpu.ops.pq import PQConfig
from gulon_tpu.utils.eval import recall_of, sample_ground_truth
from gulon_tpu.utils.tune import tune_probe_limit

_PQ = PQConfig(num_clusters=32, num_quantizers=8, max_iters=15, block_rows=128)


@pytest.fixture(scope="module")
def ivf_setup():
    rng = np.random.default_rng(55)
    n, d = 4000, 24
    x, _, _ = planted_clusters(rng, n, d, 20, scale=0.15)
    keys = random_keys(rng, n)
    index = build_ivf_index(
        keys, x, pq_config=_PQ,
        num_partitions=20, strategy=LimitGroups(3),
    )
    return index, keys, x


def _recall_at_limit(index, keys, x, limit, k=10):
    import dataclasses

    truth = sample_ground_truth(keys, x, num_samples=64, ks=(k,))
    trial = dataclasses.replace(index, strategy=LimitGroups(limit))
    return float(recall_of(trial, truth, x, keys)[k].mean)


def test_tune_meets_target_minimally(ivf_setup):
    index, keys, x = ivf_setup
    # pick an attainable target: 90% of the exhaustive-probe recall
    r_full = _recall_at_limit(index, keys, x, index.num_partitions)
    target = 0.9 * r_full
    result = tune_probe_limit(
        index, x, keys, target_recall=target, k=10, num_samples=64,
    )
    assert result.met
    assert result.achieved_recall >= target
    assert 1 <= result.limit <= index.num_partitions
    assert isinstance(result.index.strategy, LimitGroups)
    assert result.index.strategy.count == result.limit
    # minimality: one probe fewer misses the target
    if result.limit > 1:
        r_below = _recall_at_limit(index, keys, x, result.limit - 1)
        assert r_below < target
    # the input index is untouched (functional)
    assert index.strategy.count == 3


def test_tune_limit_vectors_kind(ivf_setup):
    index, keys, x = ivf_setup
    import dataclasses

    lv_index = dataclasses.replace(index, strategy=LimitVectors(500))
    r_full = _recall_at_limit(index, keys, x, index.num_partitions)
    result = tune_probe_limit(
        lv_index, x, keys, target_recall=0.9 * r_full, k=10,
        num_samples=64,
    )
    assert result.met
    assert isinstance(result.index.strategy, LimitVectors)
    assert 10 <= result.limit <= index.size


def test_tune_unreachable_target_is_flagged(ivf_setup):
    index, keys, x = ivf_setup
    result = tune_probe_limit(
        index, x, keys, target_recall=1.0, k=500, num_samples=64,
    )
    # recall@500 == 1.0 needs the codes to rank half the corpus perfectly;
    # at 8B codes it cannot — the result reports the ceiling honestly
    if not result.met:
        assert result.limit == index.num_partitions
        assert result.achieved_recall < 1.0


def test_tune_rejects_non_ivf(ivf_setup):
    _, keys, x = ivf_setup
    flat = build_flat_index(keys[:500], x[:500], pq_config=_PQ)
    with pytest.raises(ValueError):
        tune_probe_limit(flat, x[:500], keys[:500])
    with pytest.raises(ValueError):
        tune_probe_limit(
            ivf_setup[0], x, keys, target_recall=1.5
        )
