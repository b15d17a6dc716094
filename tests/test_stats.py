import numpy as np
import pytest

from gulon_tpu.ops.stats import SummaryStats


@pytest.mark.parametrize("seed", range(5))
def test_merge_matches_two_pass(seed):
    rng = np.random.default_rng(seed)
    xs = rng.normal(size=rng.integers(1, 500)).astype(np.float64)
    split = rng.integers(0, len(xs) + 1)
    merged = SummaryStats.of(xs[:split]) + SummaryStats.of(xs[split:])
    assert merged.count == len(xs)
    assert merged.mean == pytest.approx(xs.mean(), rel=1e-9, abs=1e-12)
    assert merged.variance == pytest.approx(xs.var(), rel=1e-7, abs=1e-12)


def test_merge_associative_and_identity():
    rng = np.random.default_rng(42)
    a = SummaryStats.of(rng.normal(size=10))
    b = SummaryStats.of(rng.normal(size=20))
    c = SummaryStats.of(rng.normal(size=5))
    left = (a + b) + c
    right = a + (b + c)
    assert left.count == right.count
    assert left.mean == pytest.approx(right.mean)
    assert left.m2 == pytest.approx(right.m2)
    z = SummaryStats.zero()
    assert (a + z) == a and (z + a) == a


def test_welford_update_matches_batch():
    rng = np.random.default_rng(7)
    xs = rng.normal(size=100)
    s = SummaryStats.zero()
    for x in xs:
        s = s.update(float(x))
    ref = SummaryStats.of(xs)
    assert s.count == ref.count
    assert s.mean == pytest.approx(ref.mean)
    assert s.variance == pytest.approx(ref.variance, rel=1e-8)
