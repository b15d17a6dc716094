import numpy as np
import pytest

from gulon_tpu.ops.topk import merge_topk, smallest_k


@pytest.mark.parametrize("seed", range(5))
def test_smallest_k_matches_sort(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 200))
    k = int(rng.integers(1, n + 1))
    d = rng.normal(size=(3, n)).astype(np.float32)
    vals, idx = smallest_k(d, k)
    expected = np.sort(d, axis=-1)[:, :k]
    np.testing.assert_allclose(np.asarray(vals), expected, rtol=1e-6)
    np.testing.assert_allclose(
        np.take_along_axis(d, np.asarray(idx), axis=-1), expected, rtol=1e-6
    )


def test_merge_topk_equals_flat_sort():
    rng = np.random.default_rng(1)
    da = rng.normal(size=(4, 8)).astype(np.float32)
    db = rng.normal(size=(4, 6)).astype(np.float32)
    ia = np.arange(8)[None, :].repeat(4, 0).astype(np.int32)
    ib = (100 + np.arange(6))[None, :].repeat(4, 0).astype(np.int32)
    vals, ids = merge_topk(da, ia, db, ib, 5)
    allv = np.concatenate([da, db], axis=1)
    expected = np.sort(allv, axis=1)[:, :5]
    np.testing.assert_allclose(np.asarray(vals), expected, rtol=1e-6)
    # ids must point at the right values
    alli = np.concatenate([ia, ib], axis=1)
    for r in range(4):
        lookup = dict(zip(alli[r], allv[r]))
        np.testing.assert_allclose(
            [lookup[i] for i in np.asarray(ids)[r]], expected[r], rtol=1e-6
        )
