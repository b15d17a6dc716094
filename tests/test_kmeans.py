import numpy as np
import pytest

from generators import planted_clusters
from gulon_tpu.ops.distance import nearest, pairwise_sqdist
from gulon_tpu.ops.kmeans import (
    KMeansConfig,
    fit_kmeans,
    kmeans_objective,
    lloyd_step,
)


def _objective(x, c, a):
    return float(np.mean(np.sum((x - np.asarray(c)[np.asarray(a)]) ** 2, -1)))


@pytest.mark.parametrize("seed", range(3))
def test_objective_monotone_nonincreasing(seed):
    """Lloyd objective never increases (ref KMeansSpec property)."""
    rng = np.random.default_rng(seed)
    x, _, _ = planted_clusters(rng, 400, 8, 5, scale=0.3)
    c = x[rng.choice(len(x), size=6, replace=False)]
    a = np.asarray(nearest(x, c))
    prev = _objective(x, c, a)
    for _ in range(5):
        c, a = lloyd_step(x, c, block_rows=128)
        cur = _objective(x, np.asarray(c), np.asarray(a))
        assert cur <= prev + 1e-4
        prev = cur


def test_converges_and_recovers_planted_clusters():
    rng = np.random.default_rng(0)
    x, true_c, labels = planted_clusters(rng, 600, 6, 4, scale=0.02, spread=3.0)
    res = fit_kmeans(x, KMeansConfig(k=4, max_iters=50, seed=1, block_rows=256))
    assert bool(res.converged)
    assert int(res.iterations) < 50
    # Objective close to the planted noise floor.
    obj = float(kmeans_objective(x, res.centroids, res.assignments))
    assert obj < 0.02 ** 2 * 6 * 10


def test_stacked_training_matches_individual():
    """Stacked [m,n,d] training == per-slice training (same seeds)."""
    rng = np.random.default_rng(3)
    xs = np.stack(
        [planted_clusters(rng, 200, 4, 3, scale=0.1)[0] for _ in range(3)]
    )
    res = fit_kmeans(xs, KMeansConfig(k=3, max_iters=30, seed=5, block_rows=64))
    assert res.centroids.shape == (3, 3, 4)
    assert res.assignments.shape == (3, 200)
    # Every subspace's result is a valid local optimum: assignment of each
    # point is its nearest centroid.
    for s in range(3):
        d = np.asarray(pairwise_sqdist(xs[s], res.centroids[s]))
        np.testing.assert_array_equal(
            d.argmin(axis=1), np.asarray(res.assignments[s])
        )


def test_empty_clusters_become_zero():
    """Empty cluster -> zero centroid (ref KMeans.scala:198-226 semantics)."""
    x = np.array([[1.0, 1.0], [1.1, 1.0], [0.9, 1.0]], np.float32)
    from gulon_tpu.ops.kmeans import _update_blocked

    a = np.array([0, 0, 0], np.int32)
    c = np.asarray(_update_blocked(x, a, 3, 2))
    np.testing.assert_allclose(c[0], x.mean(0), rtol=1e-6)
    np.testing.assert_array_equal(c[1], 0)
    np.testing.assert_array_equal(c[2], 0)


def test_blocked_assignment_matches_unblocked():
    rng = np.random.default_rng(9)
    x, c, _ = planted_clusters(rng, 333, 7, 9, scale=0.5)
    from gulon_tpu.ops.kmeans import _assign_blocked

    a1 = np.asarray(_assign_blocked(x, c, 50))
    a2 = np.asarray(_assign_blocked(x, c, 1000))
    np.testing.assert_array_equal(a1, a2)


def test_degenerate_identical_init_still_improves():
    """All centroids initialized to the same point: the trajectory must
    still be monotone non-increasing (ref KMeansSpec:59-72)."""
    import jax.numpy as jnp
    from gulon_tpu.ops.kmeans import (
        _fit_stacked,
        kmeans_objective,
    )

    rng = np.random.default_rng(9)
    x = rng.normal(size=(300, 6)).astype(np.float32)
    init = np.tile(x[0], (8, 1))[None]  # [1, 8, 6], all identical
    res = _fit_stacked(
        jnp.asarray(x)[None],
        jnp.asarray(init),
        k=8,
        max_iters=12,
        block_rows=128,
    )
    c = np.asarray(res.centroids)[0]
    a = np.asarray(res.assignments)[0]
    o_end = float(kmeans_objective(x, c, a))
    o_init = float(
        kmeans_objective(x, init[0], np.zeros(len(x), np.int32))
    )
    assert o_end <= o_init + 1e-5


def test_report_slots_isolate_concurrent_builds():
    """Slot registry: overlapping builds get distinct slots; release frees."""
    from gulon_tpu.ops import kmeans as km

    a = km._acquire_report_slot(lambda *args: None)
    b = km._acquire_report_slot(lambda *args: None)
    assert a != b
    km._release_report_slot(a)
    c = km._acquire_report_slot(lambda *args: None)
    assert c == a  # freed slots are reused (stable jit cache keys)
    km._release_report_slot(b)
    km._release_report_slot(c)
    assert not km._REPORT_SLOTS


def test_kmeanspp_init_rows_and_determinism():
    """kmeans++ seeds are actual data rows; same seed => same centroids."""
    from gulon_tpu.ops.kmeans import init_centroids_pp

    x, _, _ = planted_clusters(np.random.default_rng(5), 400, 8, 12)
    xs = np.asarray(x)[None]  # [1, n, d]
    c1 = np.asarray(init_centroids_pp(xs, 12, seed=3))[0]
    c2 = np.asarray(init_centroids_pp(xs, 12, seed=3))[0]
    assert np.array_equal(c1, c2)
    # every centroid is some data row
    for row in c1:
        assert np.any(np.all(np.isclose(xs[0], row), axis=1))
    # distinct seeds draw differently
    c3 = np.asarray(init_centroids_pp(xs, 12, seed=4))[0]
    assert not np.array_equal(c1, c3)


def test_kmeanspp_beats_or_ties_uniform_on_planted():
    """On a planted mixture, kmeans++ ends at an objective <= uniform
    sampling's (same seed, same iteration budget)."""
    x, _, _ = planted_clusters(np.random.default_rng(11), 1200, 10, 16)
    res_u = fit_kmeans(x, KMeansConfig(k=16, max_iters=12, seed=0))
    res_pp = fit_kmeans(
        x, KMeansConfig(k=16, max_iters=12, seed=0, init="kmeans++")
    )
    o_u = _objective(x, res_u.centroids, res_u.assignments)
    o_pp = _objective(x, res_pp.centroids, res_pp.assignments)
    assert o_pp <= o_u * 1.05, (o_pp, o_u)


def test_kmeanspp_duplicate_rows_no_nan():
    """All-duplicate input: the D^2 distribution is all-zero after the
    first pick; the fallback keeps sampling uniform instead of NaN-ing."""
    from gulon_tpu.ops.kmeans import init_centroids_pp

    xs = np.ones((1, 64, 4), np.float32)
    c = np.asarray(init_centroids_pp(xs, 8, seed=0))[0]
    assert np.all(np.isfinite(c)) and np.allclose(c, 1.0)


def test_unknown_init_raises():
    x = np.zeros((32, 4), np.float32)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        fit_kmeans(x, KMeansConfig(k=4, max_iters=2, init="bogus"))


def test_report_carries_step_distribution():
    """The per-iteration report delivers the centroid-movement
    DISTRIBUTION (mean/std/min/max — the reference's SummaryStats,
    KMeans.scala:119-127,160-168) to 6-arg/varargs callbacks, and the
    legacy 3-positional form to older callbacks."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(800, 8)).astype(np.float32)

    full, legacy = [], []

    def full_cb(it, mean, conv, std, mn, mx):
        full.append((float(it), float(mean), float(std), float(mn),
                     float(mx)))

    def legacy_cb(it, mean, conv):
        legacy.append(float(mean))

    from gulon_tpu.ops.kmeans import KMeansConfig, fit_kmeans

    fit_kmeans(x, KMeansConfig(k=8, max_iters=6), report_fn=full_cb)
    fit_kmeans(x, KMeansConfig(k=8, max_iters=6), report_fn=legacy_cb)
    assert len(full) >= 1 and len(legacy) >= 1
    for it, mean, std, mn, mx in full:
        assert mn <= mean <= mx
        assert std >= 0
    # before convergence the centroids genuinely spread in movement
    assert any(s > 0 for _, _, s, _, _ in full[:2])
