"""Shared benchmark plumbing: synthetic corpora + tunnel-safe timing.

Timing: ``jax.block_until_ready`` does not reliably block through the
remote-TPU tunnel used in this environment and a host readback costs
~10-25 ms RTT, so steady-state cost is measured by iterating the op
device-side inside one jitted ``fori_loop`` (data-dependency chained) and
differencing two iteration counts — the RTT and dispatch constants cancel.
"""

from __future__ import annotations

import functools
import time
from typing import Callable

import numpy as np


def low_rank_corpus_device(
    seed: int,
    n: int,
    d: int,
    intrinsic: int = 16,
    n_clusters: int = 1000,
    noise: float = 0.05,
):
    """Device-side corpus generation (host->device is ~11 MB/s through the
    remote-TPU tunnel here; generating multi-GB corpora on device avoids it).
    """
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n", "d", "intrinsic", "n_clusters"))
    def gen(key, n, d, intrinsic, n_clusters):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        basis = jax.random.normal(k1, (intrinsic, d), jnp.float32)
        centers = jax.random.normal(k2, (n_clusters, intrinsic), jnp.float32)
        labels = jax.random.randint(k3, (n,), 0, n_clusters)
        z = centers[labels] + 0.3 * jax.random.normal(
            k4, (n, intrinsic), jnp.float32
        )
        x = z @ basis / jnp.sqrt(jnp.float32(intrinsic))
        return x + noise * jax.random.normal(
            jax.random.fold_in(key, 9), (n, d), jnp.float32
        )

    return gen(jax.random.key(seed), n, d, intrinsic, n_clusters)


def time_device_loop(step_fn: Callable, carry_probe: Callable, iters: int = 16):
    """Per-iteration seconds of ``step_fn`` via the two-point method.

    ``step_fn(acc) -> acc'`` must consume and produce a scalar so iterations
    chain; ``carry_probe(result) -> float`` forces the readback.
    """
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(n):
        def body(i, acc):
            return step_fn(acc)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    carry_probe(loop(iters))  # compile
    carry_probe(loop(1))

    def timed(n):
        t0 = time.perf_counter()
        carry_probe(loop(n))
        return time.perf_counter() - t0

    # each readback carries ~10-25 ms of tunnel RTT with tens-of-ms
    # jitter. min-of-repeats taken INDEPENDENTLY on the two points can
    # cross (t_many_min < t_one_min) when the per-iter signal is thin —
    # observed as a 0.0 ms "measurement" for a ~1.8 ms step at iters=16.
    # Pair the points and take the median of the differenced estimates
    # instead (same estimator bench.py's headline uses): the median is
    # robust to one slow round trip without the min's downward bias.
    estimates = []
    for _ in range(5):
        t_many = timed(iters)
        t_one = timed(1)
        estimates.append((t_many - t_one) / (iters - 1))
    return max(float(np.median(estimates)), 1e-9)


def dist_recall_fn(x, queries, exact_ids, k: int = 10, eps: float = 1e-6):
    """Distance-cutoff recall@k closure (the reference's own protocol,
    ``Tests.scala:22-40``): a returned id counts iff its TRUE distance to
    the query is within the true k-th distance (cutoff slack ``eps``).
    Id-set recall is arbitrary under PQ code ties — low-intrinsic corpora
    collapse thousands of rows onto identical codes/distances.

    ``x``/``queries`` stay device-side (the gathers run on the TPU; only
    [Q, k] results come back). Returns ``recall(ids) -> float``; the one
    definition shared by bench.py and benchmarks/run.py so the reported
    dist_recall numbers stay comparable across configs.
    """
    import jax.numpy as jnp

    q = jnp.asarray(queries)
    nq = int(q.shape[0])

    def _true_d(ids):
        rows = jnp.take(
            x, jnp.asarray(np.maximum(np.asarray(ids), 0)).reshape(-1),
            axis=0,
        ).reshape(nq, k, -1)
        return np.asarray(jnp.sum((rows - q[:, None, :]) ** 2, axis=-1))

    cutoff = _true_d(exact_ids)[:, -1] * (1 + eps)

    def recall(ids) -> float:
        dd = np.where(np.asarray(ids) >= 0, _true_d(ids), np.inf)
        return float((dd <= cutoff[:, None]).mean())

    return recall


def idset_recall(approx_ids: np.ndarray, exact_ids: np.ndarray, k: int) -> float:
    """Mean |approx ∩ exact| / k over queries (standard ANN recall@k)."""
    return float(
        np.mean(
            [
                len(set(approx_ids[q][:k]) & set(exact_ids[q][:k])) / k
                for q in range(len(approx_ids))
            ]
        )
    )


def time_device_loop_args(
    step_fn: Callable, operands: tuple, iters: int = 16
):
    """Like :func:`time_device_loop` but the big arrays are jit ARGUMENTS.

    A closure capture would embed them as HLO constants — the remote
    tunnel compiler then receives the whole corpus in the compile request
    (observed: 25-minute compiles ending in HTTP 413 / broken pipe).
    ``step_fn(acc, *operands) -> acc'`` must chain a scalar.
    """
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n_it",))
    def loop(n_it, *ops):
        def body(i, acc):
            return step_fn(acc, *ops)

        return jax.lax.fori_loop(0, n_it, body, jnp.float32(0.0))

    float(loop(iters, *operands))
    float(loop(1, *operands))

    def timed(n):
        t0 = time.perf_counter()
        float(loop(n, *operands))
        return time.perf_counter() - t0

    # paired-difference median, same estimator as time_device_loop: two
    # independent min-of-5 points can cross under tunnel RTT jitter when
    # the per-iter signal is thin, clamping the difference to 0
    estimates = []
    for _ in range(5):
        t_many = timed(iters)
        t_one = timed(1)
        estimates.append((t_many - t_one) / (iters - 1))
    return max(float(np.median(estimates)), 1e-9)


def time_direct(run_fn: Callable, reps: int = 8):
    """Median per-call seconds of ``run_fn(i) -> (dists, ids)`` minus the
    measured tunnel RTT. Coarser than :func:`time_device_loop` but does not
    require compiling a wrapper loop (which can dominate for huge operands).
    """
    import jax
    import jax.numpy as jnp
    import time as _t

    d0, _ = run_fn(0)
    _ = np.asarray(d0[:1, :1])  # compile + settle
    tiny = jax.jit(lambda a: jnp.sum(a[:1, :1]))
    float(tiny(d0))
    rtt = float(
        np.median(
            [
                (lambda t0: (float(tiny(d0)), _t.perf_counter() - t0)[1])(
                    _t.perf_counter()
                )
                for _ in range(10)
            ]
        )
    )
    ts = []
    for i in range(reps):
        t0 = _t.perf_counter()
        dd, _ii = run_fn(i + 1)
        _ = np.asarray(dd[:1, :1])
        ts.append(_t.perf_counter() - t0)
    return max(float(np.median(ts)) - rtt, 1e-9)
