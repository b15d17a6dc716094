"""Progress/formatting units (ref CommandUtils formatters + bar) and a few
small API surfaces (warmup, lloyd_step)."""

import io

import numpy as np
import pytest

from gulon_tpu.utils.progress import (
    Reporter,
    format_bytes,
    format_duration,
    render_bar,
)


def test_format_bytes():
    assert format_bytes(512) == "512.0B"
    assert format_bytes(2048) == "2.0KiB"
    assert format_bytes(5 * 1024**2) == "5.0MiB"
    assert format_bytes(3.5 * 1024**3) == "3.5GiB"


def test_format_duration():
    assert format_duration(5e-7).endswith("us")
    assert format_duration(0.25) == "250ms"
    assert format_duration(12.34) == "12.3s"
    assert format_duration(125) == "2m5s"
    assert format_duration(7300) == "2h1m"


def test_render_bar():
    assert render_bar(0.0) == "[                    ]   0%"
    assert render_bar(1.0) == "[====================] 100%"
    half = render_bar(0.5)
    assert half.startswith("[=========>") and half.endswith(" 50%")
    # clamped
    assert render_bar(1.5) == render_bar(1.0)
    assert render_bar(-0.2) == render_bar(0.0)


def test_reporter_task_success_and_error():
    buf = io.StringIO()
    rep = Reporter(out=buf, force=True)
    with rep.task("stage-one"):
        pass
    with pytest.raises(RuntimeError):
        with rep.task("stage-two"):
            raise RuntimeError("boom")
    out = buf.getvalue()
    assert "SUCCESS" in out and "stage-one" in out
    assert "ERROR" in out and "stage-two" in out and "boom" in out


def test_reporter_silent_without_tty():
    buf = io.StringIO()
    rep = Reporter(out=buf)  # not a tty, not forced
    rep.progress("x", 0.5)
    assert buf.getvalue() == ""  # progress suppressed
    rep.success("x", 1.0)
    assert "SUCCESS" in buf.getvalue()  # terminal lines still print


def test_lloyd_step_and_objective():
    from gulon_tpu.ops.kmeans import kmeans_objective, lloyd_step

    rng = np.random.default_rng(0)
    x = rng.normal(size=(400, 8)).astype(np.float32)
    c0 = x[:8]
    import jax.numpy as jnp

    c1, a1 = lloyd_step(jnp.asarray(x), jnp.asarray(c0))
    o0 = float(kmeans_objective(x, c0, np.asarray(a1)))
    c2, a2 = lloyd_step(jnp.asarray(x), c1)
    o1 = float(kmeans_objective(x, np.asarray(c1), np.asarray(a2)))
    assert o1 <= o0 + 1e-5  # Lloyd monotonicity across the bench unit


def test_warmup_precompiles():
    from generators import planted_clusters, random_keys
    from gulon_tpu.models.build import build_flat_index
    from gulon_tpu.ops.pq import PQConfig

    rng = np.random.default_rng(1)
    x, _, _ = planted_clusters(rng, 400, 8, 4)
    index = build_flat_index(
        random_keys(rng, 400), x,
        pq_config=PQConfig(num_clusters=8, num_quantizers=2, max_iters=5),
    )
    index.warmup(k=5, batch_sizes=(1, 8))  # no crash, both shapes compiled
    res = index.batch_query(5, x[:8])
    assert len(res) == 8
