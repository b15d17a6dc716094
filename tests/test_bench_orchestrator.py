"""bench.py parent-side unit tests: event draining, bookkeeping, and the
always-emit contract (no jax, no TPU — the parent is deliberately
jax-free so nothing can hang it)."""

import importlib.util
import json
import os
import sys

import numpy as np  # noqa: F401  (parity with suite imports)


def _load_bench():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_drain_apply_and_emit(tmp_path, capsys, monkeypatch):
    bench = _load_bench()
    monkeypatch.setenv("GULON_BENCH_CONFIGS", "glove100,kmeans,deep10m")
    orch = bench._Orchestrator()
    orch.results_path = str(tmp_path / "ev.jsonl")
    orch.full_results_path = str(tmp_path / "FULL.json")

    events = [
        {"event": "init", "device": "TPU v5 lite0", "t": 1.0},
        {"event": "start", "config": "glove100", "t": 2.0},
        {"event": "result", "config": "glove100",
         "data": {"us_per_query": 1.2, "qps_per_chip": 853333.0,
                  "index_build_s": 3.0, "program_load_s": 100.0}},
        {"event": "skip", "config": "kmeans",
         "reason": "insufficient budget (10s left, est 60s)"},
        {"event": "start", "config": "deep10m", "t": 5.0},
    ]
    with open(orch.results_path, "w") as f:
        for ev in events:
            f.write(json.dumps(ev) + "\n")
        f.write('{"event": "truncated"')  # incomplete line: must NOT drain

    for ev in orch.drain_events():
        orch.apply(ev)
    assert orch.device == "TPU v5 lite0"
    assert "glove100" in orch.completed
    assert orch.skipped["kmeans"].startswith("insufficient")
    assert "deep10m" in orch.started

    # the incomplete line stays buffered; completing it drains exactly it
    with open(orch.results_path, "a") as f:
        f.write(', "config": "x"}\n')
    more = orch.drain_events()
    assert [e.get("event") for e in more] == ["truncated"]

    # pending excludes completed/skipped; includes the started-but-unended
    assert [c[0] for c in orch.pending()] == ["deep10m"]

    orch.emit()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    payload = json.loads(out[0])
    # the stdout line must fit the driver's 2,000-char tail capture
    assert len(out[0]) <= 1500
    assert payload["value"] == 1.2
    assert payload["vs_baseline"] == round(5000.0 / 1.2, 1)
    assert payload["device"] == "TPU v5 lite0"
    assert set(payload["not_captured"]) == {"kmeans", "deep10m"}
    assert payload["full_results"] == os.path.relpath(
        orch.full_results_path, os.path.dirname(bench.__file__)
    )
    # the full per-config matrix goes to the repo file, not stdout
    full = json.load(open(orch.full_results_path))
    assert full["configs"]["kmeans"]["skipped"].startswith("insufficient")
    assert full["configs"]["deep10m"]["skipped"].startswith("killed")
    assert full["configs"]["glove100"]["us_per_query"] == 1.2
    # emit is once-only (signal handler + finally can both call it)
    orch.emit()
    assert capsys.readouterr().out == ""


def test_emit_without_headline_reports_error(tmp_path, capsys, monkeypatch):
    bench = _load_bench()
    monkeypatch.setenv("GULON_BENCH_CONFIGS", "glove100")
    orch = bench._Orchestrator()
    orch.results_path = str(tmp_path / "ev2.jsonl")
    orch.full_results_path = str(tmp_path / "FULL2.json")
    orch.errors.append("init: no jax init within 330s (tunnel hang?)")
    orch.emit()
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["value"] is None
    assert payload["vs_baseline"] is None
    assert "tunnel hang" in payload["error"]
    full = json.load(open(orch.full_results_path))
    assert full["configs"]["glove100"]["skipped"].startswith("deadline")


def test_restricted_plan_without_headline_is_not_an_error(
    tmp_path, capsys, monkeypatch
):
    bench = _load_bench()
    monkeypatch.setenv("GULON_BENCH_CONFIGS", "kmeans")
    orch = bench._Orchestrator()
    orch.results_path = str(tmp_path / "ev4.jsonl")
    orch.full_results_path = str(tmp_path / "FULL4.json")
    orch.apply({
        "event": "result", "config": "kmeans",
        "data": {"us_per_iteration": 20.0},
    })
    orch.emit()
    payload = json.loads(capsys.readouterr().out.strip())
    assert payload["value"] is None  # headline shape was never planned
    assert "error" not in payload  # ...so its absence is not an error
    assert payload["summary"]["kmeans_us_iter"] == 20.0
    full = json.load(open(orch.full_results_path))
    assert full["configs"]["kmeans"]["us_per_iteration"] == 20.0


def test_failure_bookkeeping_two_strikes(monkeypatch, tmp_path):
    bench = _load_bench()
    monkeypatch.setenv("GULON_BENCH_CONFIGS", "glove100,kmeans")
    orch = bench._Orchestrator()
    orch.results_path = str(tmp_path / "ev3.jsonl")
    orch.apply({"event": "error", "config": "glove100", "error": "boom"})
    assert [c[0] for c in orch.pending()] == ["glove100", "kmeans"]
    orch.apply({"event": "error", "config": "glove100", "error": "boom"})
    # two strikes: dropped from pending (the respawned child skips it)
    assert [c[0] for c in orch.pending()] == ["kmeans"]


def test_should_cpu_fallback_logic(monkeypatch, tmp_path):
    bench = _load_bench()
    monkeypatch.setenv("GULON_BENCH_CONFIGS", "glove100,kmeans")
    orch = bench._Orchestrator()
    orch.results_path = str(tmp_path / "ev5.jsonl")
    # nothing completed, kmeans planned, budget remains -> fallback
    assert orch.should_cpu_fallback()
    # anything completed -> no fallback
    orch.completed["glove100"] = {"us_per_query": 1.0}
    assert not orch.should_cpu_fallback()
    orch.completed.clear()
    # kmeans not in the plan -> no fallback
    monkeypatch.setenv("GULON_BENCH_CONFIGS", "glove100")
    assert not orch.should_cpu_fallback()
    monkeypatch.setenv("GULON_BENCH_CONFIGS", "glove100,kmeans")
    # budget exhausted -> no fallback
    orch.deadline = __import__("time").time() + 60
    assert not orch.should_cpu_fallback()


def test_maybe_cpu_fallback_applies_child_events(monkeypatch, tmp_path):
    bench = _load_bench()
    monkeypatch.setenv("GULON_BENCH_CONFIGS", "glove100,kmeans")
    orch = bench._Orchestrator()
    orch.results_path = str(tmp_path / "ev6.jsonl")
    orch.errors.append("init: no jax init within 330s (tunnel hang?)")
    orch.skipped["kmeans"] = "deadline: not attempted"
    calls = {}

    def fake_spawn(extra_args=()):
        calls["args"] = list(extra_args)
        with open(orch.results_path, "a") as f:
            f.write(json.dumps({
                "event": "result", "config": "kmeans",
                "data": {"us_per_iteration": 30.0, "cpu_fallback": True,
                         "device": "TFRT_CPU_0"},
            }) + "\n")
        return 0.0

    orch.spawn = fake_spawn
    orch.supervise_child = lambda t: "exit"
    orch.maybe_cpu_fallback()
    assert calls["args"] == ["--force-cpu", "--only", "kmeans"]
    assert orch.completed["kmeans"]["cpu_fallback"] is True


def test_child_force_cpu_only_kmeans(tmp_path):
    """Real child subprocess: --force-cpu --only kmeans produces exactly
    one honestly-labeled result event."""
    import subprocess
    import sys
    import time as _t

    bench_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    results = str(tmp_path / "ev7.jsonl")
    r = subprocess.run(
        [sys.executable, bench_path, "--child",
         "--results", results,
         "--deadline", repr(_t.time() + 240),
         "--force-cpu", "--only", "kmeans"],
        capture_output=True, text=True, timeout=220,
        # 8 chained Lloyd iterations instead of 512: the test checks the
        # orchestration contract (events, labels), not the measurement
        env={**os.environ, "GULON_BENCH_KMEANS_ITERS": "8"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    events = [json.loads(line) for line in open(results)]
    kinds = [e["event"] for e in events]
    assert kinds[0] == "init"
    results_ev = [e for e in events if e["event"] == "result"]
    assert [e["config"] for e in results_ev] == ["kmeans"]
    data = results_ev[0]["data"]
    assert data["cpu_fallback"] is True
    assert "CPU" in data["device"].upper()


def test_hang_ladder_reserves_fallback_headroom(monkeypatch, tmp_path):
    """In tunnel-down hang mode the retry ladder must stop while the CPU
    fallback still has headroom (attempt caps would otherwise eat the
    whole deadline and the emitted line would carry zero measurements)."""
    import time as _t

    bench = _load_bench()
    monkeypatch.setenv("GULON_BENCH_CONFIGS", "glove100,kmeans")
    monkeypatch.setenv("GULON_BENCH_DEADLINE_S", "900")
    orch = bench._Orchestrator()
    orch.results_path = str(tmp_path / "ev8.jsonl")

    timeline = {"now": orch.t_start}
    monkeypatch.setattr(bench.time, "time", lambda: timeline["now"])
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    spawns = []

    def fake_spawn(extra_args=()):
        spawns.append(list(extra_args))
        orch.attempts += 1  # the real spawn() counts attempts
        orch.child = type(
            "C", (), {"returncode": 3, "poll": lambda self: 3}
        )()
        return timeline["now"]

    def fake_supervise(spawned_at):
        if spawns[-1]:  # the fallback child: completes instantly
            with open(orch.results_path, "a") as f:
                f.write(json.dumps({
                    "event": "result", "config": "kmeans",
                    "data": {"us_per_iteration": 30.0,
                             "cpu_fallback": True},
                }) + "\n")
            timeline["now"] += 40
            return "exit"
        # a TPU attempt: hangs for the whole init cap, produces nothing
        timeline["now"] += bench.INIT_CAP_S
        orch.errors.append("init: no jax init (tunnel hang?)")
        return "hang"

    orch.spawn = fake_spawn
    orch.supervise_child = fake_supervise
    orch.kill_child = lambda: None
    monkeypatch.setattr(
        bench._Orchestrator, "emit", lambda self: None, raising=False
    )
    orch.run()
    # at least one TPU attempt, then the fallback got its headroom
    assert spawns[-1] == ["--force-cpu", "--only", "kmeans"]
    assert orch.completed["kmeans"]["cpu_fallback"] is True
    assert timeline["now"] - orch.t_start < 900
