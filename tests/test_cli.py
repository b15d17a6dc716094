"""CLI end-to-end: build-index / query / query-words / test subcommands
(ref command/*.scala flags and defaults)."""

import io
import sys

import numpy as np
import pytest

from generators import planted_clusters, random_keys
from gulon_tpu import cli
from gulon_tpu.utils.word2vec import WordVectors, write_word2vec


@pytest.fixture(scope="module")
def corpus_file(tmp_path_factory):
    rng = np.random.default_rng(9)
    x, _, _ = planted_clusters(rng, 500, 12, 6, scale=0.2)
    keys = np.array([f"tok{i:04d}" for i in range(500)], dtype=object)
    path = tmp_path_factory.mktemp("cli") / "vecs.txt"
    with open(path, "w") as f:
        write_word2vec(WordVectors(keys, x), f)
    return str(path), keys, x


def _run(argv):
    return cli.main(argv)


def test_build_query_roundtrip(corpus_file, tmp_path, capsys):
    vecs, keys, x = corpus_file
    idx = str(tmp_path / "flat.idx")
    assert _run([
        "build-index", "--metric", "l2", "-k", "16", "-m", "4",
        "-n", "10", "-o", idx, vecs,
    ]) == 0
    qfile = str(tmp_path / "q.txt")
    with open(qfile, "w") as f:
        write_word2vec(WordVectors(keys[:3], x[:3]), f, header=False)
    capsys.readouterr()
    assert _run(["query", "-k", "2", "--index", idx, qfile]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3
    for line, key in zip(out, keys[:3]):
        assert line.startswith(f"{key}: ")
        assert len(line.split(": ")[1].split(",")) == 2


def test_build_partitioned_and_test_cmd(corpus_file, tmp_path, capsys):
    vecs, keys, x = corpus_file
    idx = str(tmp_path / "ivf.idx")
    assert _run([
        "build-index", "--metric", "cosine", "-k", "16", "-m", "4",
        "-n", "10", "-p", "--partitions", "6", "--limit", "3",
        "-o", idx, vecs,
    ]) == 0
    capsys.readouterr()
    assert _run([
        "test", "--vectors", vecs, "--index", idx, "--sample", "20",
        "-e", "0.1",
    ]) == 0
    out = capsys.readouterr().out
    assert "R@1:" in out and "R@100:" in out


def test_query_words(corpus_file, tmp_path, capsys, monkeypatch):
    vecs, keys, _ = corpus_file
    idx = str(tmp_path / "flat.idx")
    assert _run([
        "build-index", "--metric", "l2", "-k", "16", "-m", "4",
        "-n", "10", "-o", idx, vecs,
    ]) == 0
    monkeypatch.setattr(
        "sys.stdin", io.StringIO(f"{keys[7]}\nnot-a-word\n\n")
    )
    capsys.readouterr()
    assert _run(["query-words", "-k", "3", "--index", idx]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith(f"{keys[7]}: ")
    assert out[1] == "not-a-word not found"


def test_partition_flags_require_partitioned(corpus_file, tmp_path):
    vecs, _, _ = corpus_file
    assert _run([
        "build-index", "--metric", "l2", "--partitions", "4",
        "-o", str(tmp_path / "x.idx"), vecs,
    ]) == 1


def test_missing_input_is_clean_error(tmp_path):
    assert _run([
        "build-index", "--metric", "l2",
        "-o", str(tmp_path / "x.idx"), str(tmp_path / "nope.txt"),
    ]) == 1


def test_bad_metric_rejected(corpus_file, tmp_path):
    vecs, _, _ = corpus_file
    with pytest.raises(SystemExit):
        _run([
            "build-index", "--metric", "manhattan",
            "-o", str(tmp_path / "x.idx"), vecs,
        ])


def test_cluster_bounds():
    with pytest.raises(SystemExit):
        cli.build_parser().parse_args(
            ["build-index", "--metric", "l2", "-k", "65537", "-o", "x", "v"]
        )


def test_exact_build_and_serving_knobs(corpus_file, tmp_path, capsys):
    """--exact builds an npz ExactIndex servable by every subcommand;
    --mesh shards serving; --scan-strategy is validated per index type."""
    vecs, keys, x = corpus_file
    idx = str(tmp_path / "exact.idx")
    assert _run([
        "build-index", "--metric", "l2", "--exact", "-o", idx, vecs,
    ]) == 0
    qfile = str(tmp_path / "q.txt")
    with open(qfile, "w") as f:
        write_word2vec(WordVectors(keys[:3], x[:3]), f, header=False)
    capsys.readouterr()
    assert _run(["query", "-k", "1", "--index", idx, qfile]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert [ln.split(": ")[1] for ln in out] == list(keys[:3])
    # sharded serving returns the same neighbours
    assert _run(["query", "-k", "1", "--index", idx, "--mesh", "8", qfile]) == 0
    assert capsys.readouterr().out.strip().splitlines() == out
    # exact indices accept auto|xla|pallas (forcing the XLA path enables
    # kernel-vs-XLA A/B runs from the CLI) and reject PQ-only strategies
    assert _run([
        "query", "-k", "1", "--index", idx, "--scan-strategy", "xla", qfile,
    ]) == 0
    assert capsys.readouterr().out.strip().splitlines() == out
    assert _run([
        "query", "-k", "1", "--index", idx, "--scan-strategy", "decode", qfile,
    ]) == 1
    # recall of exact search is 1.0 at eps=0
    assert _run([
        "test", "--vectors", vecs, "--index", idx, "--sample", "20",
    ]) == 0
    r1 = capsys.readouterr().out.strip().splitlines()[0]
    assert r1.startswith("R@1: 1.0000")


def test_exact_and_partitioned_mutually_exclusive(corpus_file, tmp_path):
    vecs, _, _ = corpus_file
    assert _run([
        "build-index", "--metric", "l2", "--exact", "-p",
        "-o", str(tmp_path / "x.idx"), vecs,
    ]) == 1


def test_ivf_strategy_flags_and_mesh(corpus_file, tmp_path, capsys):
    """bucketed/gathered are accepted (and validated) on the CLI and return
    the same neighbours as the masked scan, single-chip and sharded."""
    vecs, keys, x = corpus_file
    idx = str(tmp_path / "ivf.idx")
    assert _run([
        "build-index", "--metric", "l2", "-k", "16", "-m", "4",
        "-n", "10", "-p", "--partitions", "6", "--limit", "3",
        "-o", idx, vecs,
    ]) == 0
    qfile = str(tmp_path / "q.txt")
    with open(qfile, "w") as f:
        write_word2vec(WordVectors(keys[:5], x[:5]), f, header=False)

    def lines(extra):
        capsys.readouterr()
        assert _run(
            ["query", "-k", "3", "--index", idx] + extra + [qfile]
        ) == 0
        return capsys.readouterr().out.strip().splitlines()

    base = lines([])
    assert lines(["--scan-strategy", "bucketed"]) == base
    assert lines(["--scan-strategy", "gathered"]) == base
    # pallas is valid for IVF too; this tiny corpus is below the kernel
    # envelope so it serves via the identical masked fallback
    assert lines(["--scan-strategy", "pallas"]) == base
    assert lines(["--mesh", "4"]) == base
    assert lines(["--scan-strategy", "bucketed", "--mesh", "4"]) == base
    # flat-only strategy rejected for an IVF index
    assert _run([
        "query", "-k", "3", "--index", idx, "--scan-strategy", "lut",
        qfile,
    ]) == 1


def test_build_with_kmeanspp_init(corpus_file, tmp_path, capsys):
    """--kmeans-init kmeans++ builds a working index end-to-end."""
    vecs, keys, x = corpus_file
    idx = str(tmp_path / "pp.idx")
    assert _run([
        "build-index", "--metric", "l2", "-k", "16", "-m", "4",
        "-n", "10", "--kmeans-init", "kmeans++", "-o", idx, vecs,
    ]) == 0
    qfile = str(tmp_path / "qpp.txt")
    with open(qfile, "w") as f:
        write_word2vec(WordVectors(keys[:2], x[:2]), f, header=False)
    capsys.readouterr()
    assert _run(["query", "-k", "1", "--index", idx, qfile]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert [line.split(":")[0] for line in out] == list(keys[:2])


def test_max_partition_size_flag(corpus_file, tmp_path, capsys):
    vecs, keys, x = corpus_file
    idx = str(tmp_path / "cap.idx")
    # requires --partitioned
    assert _run([
        "build-index", "--metric", "l2", "--max-partition-size", "50",
        "-o", idx, vecs,
    ]) == 1
    capsys.readouterr()
    assert _run([
        "build-index", "--metric", "l2", "-k", "16", "-m", "4", "-n", "8",
        "-p", "--partitions", "6", "--max-partition-size", "120",
        "-o", idx, vecs,
    ]) == 0
    from gulon_tpu.utils.serde import load_index

    index = load_index(idx)
    assert index.partition_sizes().max() <= 120


def test_streaming_build_flag(corpus_file, tmp_path, capsys):
    """--streaming builds flat and partitioned indices through the native
    chunked parser with results equivalent to the in-memory build."""
    pytest.importorskip("ctypes")
    from gulon_tpu.utils import native

    if native._load() is None:
        pytest.skip("native IO library unavailable")
    vecs, keys, x = corpus_file
    idx_s = str(tmp_path / "s.idx")
    idx_m = str(tmp_path / "m.idx")
    base = ["build-index", "--metric", "l2", "-k", "16", "-m", "4",
            "-n", "10"]
    assert _run(base + ["--streaming", "-o", idx_s, vecs]) == 0
    assert _run(base + ["-o", idx_m, vecs]) == 0
    qfile = str(tmp_path / "q.txt")
    with open(qfile, "w") as f:
        write_word2vec(WordVectors(keys[:5], x[:5]), f, header=False)

    def lines(idx):
        capsys.readouterr()
        assert _run(["query", "-k", "3", "--index", idx, qfile]) == 0
        return capsys.readouterr().out.strip().splitlines()

    # same PQ seeds + same sorted corpus -> identical neighbours
    assert lines(idx_s) == lines(idx_m)
    # partitioned streaming build serves end-to-end
    idx_p = str(tmp_path / "p.idx")
    assert _run(base + [
        "--streaming", "-p", "--partitions", "6", "--limit", "3",
        "-o", idx_p, vecs,
    ]) == 0
    out = lines(idx_p)
    assert [ln.split(":")[0] for ln in out] == list(keys[:5])
    # --exact is incompatible
    assert _run([
        "build-index", "--metric", "l2", "--exact", "--streaming",
        "-o", str(tmp_path / "x.idx"), vecs,
    ]) == 1


def test_add_vectors_and_remove_keys_cmds(corpus_file, tmp_path, capsys):
    vecs, keys, x = corpus_file
    idx = str(tmp_path / "base.idx")
    assert _run([
        "build-index", "--metric", "l2", "-k", "16", "-m", "4",
        "-n", "10", "-o", idx, vecs,
    ]) == 0
    # new rows in a second word2vec file
    rng = np.random.default_rng(33)
    x_new = x[:4] + rng.normal(0, 0.01, (4, x.shape[1])).astype(np.float32)
    new_keys = np.array([f"new{i}" for i in range(4)], dtype=object)
    addfile = str(tmp_path / "new.txt")
    with open(addfile, "w") as f:
        write_word2vec(WordVectors(new_keys, x_new), f)
    grown = str(tmp_path / "grown.idx")
    assert _run(["add-vectors", "--index", idx, "-o", grown, addfile]) == 0
    qfile = str(tmp_path / "qnew.txt")
    with open(qfile, "w") as f:
        write_word2vec(WordVectors(new_keys[:1], x_new[:1]), f, header=False)
    capsys.readouterr()
    assert _run(["query", "-k", "3", "--index", grown, qfile]) == 0
    out = capsys.readouterr().out.strip()
    assert out.startswith("new0: ")

    # remove-keys: positional + --keys-file, then the removed key is gone
    keysfile = str(tmp_path / "victims.txt")
    with open(keysfile, "w") as f:
        f.write("new1\nnew2\n")
    shrunk = str(tmp_path / "shrunk.idx")
    assert _run([
        "remove-keys", "--index", grown, "-o", shrunk, "new0",
        "--keys-file", keysfile,
    ]) == 0
    capsys.readouterr()
    assert _run(["query", "-k", "1", "--index", shrunk, qfile]) == 0
    out = capsys.readouterr().out.strip()
    # new0 was removed: its nearest neighbour is now an original row
    assert not out.split(": ")[1].startswith("new0")


def test_remove_keys_errors_are_clean(corpus_file, tmp_path, capsys):
    vecs, keys, x = corpus_file
    idx = str(tmp_path / "b.idx")
    assert _run([
        "build-index", "--metric", "l2", "-k", "16", "-m", "4",
        "-n", "10", "-o", idx, vecs,
    ]) == 0
    capsys.readouterr()
    out = str(tmp_path / "out.idx")
    assert _run(["remove-keys", "--index", idx, "-o", out, "nope"]) == 1
    assert "nope" in capsys.readouterr().err
    assert _run(["remove-keys", "--index", idx, "-o", out]) == 1
    assert "no keys" in capsys.readouterr().err


def test_tune_cmd(corpus_file, tmp_path, capsys):
    vecs, keys, x = corpus_file
    idx = str(tmp_path / "ivf.idx")
    assert _run([
        "build-index", "--metric", "l2", "-k", "16", "-m", "4",
        "-n", "10", "-p", "--partitions", "8", "--limit", "2",
        "-o", idx, vecs,
    ]) == 0
    tuned = str(tmp_path / "tuned.idx")
    capsys.readouterr()
    assert _run([
        "tune", "--vectors", vecs, "--index", idx, "-o", tuned,
        "--target-recall", "0.5", "-k", "5", "--sample", "40",
    ]) == 0
    out = capsys.readouterr().out
    assert "LimitGroups limit" in out and "recall@5" in out
    from gulon_tpu.utils.serde import load_index
    assert load_index(tuned).strategy.count >= 1

    # tune rejects a flat index cleanly
    flat = str(tmp_path / "flat.idx")
    assert _run([
        "build-index", "--metric", "l2", "-k", "16", "-m", "4",
        "-n", "10", "-o", flat, vecs,
    ]) == 0
    capsys.readouterr()
    assert _run([
        "tune", "--vectors", vecs, "--index", flat, "-o", tuned,
    ]) == 1
    assert "partitioned" in capsys.readouterr().err


def test_info_cmd(corpus_file, tmp_path, capsys):
    vecs, keys, x = corpus_file
    idx = str(tmp_path / "ivf.idx")
    assert _run([
        "build-index", "--metric", "cosine", "-k", "16", "-m", "4",
        "-n", "10", "-p", "--partitions", "6", "--limit", "2",
        "-o", idx, vecs,
    ]) == 0
    capsys.readouterr()
    assert _run(["info", "--index", idx]) == 0
    out = capsys.readouterr().out
    assert "IVFIndex" in out and "partitions:  6" in out
    assert "cosine" in out and "4 x 16 clusters" in out
    assert "LimitGroups(2)" in out


def test_export_aot_and_serve(corpus_file, tmp_path, capsys):
    vecs, keys, x = corpus_file
    idx = str(tmp_path / "flat.idx")
    assert _run([
        "build-index", "--metric", "l2", "-k", "16", "-m", "4",
        "-n", "10", "-o", idx, vecs,
    ]) == 0
    sidecar = str(tmp_path / "flat.aot")
    capsys.readouterr()
    assert _run([
        "export-aot", "--index", idx, "-o", sidecar,
        "--batches", "4", "-k", "2",
    ]) == 0
    out = capsys.readouterr().out
    assert "1 artifacts" in out and sidecar in out

    qfile = str(tmp_path / "q.txt")
    with open(qfile, "w") as f:
        write_word2vec(WordVectors(keys[:3], x[:3]), f, header=False)
    # the exported batch (4) covers the 3 queries via padding; results
    # must match the jitted path exactly
    assert _run([
        "query", "-k", "2", "--index", idx, "--aot", sidecar, qfile,
    ]) == 0
    aot_out = capsys.readouterr().out.strip().splitlines()
    assert _run(["query", "-k", "2", "--index", idx, qfile]) == 0
    jit_out = capsys.readouterr().out.strip().splitlines()
    assert aot_out == jit_out

    # --aot and --mesh are mutually exclusive (clean error)
    assert _run([
        "query", "-k", "2", "--index", idx, "--aot", sidecar,
        "--mesh", "2", qfile,
    ]) == 1

    # malformed --batches is a clean error
    assert _run([
        "export-aot", "--index", idx, "-o", sidecar, "--batches", "0",
    ]) == 1
    assert "--batches" in capsys.readouterr().err


def test_test_cmd_external_queries(corpus_file, tmp_path, capsys):
    vecs, keys, x = corpus_file
    idx = str(tmp_path / "flat.idx")
    assert _run([
        "build-index", "--metric", "cosine", "-k", "16", "-m", "4",
        "-n", "10", "-o", idx, vecs,
    ]) == 0
    qfile = str(tmp_path / "extq.txt")
    rng = np.random.default_rng(3)
    qx = x[:8] + rng.normal(0, 0.01, (8, x.shape[1])).astype(np.float32)
    qkeys = np.array([f"q{i}" for i in range(8)], dtype=object)
    with open(qfile, "w") as f:
        write_word2vec(WordVectors(qkeys, qx), f, header=False)
    capsys.readouterr()
    assert _run([
        "test", "--vectors", vecs, "--index", idx,
        "--queries", qfile, "-e", "0.1",
    ]) == 0
    out = capsys.readouterr().out
    assert "R@1:" in out and "R@100:" in out


def test_export_aot_ivf_and_exact(corpus_file, tmp_path, capsys):
    vecs, keys, x = corpus_file
    qfile = str(tmp_path / "q.txt")
    with open(qfile, "w") as f:
        write_word2vec(WordVectors(keys[:3], x[:3]), f, header=False)

    # partitioned index: masked + gathered strategies export; bucketed is
    # a clean error (host-side per-batch planning)
    ivf = str(tmp_path / "ivf.idx")
    assert _run([
        "build-index", "--metric", "l2", "-k", "16", "-m", "4",
        "-n", "10", "-p", "--partitions", "6", "--limit", "3",
        "-o", ivf, vecs,
    ]) == 0
    sidecar = str(tmp_path / "ivf.aot")
    capsys.readouterr()
    assert _run([
        "export-aot", "--index", ivf, "-o", sidecar,
        "--batches", "4", "-k", "2", "--scan-strategy", "gathered",
    ]) == 0
    capsys.readouterr()
    assert _run([
        "query", "-k", "2", "--index", ivf, "--aot", sidecar,
        "--scan-strategy", "gathered", qfile,
    ]) == 0
    aot_out = capsys.readouterr().out.strip().splitlines()
    assert _run([
        "query", "-k", "2", "--index", ivf,
        "--scan-strategy", "gathered", qfile,
    ]) == 0
    assert aot_out == capsys.readouterr().out.strip().splitlines()
    assert _run([
        "export-aot", "--index", ivf, "-o", sidecar,
        "--scan-strategy", "bucketed", "--batches", "4", "-k", "2",
    ]) == 1
    assert "bucketed" in capsys.readouterr().err

    # exact (npz) index
    ex = str(tmp_path / "exact.idx")
    assert _run([
        "build-index", "--metric", "l2", "--exact", "-o", ex, vecs,
    ]) == 0
    sidecar2 = str(tmp_path / "exact.aot")
    capsys.readouterr()
    assert _run([
        "export-aot", "--index", ex, "-o", sidecar2,
        "--batches", "4", "-k", "3",
    ]) == 0
    capsys.readouterr()
    assert _run([
        "query", "-k", "3", "--index", ex, "--aot", sidecar2, qfile,
    ]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith(f"{keys[0]}: {keys[0]}")


def test_build_binary_input_and_streaming_guard(corpus_file, tmp_path, capsys):
    vecs, keys, x = corpus_file
    from gulon_tpu.utils.word2vec import write_word2vec_bin

    bpath = str(tmp_path / "vecs.bin")
    write_word2vec_bin(WordVectors(keys, x), bpath)
    idx = str(tmp_path / "b.idx")
    # binary input builds transparently (auto-sniffed)
    assert _run([
        "build-index", "--metric", "l2", "-k", "16", "-m", "4",
        "-n", "10", "-o", idx, bpath,
    ]) == 0
    qfile = str(tmp_path / "q.txt")
    with open(qfile, "w") as f:
        write_word2vec(WordVectors(keys[:2], x[:2]), f, header=False)
    capsys.readouterr()
    assert _run(["query", "-k", "2", "--index", idx, qfile]) == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 2
    # --streaming is text-only: clean error, not garbage parsing
    assert _run([
        "build-index", "--metric", "l2", "--streaming",
        "-o", idx, bpath,
    ]) == 1
    assert "binary" in capsys.readouterr().err


def test_serving_knob_flags(corpus_file, tmp_path, capsys):
    """--rerank-factor / --pallas-winners apply to the loaded index and
    reject out-of-range / wrong-index-kind values."""
    vecs, keys, x = corpus_file
    idx = str(tmp_path / "knobs.idx")
    assert _run([
        "build-index", "--metric", "l2", "-k", "16", "-m", "4",
        "-n", "8", "-o", idx, vecs,
    ]) == 0
    qfile = str(tmp_path / "kq.txt")
    with open(qfile, "w") as f:
        write_word2vec(WordVectors(keys[:2], x[:2]), f, header=False)
    capsys.readouterr()
    assert _run([
        "query", "-k", "2", "--index", idx,
        "--rerank-factor", "4", "--pallas-winners", "2", qfile,
    ]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith(f"{keys[0]}: {keys[0]}")
    # 0 = auto is accepted
    assert _run([
        "query", "-k", "2", "--index", idx, "--rerank-factor", "0", qfile,
    ]) == 0
    capsys.readouterr()
    # negative rerank / out-of-range winners rejected
    assert _run([
        "query", "-k", "2", "--index", idx, "--rerank-factor", "-1", qfile,
    ]) == 1
    assert _run([
        "query", "-k", "2", "--index", idx, "--pallas-winners", "9", qfile,
    ]) == 1
    capsys.readouterr()

    ividx = str(tmp_path / "knobs_ivf.idx")
    assert _run([
        "build-index", "--metric", "l2", "-k", "16", "-m", "4",
        "-n", "8", "-p", "--partitions", "6", "-o", ividx, vecs,
    ]) == 0
    capsys.readouterr()
    assert _run([
        "query", "-k", "2", "--index", ividx,
        "--scan-strategy", "auto", "--pallas-winners", "3", qfile,
    ]) == 0
    # winners=0 (flat auto) is not meaningful for ivf
    assert _run([
        "query", "-k", "2", "--index", ividx, "--pallas-winners", "0", qfile,
    ]) == 1


def test_gulon_platform_env_subprocess(corpus_file, tmp_path):
    """GULON_PLATFORM=cpu must make the CLI runnable as a real subprocess
    on hosts whose site hooks pre-register a remote accelerator backend
    and override JAX_PLATFORMS (a downed tunnel otherwise hangs or fails
    every invocation). In-process tests can't cover this: the conftest
    already forces the platform for the suite's interpreter."""
    import os
    import subprocess

    vecs, _keys, _x = corpus_file
    out = tmp_path / "plat.pb"
    env = dict(os.environ, GULON_PLATFORM="cpu")
    env.pop("JAX_PLATFORMS", None)  # the knob alone must be enough
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "gulon_tpu.cli", "build-index",
         "--metric", "l2", "-k", "8", "-m", "2", "--max-iters", "4",
         "-o", str(out), vecs],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert out.exists() and out.stat().st_size > 0
