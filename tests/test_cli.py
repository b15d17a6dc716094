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
