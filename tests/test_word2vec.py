"""word2vec reader properties (ref WordVectorsSpec: parser round-trips,
UTF-8 paths, normalize-on-read unit norms) for both the Python and the
native parser."""

import io
import os

import numpy as np
import pytest

from generators import planted_clusters, random_keys
from gulon_tpu.utils import native
from gulon_tpu.utils.word2vec import (
    WordVectors,
    read_word2vec,
    read_word2vec_path,
    write_word2vec,
)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(5)
    x, _, _ = planted_clusters(rng, 200, 17, 4)
    keys = random_keys(rng, 200)
    return WordVectors(keys, x)


def _roundtrip_text(wv, header=True):
    buf = io.StringIO()
    write_word2vec(wv, buf, header=header)
    buf.seek(0)
    return buf


def test_roundtrip_with_header(corpus):
    got = read_word2vec(_roundtrip_text(corpus, header=True))
    assert list(got.keys) == list(corpus.keys)
    np.testing.assert_array_equal(got.vectors, corpus.vectors)


def test_roundtrip_without_header(corpus):
    got = read_word2vec(_roundtrip_text(corpus, header=False))
    assert list(got.keys) == list(corpus.keys)
    np.testing.assert_array_equal(got.vectors, corpus.vectors)


def test_two_token_word_line_is_not_header():
    # "ab 1.5" could look like a header; it must parse as data
    # (header requires two *integers*, WordVectors.scala:143-160).
    got = read_word2vec(io.StringIO("ab 1.5\ncd 2.5\n"))
    assert list(got.keys) == ["ab", "cd"]


def test_normalize_on_read(corpus):
    got = read_word2vec(_roundtrip_text(corpus), normalize=True)
    norms = np.linalg.norm(got.vectors, axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_utf8_path(tmp_path, corpus):
    keys = np.array(["héllo", "wörld", "日本語"], dtype=object)
    wv = WordVectors(keys, corpus.vectors[:3])
    p = tmp_path / "vecs.txt"
    with open(p, "w", encoding="utf-8") as f:
        write_word2vec(wv, f)
    got = read_word2vec_path(p, use_native=False)
    assert list(got.keys) == list(keys)


def test_sorted_preserves_mapping(corpus):
    s = corpus.sorted()
    assert list(s.keys) == sorted(corpus.keys)
    orig = {k: v for k, v in zip(corpus.keys, corpus.vectors)}
    for k, v in zip(s.keys, s.vectors):
        np.testing.assert_array_equal(v, orig[k])


def test_progress_reports(corpus):
    reports = []
    read_word2vec(
        _roundtrip_text(corpus), report_fn=reports.append, chunk_lines=64
    )
    assert reports and reports[-1].lines_read == len(corpus)
    assert reports[-1].percentage == 100.0


# --- native parser ---

needs_native = pytest.mark.skipif(
    not native.available(), reason="native IO library unavailable"
)


@needs_native
def test_native_matches_python(tmp_path, corpus):
    p = tmp_path / "vecs.txt"
    with open(p, "w", encoding="utf-8") as f:
        write_word2vec(corpus, f)
    py = read_word2vec_path(p, use_native=False)
    nat = native.read_word2vec(str(p))
    assert list(nat.keys) == list(py.keys)
    np.testing.assert_allclose(nat.vectors, py.vectors, rtol=1e-6)


@needs_native
def test_native_no_header_and_utf8(tmp_path):
    p = tmp_path / "v.txt"
    with open(p, "w", encoding="utf-8") as f:
        f.write("héllo 1.0 2.0 3.0\nwörld -4.5 5.25 6e-3\n")
    nat = native.read_word2vec(str(p))
    assert list(nat.keys) == ["héllo", "wörld"]
    np.testing.assert_allclose(
        nat.vectors,
        np.array([[1, 2, 3], [-4.5, 5.25, 6e-3]], np.float32),
    )


@needs_native
def test_native_malformed_raises(tmp_path):
    p = tmp_path / "bad.txt"
    with open(p, "w") as f:
        f.write("ok 1.0 2.0\nbad 1.0 notafloat\n")
    with pytest.raises(ValueError):
        native.read_word2vec(str(p))


@needs_native
def test_native_large_multithreaded(tmp_path):
    rng = np.random.default_rng(11)
    n, d = 30000, 24
    x = rng.normal(size=(n, d)).astype(np.float32)
    keys = np.array([f"w{i:06d}" for i in range(n)], dtype=object)
    p = tmp_path / "big.txt"
    with open(p, "w") as f:
        write_word2vec(WordVectors(keys, x), f)
    # pad the file over the 1 MiB threading threshold check implicitly;
    # force 4 threads regardless
    nat = native.read_word2vec(str(p), num_threads=4)
    assert list(nat.keys) == list(keys)
    np.testing.assert_allclose(nat.vectors, x, rtol=1e-6)
