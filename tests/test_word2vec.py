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


class TestBinaryFormat:
    """Original word2vec binary format (an extra over the text-only
    reference): round-trip, sniffing, and CLI-path auto-detection."""

    def _wv(self, n=50, d=12, seed=3):
        rng = np.random.default_rng(seed)
        keys = np.array(
            [f"wörd{i:03d}" for i in range(n)], dtype=object
        )  # non-ASCII keys exercise UTF-8 handling
        x = rng.normal(size=(n, d)).astype(np.float32)
        return WordVectors(keys, x)

    def test_binary_roundtrip(self, tmp_path):
        from gulon_tpu.utils.word2vec import (
            read_word2vec_bin,
            write_word2vec_bin,
        )

        wv = self._wv()
        path = str(tmp_path / "v.bin")
        write_word2vec_bin(wv, path)
        back = read_word2vec_bin(path)
        assert list(back.keys) == list(wv.keys)
        np.testing.assert_array_equal(back.vectors, wv.vectors)

    def test_binary_no_record_newlines(self, tmp_path):
        """Some writers emit no separator between records."""
        from gulon_tpu.utils.word2vec import read_word2vec_bin

        wv = self._wv(n=20, d=4)
        path = str(tmp_path / "v.bin")
        with open(path, "wb") as f:
            f.write(f"{len(wv)} {wv.dimension}\n".encode())
            for key, row in zip(wv.keys, wv.vectors):
                f.write(str(key).encode() + b" " + row.tobytes())
        back = read_word2vec_bin(path)
        assert list(back.keys) == list(wv.keys)
        np.testing.assert_array_equal(back.vectors, wv.vectors)

    def test_sniff_and_path_dispatch(self, tmp_path):
        from gulon_tpu.utils.word2vec import (
            read_word2vec_path,
            sniff_word2vec_binary,
            write_word2vec_bin,
        )

        wv = self._wv(n=30, d=3)  # tiny dim: the hard sniff case
        bpath = str(tmp_path / "v.bin")
        tpath = str(tmp_path / "v.txt")
        write_word2vec_bin(wv, bpath)
        with open(tpath, "w") as f:
            write_word2vec(wv, f)
        assert sniff_word2vec_binary(bpath) is True
        assert sniff_word2vec_binary(tpath) is False
        b = read_word2vec_path(bpath)
        t = read_word2vec_path(tpath)
        assert list(b.keys) == list(t.keys)
        np.testing.assert_allclose(b.vectors, t.vectors, rtol=1e-6)

    def test_headerless_text_not_sniffed_binary(self, tmp_path):
        from gulon_tpu.utils.word2vec import sniff_word2vec_binary

        path = str(tmp_path / "nohdr.txt")
        with open(path, "w") as f:
            write_word2vec(self._wv(n=5, d=4), f, header=False)
        assert sniff_word2vec_binary(path) is False

    def test_truncated_binary_is_clean_error(self, tmp_path):
        from gulon_tpu.utils.word2vec import (
            read_word2vec_bin,
            write_word2vec_bin,
        )

        wv = self._wv(n=10, d=8)
        path = str(tmp_path / "v.bin")
        write_word2vec_bin(wv, path)
        data = open(path, "rb").read()
        with open(path, "wb") as f:
            f.write(data[: len(data) - 20])
        with pytest.raises(ValueError, match="truncated"):
            read_word2vec_bin(path)

    def test_normalize_on_read(self, tmp_path):
        from gulon_tpu.utils.word2vec import (
            read_word2vec_bin,
            write_word2vec_bin,
        )

        wv = self._wv(n=16, d=6)
        path = str(tmp_path / "v.bin")
        write_word2vec_bin(wv, path)
        back = read_word2vec_bin(path, normalize=True)
        np.testing.assert_allclose(
            np.linalg.norm(back.vectors, axis=1), 1.0, rtol=1e-5
        )
