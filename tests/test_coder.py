"""Bit-packing codec properties (ref CoderSpec: round-trip for all widths,
factory totality, exact packed-size law)."""

import numpy as np
import pytest

from gulon_tpu.ops import coder


@pytest.mark.parametrize("width", [2, 4, 8, 10, 12, 16])
def test_pack_roundtrip(width):
    rng = np.random.default_rng(width)
    for n in (0, 1, 3, 7, 64, 1000):
        idx = rng.integers(0, 1 << width, size=n)
        packed = coder.pack(idx, width)
        got = coder.unpack(packed, n, width)
        np.testing.assert_array_equal(got, idx)


def test_width_zero_degenerate():
    assert coder.pack(np.zeros(5, np.int64), 0) == b""
    np.testing.assert_array_equal(coder.unpack(b"", 5, 0), np.zeros(5))


@pytest.mark.parametrize("logical", range(0, 17))
def test_storage_width_total_and_minimal(logical):
    """storage_width rounds any 0..16 logical width up to a supported one
    (ref Coder.factoryFor, Coder.scala:35-45)."""
    w = coder.storage_width(logical)
    assert w in coder.SUPPORTED_WIDTHS
    assert w >= logical
    smaller = [s for s in coder.SUPPORTED_WIDTHS if logical <= s < w]
    assert not smaller  # minimal


def test_storage_width_rejects_out_of_range():
    with pytest.raises(ValueError):
        coder.storage_width(17)
    with pytest.raises(ValueError):
        coder.storage_width(-1)


@pytest.mark.parametrize("width", [2, 4, 8, 10, 12, 16])
@pytest.mark.parametrize("n", [0, 1, 5, 8, 13, 999])
def test_packed_size_law(width, n):
    """Exact byte counts (ref CoderSpec:31-40): sub-byte widths pack
    ceil(n*w/8); byte-plus widths add the MSB plane."""
    idx = np.zeros(n, np.int64)
    packed = coder.pack(idx, width)
    assert len(packed) == coder.packed_size(n, width)
    if width in (2, 4, 8):
        assert len(packed) == -(-n * width // 8)
    else:
        assert len(packed) == n + -(-n * (width - 8) // 8)


def test_sub_byte_little_endian_layout():
    """Index i lands in byte i*w//8 shifted by (i % (8/w))*w
    (ref Coder.scala:99-127)."""
    packed = coder.pack(np.array([1, 2, 3, 0]), 2)
    # 1 | 2<<2 | 3<<4 | 0<<6 = 0b00111001
    assert packed == bytes([0b00111001])
    packed4 = coder.pack(np.array([0xA, 0x5]), 4)
    assert packed4 == bytes([0xA | (0x5 << 4)])


def test_byte_plus_msb_plane_layout():
    """10/12/16-bit codes: MSB byte-plane first, then packed LSB plane
    (ref Coder.scala:142-168)."""
    idx = np.array([0x3FF, 0x001])
    packed = coder.pack(idx, 10)
    # MSB plane: one byte per index, index >> lsb_width
    assert packed[0] == 0x3FF >> 2 and packed[1] == 0x001 >> 2
    # LSB plane: the remaining bytes are exactly the 2-bit packing of
    # the low bits
    lsb_expected = coder.pack(idx & 0b11, 2)
    assert packed[2:] == lsb_expected
    np.testing.assert_array_equal(coder.unpack(packed, 2, 10), idx)
