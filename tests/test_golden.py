"""Golden wire-format fixtures: absolute byte layouts pinned by hand.

The round-trip tests elsewhere are self-consistent; these fixtures pin the
*absolute* bytes against values derived by hand from the reference's coder
layouts (``Coder.scala:99-168``: little-endian-within-byte sub-byte packing;
``BytePlus``: an MSB byte-plane followed by the packed LSB plane) and the
proto schema (``index.proto``), so silent drift in the packing or the wire
structure fails loudly. A JVM writer is unavailable here (zero egress);
every expected byte below is computed manually from the reference source.
"""

import numpy as np

from gulon_tpu.ops import coder


# (width, indices, expected bytes) — each derived by hand from Coder.scala.
GOLDEN_CODES = [
    # Coder2: id << ((i & 3) * 2) into byte i >> 2
    (2, [1, 2, 3, 0, 1], bytes([0b00_11_10_01, 0b00_00_00_01])),
    # Coder4: id << ((i & 1) * 4) into byte i >> 1
    (4, [0xA, 0x3, 0x7], bytes([0x3A, 0x07])),
    # Coder8: identity bytes
    (8, [5, 254, 0], bytes([0x05, 0xFE, 0x00])),
    # BytePlus(lsb=2): msb plane = idx >> 2, then Coder2-packed low bits
    (10, [0x3FF, 0x001, 0x155], bytes([0xFF, 0x00, 0x55, 0b00_01_01_11])),
    # BytePlus(lsb=4): msb plane = idx >> 4, then Coder4-packed low bits
    (12, [0xABC, 0x123], bytes([0xAB, 0x12, 0x3C])),
    # BytePlus(lsb=8): msb plane = idx >> 8, then raw low bytes
    (16, [0xBEEF, 0x0102], bytes([0xBE, 0x01, 0xEF, 0x02])),
    # Coder0: degenerate, zero bytes
    (0, [0, 0], b""),
]


def test_coder_golden_bytes():
    for width, indices, expected in GOLDEN_CODES:
        got = coder.pack(indices, width)
        assert got == expected, (
            f"width {width}: got {got.hex()}, want {expected.hex()}"
        )
        back = coder.unpack(expected, len(indices), width)
        np.testing.assert_array_equal(back, np.asarray(indices, np.int32))


def test_coder_size_law_matches_reference():
    # bytesPerCode: sub-byte = ceil(n*w/8); BytePlus = n + lsb bytes
    assert coder.packed_size(5, 2) == 2
    assert coder.packed_size(3, 4) == 2
    assert coder.packed_size(7, 8) == 7
    assert coder.packed_size(3, 10) == 3 + 1
    assert coder.packed_size(2, 12) == 2 + 1
    assert coder.packed_size(2, 16) == 2 + 2
    assert coder.packed_size(9, 0) == 0


def test_sorted_index_wire_golden():
    """Pin the EncodedMatrix bytes inside a serialized SortedIndex: the
    quantizer-major encodings must be exactly the hand-packed per-subspace
    code streams (EncodedMatrix.scala:11-35 storage order)."""
    import jax.numpy as jnp

    from gulon_tpu.models.flat import FlatIndex
    from gulon_tpu.models.keyindex import SortedKeyIndex
    from gulon_tpu.models.metric import Metric
    from gulon_tpu.ops.pq import ProductQuantizer, subspace_bounds
    from gulon_tpu.proto import index_pb2
    from gulon_tpu.utils import serde

    # 3 rows, d=4, m=2 subspaces of width 2, K=4 (logical 2 bits ->
    # storage width 2)
    bounds = subspace_bounds(4, 2)
    cb = jnp.asarray(np.arange(2 * 4 * 2, dtype=np.float32).reshape(2, 4, 2))
    pq = ProductQuantizer(codebooks=cb, bounds=bounds, num_clusters=4)
    codes = jnp.asarray(np.array([[1, 2], [3, 0], [0, 1]], np.uint8))
    index = FlatIndex(
        _key_index=SortedKeyIndex(np.array(["a", "b", "c"], dtype=object)),
        pq=pq,
        codes=codes,
        recon_norms=pq.reconstruction_norms(codes),
        metric=Metric.L2,
    )
    blob = serde.index_to_proto(index).SerializeToString()
    parsed = index_pb2.Index.FromString(blob)
    enc = parsed.sorted.vector_index.data
    assert enc.code_width == 2
    assert enc.length == 3
    # quantizer-major: subspace 0 packs column [1, 3, 0]; subspace 1 [2, 0, 1]
    assert bytes(enc.encodings[0]) == bytes([0b00_00_11_01])
    assert bytes(enc.encodings[1]) == bytes([0b00_01_00_10])
    # metric enum + keys as written
    assert parsed.sorted.metric == index_pb2.L2
    assert list(parsed.sorted.sorted_words) == ["a", "b", "c"]
    # quantizer geometry fields
    q0 = parsed.sorted.vector_index.product_quantizer.quantizers[0]
    assert q0.start_index == 0 and q0.dimension == 2


def test_grouped_index_wire_golden():
    """GroupedIndex wire: offsets are the INTERNAL group boundaries and
    centroids serialize per-partition (Index.scala:151-174 semantics)."""
    import jax.numpy as jnp

    from gulon_tpu.models.ivf import IVFIndex, LimitGroups
    from gulon_tpu.models.keyindex import GroupedKeyIndex
    from gulon_tpu.models.metric import Metric
    from gulon_tpu.ops.pq import ProductQuantizer, subspace_bounds
    from gulon_tpu.proto import index_pb2
    from gulon_tpu.utils import serde

    bounds = subspace_bounds(2, 1)
    cb = jnp.asarray(
        np.arange(4 * 2, dtype=np.float32).reshape(1, 4, 2)
    )
    pq = ProductQuantizer(codebooks=cb, bounds=bounds, num_clusters=4)
    codes = jnp.asarray(np.array([[0], [3], [2], [1]], np.uint8))
    cents = jnp.asarray(np.array([[1.0, 2.0], [3.0, 4.0]], np.float32))
    index = IVFIndex(
        _key_index=GroupedKeyIndex(
            np.array(["a", "b", "x", "y"], dtype=object),
            np.array([2], np.int32),
        ),
        pq=pq,
        codes=codes,
        row_const=pq.reconstruction_norms(codes),
        group_ids=jnp.asarray(np.array([0, 0, 1, 1], np.int32)),
        centroids=cents,
        metric=Metric.COSINE,
        strategy=LimitGroups(1),
    )
    parsed = index_pb2.Index.FromString(
        serde.index_to_proto(index).SerializeToString()
    )
    g = parsed.grouped
    assert g.metric == index_pb2.COSINE
    assert list(g.offsets) == [2]
    assert g.strategy == index_pb2.GroupedIndex.LIMIT_GROUPS
    assert g.limit == 1
    assert [list(c.values) for c in g.centroids] == [
        [1.0, 2.0], [3.0, 4.0],
    ]
    # width-2 packing of the code column [0, 3, 2, 1]: 0 | 3<<2 | 2<<4 | 1<<6
    exp = bytes([0b01_10_11_00])
    assert bytes(g.vector_index.data.encodings[0]) == exp
