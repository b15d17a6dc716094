"""Property-based tests (hypothesis), mirroring the reference's ScalaCheck
style (SURVEY §4): totality and round-trip laws over generated inputs.

Shapes are kept small and dtypes fixed so jit recompilation per example
stays cheap; device-heavy invariants live in the example-based suites.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from gulon_tpu.models.keyindex import GroupedKeyIndex, SortedKeyIndex
from gulon_tpu.ops import coder
from gulon_tpu.ops.pq import code_width, subspace_bounds
from gulon_tpu.ops.stats import SummaryStats

_SET = settings(max_examples=60, deadline=None)


@_SET
@given(
    width=st.sampled_from([2, 4, 8, 10, 12, 16]),
    n=st.integers(0, 200),
    data=st.data(),
)
def test_coder_roundtrip_property(width, n, data):
    idx = np.asarray(
        data.draw(
            st.lists(
                st.integers(0, (1 << width) - 1), min_size=n, max_size=n
            )
        ),
        dtype=np.int64,
    )
    packed = coder.pack(idx, width)
    assert len(packed) == coder.packed_size(n, width)
    np.testing.assert_array_equal(coder.unpack(packed, n, width), idx)


@_SET
@given(d=st.integers(1, 400), data=st.data())
def test_subspace_bounds_partition_property(d, data):
    """For any (d, m) the bounds tile [0, d) contiguously with widths
    differing by at most one (ref VectorsSpec:42-64)."""
    m = data.draw(st.integers(1, d))
    bounds = subspace_bounds(d, m)
    assert len(bounds) == m
    pos = 0
    widths = []
    for start, width in bounds:
        assert start == pos and width >= 1
        pos += width
        widths.append(width)
    assert pos == d
    assert max(widths) - min(widths) <= 1
    # widths are non-increasing (large subspaces first, Vectors.scala:91-103)
    assert widths == sorted(widths, reverse=True)


@_SET
@given(k=st.integers(1, 65536))
def test_code_width_property(k):
    w = code_width(k)
    assert (1 << w) >= k
    if k > 1:
        assert (1 << (w - 1)) < k


@_SET
@given(
    xs=st.lists(
        st.floats(-1e3, 1e3, allow_nan=False, width=32), max_size=60
    ),
    split=st.integers(0, 60),
)
def test_summary_stats_merge_property(xs, split):
    """Merging any split equals the whole (ref SummaryStatsSpec)."""
    split = min(split, len(xs))
    a = SummaryStats.of(xs[:split]) if xs[:split] else SummaryStats.zero()
    b = SummaryStats.of(xs[split:]) if xs[split:] else SummaryStats.zero()
    merged = a + b
    whole = SummaryStats.of(xs) if xs else SummaryStats.zero()
    assert merged.count == whole.count
    if whole.count:
        np.testing.assert_allclose(merged.mean, whole.mean, rtol=1e-6,
                                   atol=1e-6)
        np.testing.assert_allclose(merged.m2, whole.m2, rtol=1e-4, atol=1e-3)


@_SET
@given(
    keys=st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=6),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    probe=st.text(alphabet="abcdef", min_size=1, max_size=6),
)
def test_sorted_keyindex_lookup_total(keys, probe):
    arr = np.array(sorted(keys), dtype=object)
    ki = SortedKeyIndex(arr)
    for i, k in enumerate(arr):
        assert ki.lookup(k) == i
    got = ki.lookup(probe)
    if probe in keys:
        assert arr[got] == probe
    else:
        assert got is None


@_SET
@given(
    groups=st.lists(
        st.lists(
            st.text(alphabet="xyz", min_size=1, max_size=5),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=6,
    ),
    probe=st.text(alphabet="xyz", min_size=1, max_size=5),
)
def test_grouped_keyindex_lookup_total(groups, probe):
    """Keys sorted within groups; duplicates across groups allowed — lookup
    returns SOME matching row (ref KeyIndex.scala:30-53)."""
    flat = []
    offsets = []
    for g in groups:
        g = sorted(set(g))
        flat.extend(g)
        offsets.append(len(flat))
    keys = np.array(flat, dtype=object)
    ki = GroupedKeyIndex(keys, np.asarray(offsets[:-1], np.int32))
    assert ki.num_groups == len(groups)
    for i in range(len(keys)):
        row = ki.lookup(keys[i])
        assert row is not None and keys[row] == keys[i]
    got = ki.lookup(probe)
    if probe in flat:
        # earliest-group match, like the reference's sequential group scan
        assert got == flat.index(probe)
    else:
        assert got is None


@_SET
@given(
    width=st.sampled_from([2, 4]),
    n=st.integers(1, 80),
    m=st.integers(1, 12),
    data=st.data(),
)
def test_pack_rows_roundtrip_property(width, n, m, data):
    """In-HBM row packing inverts for any (n, m, width)."""
    import jax.numpy as jnp

    from gulon_tpu.ops.scan import pack_rows, unpack_tile

    codes = np.asarray(
        data.draw(
            st.lists(
                st.lists(
                    st.integers(0, (1 << width) - 1),
                    min_size=m,
                    max_size=m,
                ),
                min_size=n,
                max_size=n,
            )
        ),
        dtype=np.uint8,
    )
    packed = pack_rows(jnp.asarray(codes), width)
    assert packed.shape == (n, -(-m * width // 8))
    got = np.asarray(unpack_tile(packed, m, width))
    np.testing.assert_array_equal(got, codes)


@_SET
@given(
    rows=st.lists(
        st.lists(
            st.floats(-100, 100, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_normalize_rows_property(rows):
    """Unit norms for nonzero rows; zero rows unchanged (no NaNs) —
    the Cosine ingest transform (ref MathUtils.normalize)."""
    import jax.numpy as jnp

    from gulon_tpu.ops.distance import normalize_rows

    x = np.asarray(rows, np.float32)
    out = np.asarray(normalize_rows(jnp.asarray(x)))
    assert not np.isnan(out).any()
    norms_in = np.linalg.norm(x, axis=1)
    norms_out = np.linalg.norm(out, axis=1)
    nz = norms_in > 1e-6
    np.testing.assert_allclose(norms_out[nz], 1.0, rtol=1e-4)
    # "unchanged" applies to exactly-zero rows; rows with tiny-but-nonzero
    # norms are legitimately normalized (implementation branches on > 0)
    zero = norms_in == 0
    np.testing.assert_array_equal(out[zero], x[zero])
