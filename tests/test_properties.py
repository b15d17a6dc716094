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


@settings(max_examples=25, deadline=None)
@given(
    # fixed shape grid (edge cases pinned): every drawn (n, m) hits a
    # cached XLA program — free-ranging integers made hypothesis compile
    # a fresh program per example (~17 s of pure compilation)
    width=st.sampled_from([2, 4]),
    n=st.sampled_from([1, 3, 8, 80]),
    m=st.sampled_from([1, 5, 12]),
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
    # fixed row-count grid: one cached XLA program per shape (see
    # test_pack_rows_roundtrip_property)
    n_rows=st.sampled_from([1, 2, 7, 20]),
    data=st.data(),
)
def test_normalize_rows_property(n_rows, data):
    rows = data.draw(
        st.lists(
            st.lists(
                st.floats(-100, 100, allow_nan=False, width=32),
                min_size=4,
                max_size=4,
            ),
            min_size=n_rows,
            max_size=n_rows,
        )
    )
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


@given(
    num_p=st.integers(1, 12),
    cap=st.integers(1, 50),
    data=st.data(),
)
@settings(max_examples=30, deadline=None)
def test_balanced_split_capacity_property(num_p, cap, data):
    """_split_oversized_partitions: every output partition <= cap rows,
    all rows kept, centroid count == partition count."""
    from gulon_tpu.models.build import _split_oversized_partitions

    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    sizes = [data.draw(st.integers(0, 4 * cap)) for _ in range(num_p)]
    n = sum(sizes)
    if n == 0:
        return
    d = 4
    x = rng.normal(0, 1, (n, d)).astype(np.float32)
    assignments = np.repeat(np.arange(num_p), sizes)
    cents = rng.normal(0, 1, (num_p, d)).astype(np.float32)
    new_a, new_c = _split_oversized_partitions(
        lambda rows: x[rows], assignments, cents, cap, seed=0
    )
    assert len(new_a) == n
    counts = np.bincount(new_a, minlength=len(new_c))
    assert counts.max() <= cap
    assert counts.sum() == n
    assert new_a.max() < len(new_c)


@given(
    k_codes=st.sampled_from([16, 256, 300, 1024, 40000]),
    n=st.integers(1, 64),
    m=st.integers(1, 6),
    data=st.data(),
)
@settings(max_examples=30, deadline=None)
def test_pack_codes_t_roundtrip_property(k_codes, n, m, data):
    """pack_codes_t: minimal dtype, exact roundtrip of code values."""
    from gulon_tpu.ops.pallas.adc import pack_codes_t

    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    codes = rng.integers(0, k_codes, (n, m))
    packed = np.asarray(pack_codes_t(codes, k_codes))
    assert packed.shape == (m, n)
    if k_codes <= 256:
        assert packed.dtype == np.int8
        recovered = packed.astype(np.int32) + 128
    elif k_codes <= 32768:
        assert packed.dtype == np.int16
        recovered = packed.astype(np.int32)
    else:
        assert packed.dtype == np.int32
        recovered = packed
    np.testing.assert_array_equal(recovered.T, codes)


@given(
    npad_blocks=st.integers(1, 40),
    w=st.integers(1, 4),
    num_q=st.sampled_from([1, 8, 512, 1024]),
)
@settings(max_examples=40, deadline=None)
def test_winner_column_map_property(npad_blocks, w, num_q):
    """The static winner-column -> block map matches a brute-force walk of
    the kernel's output layout (per row tile: w groups of nblk blocks)."""
    from gulon_tpu.ops.pallas.adc import block_layout

    npad = npad_blocks * 128
    _, t, n_rt, nblk = block_layout(num_q, 256, 104, npad, winners=w)
    col = np.arange(n_rt * w * nblk, dtype=np.int64)
    col_blk = (col // (w * nblk)) * nblk + (col % (w * nblk)) % nblk
    # brute force: tile r writes w*nblk columns; rank g of block j lands
    # at column r*(w*nblk) + g*nblk + j and refers to block r*nblk + j
    expect = np.empty_like(col)
    i = 0
    for r in range(n_rt):
        for g in range(w):
            for j in range(nblk):
                expect[i] = r * nblk + j
                i += 1
    np.testing.assert_array_equal(col_blk, expect)
