"""Fused Pallas ADC kernel (interpret mode on CPU) + cached-scan strategy."""

import numpy as np
import pytest
import jax.numpy as jnp

from generators import planted_clusters, random_keys
from gulon_tpu.models.build import build_flat_index
from gulon_tpu.ops.pq import PQConfig, train_product_quantizer
from gulon_tpu.ops.scan import adc_scan_decode
from gulon_tpu.ops.pallas.adc import adc_scan_pallas


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(41)
    n, d = 5000, 16
    x = rng.normal(size=(n, d)).astype(np.float32)
    q = (x[:16] + rng.normal(0, 0.01, (16, d))).astype(np.float32)
    pq = train_product_quantizer(
        x, PQConfig(num_clusters=32, num_quantizers=4, max_iters=8)
    )
    codes = pq.encode(x)
    norms = pq.reconstruction_norms(codes)
    return x, q, pq, codes, norms


def test_pallas_matches_exact_scan(setup):
    x, q, pq, codes, norms = setup
    d_ref, i_ref = adc_scan_decode(
        jnp.asarray(q), pq.codebooks, codes, norms,
        bounds=pq.bounds, k=10,
        precision="highest", decode_impl="gather", topk_impl="exact",
    )
    d_pl, i_pl = adc_scan_pallas(
        jnp.asarray(q), pq.codebooks, codes, norms,
        bounds=pq.bounds, k=10, tile_rows=5120, interpret=True,
    )
    d_ref, i_ref, d_pl, i_pl = map(np.asarray, (d_ref, i_ref, d_pl, i_pl))
    # block-min selection: recall >= ~0.95 class; distances of agreeing
    # slots match up to bf16 matmul rounding
    recall = np.mean(
        [len(set(i_pl[qq]) & set(i_ref[qq])) / 10 for qq in range(len(q))]
    )
    # block-min keeps one winner per 128 rows; with duplicate-code ties the
    # chosen tie representative can differ from the exact scan's
    assert recall >= 0.85
    np.testing.assert_allclose(d_pl[:, 0], d_ref[:, 0], rtol=5e-2, atol=5e-2)
    assert np.all(np.diff(d_pl, axis=1) >= -1e-2)


def test_pallas_rejects_tiny_corpus(setup):
    """Block-min selection needs >= 256*k rows; tiny corpora are refused
    (FlatIndex falls back to the XLA scan)."""
    x, q, pq, codes, norms = setup
    with pytest.raises(ValueError):
        adc_scan_pallas(
            jnp.asarray(q[:2]), pq.codebooks, codes[:5], norms[:5],
            bounds=pq.bounds, k=10, interpret=True,
        )


def test_pallas_rejects_large_k_codes(setup):
    x, q, pq, codes, norms = setup
    big_cb = jnp.zeros((4, 2048, 4), jnp.float32)
    with pytest.raises(ValueError):
        adc_scan_pallas(
            jnp.asarray(q), big_cb, codes, norms,
            bounds=pq.bounds, k=10, interpret=True,
        )


def test_cached_strategy_matches_decode():
    rng = np.random.default_rng(7)
    n, d = 3000, 24
    x, _, _ = planted_clusters(rng, n, d, 8, scale=0.3)
    keys = random_keys(rng, n)
    index = build_flat_index(
        keys, x,
        pq_config=PQConfig(num_clusters=32, num_quantizers=6, max_iters=10),
    )
    q = x[:8]
    index.scan_strategy = "decode"
    a = index.batch_query(10, q)
    index.scan_strategy = "cached"
    b = index.batch_query(10, q)
    assert index.decoded_cache is not None  # lazily built
    for ra, rb in zip(a, b):
        np.testing.assert_allclose(
            ra.distances, rb.distances, rtol=2e-2, atol=1e-2
        )
        # same candidate sets modulo float ties
        assert len(set(ra.keys) & set(rb.keys)) >= 8


def test_pallas_high_dim_vmem_budget():
    """1024-dim corpora must pick tiles that fit VMEM (regression: the
    budget ignored the decode scratch and Mosaic ran out of VMEM)."""
    from gulon_tpu.ops.pallas.adc import _pick_tiles

    qt, t = _pick_tiles(num_q=1024, k_codes=256, mdp=1024)
    # scores [qt, t] f32 + dec scratch [t, mdp] bf16 + one-hot temps must
    # stay inside the 10 MB budget
    assert 4 * qt * t + 2 * t * 1024 + 2 * 2 * t * 256 <= 10 * 1024 * 1024


def test_pallas_pretransposed_matches(setup):
    x, q, pq, codes, norms = setup
    import numpy as _np

    d_a, i_a = adc_scan_pallas(
        jnp.asarray(q), pq.codebooks, codes, norms,
        bounds=pq.bounds, k=10, tile_rows=5120, interpret=True,
    )
    codes_t = jnp.asarray(_np.asarray(codes, _np.int32).T)
    d_b, i_b = adc_scan_pallas(
        jnp.asarray(q), pq.codebooks, codes_t, norms,
        bounds=pq.bounds, k=10, tile_rows=5120, interpret=True,
        num_rows=int(codes.shape[0]),
    )
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_b), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_b))


def test_pallas_value_knobs_agree(setup):
    """the default path and the LUT rescore select the same neighbour
    sets; rescore reports exact f32 ADC distances."""
    x, q, pq, codes, norms = setup
    kw = dict(bounds=pq.bounds, k=10, tile_rows=5120, interpret=True)
    d0, i0 = adc_scan_pallas(jnp.asarray(q), pq.codebooks, codes, norms, **kw)
    d2, i2 = adc_scan_pallas(
        jnp.asarray(q), pq.codebooks, codes, norms, rescore=True, **kw
    )
    i0, i2 = map(np.asarray, (i0, i2))
    overlap = np.mean(
        [len(set(i0[j]) & set(i2[j])) / 10 for j in range(len(i0))]
    )
    assert overlap >= 0.95, overlap
    # rescored distances match an exact f32 recompute on the decoded rows
    dec = np.asarray(pq.decode(codes))
    i2s = np.where(i2 < 0, 0, i2)
    exact = ((dec[i2s] - np.asarray(q)[:, None, :]) ** 2).sum(-1)
    d2 = np.asarray(d2)
    mask = np.isfinite(d2)
    np.testing.assert_allclose(d2[mask], exact[mask], rtol=1e-4, atol=1e-4)


def test_dense_scan_matches_exact():
    """Dense fused kernel (interpret) + f32 rescore == XLA exact scan."""
    from gulon_tpu.ops.pallas.dense import dense_scan_pallas, prepare_data
    from gulon_tpu.ops.distance import sq_norms
    from gulon_tpu.ops.scan import exact_scan

    rng = np.random.default_rng(5)
    n, d, k = 65536, 24, 8
    x = jnp.asarray(rng.normal(0, 1, (n, d)).astype(np.float32))
    q = jnp.asarray(rng.normal(0, 1, (40, d)).astype(np.float32))
    dt = prepare_data(x)
    d_k, i_k = dense_scan_pallas(
        q, dt, sq_norms(x), k=k, interpret=True,
        rescore_rows=x, rescore=4, tile_rows=1024,
    )
    d_e, i_e = exact_scan(q, x, k=k, precision="highest", topk_impl="exact")
    i_k, i_e = np.asarray(i_k), np.asarray(i_e)
    overlap = np.mean(
        [len(set(i_k[j]) & set(i_e[j])) / k for j in range(len(q))]
    )
    assert overlap >= 0.95, overlap
    # rescored distances are exact f32
    agree = i_k == i_e
    np.testing.assert_allclose(
        np.asarray(d_k)[agree], np.asarray(d_e)[agree], rtol=1e-4, atol=1e-4
    )
    # top-1 is guaranteed (the block winner of the true min's block)
    assert np.array_equal(i_k[:, 0], i_e[:, 0])


def test_exact_index_pallas_strategy():
    """ExactIndex scan_strategy='pallas' returns the XLA path's results."""
    from gulon_tpu.models.exact import build_exact_index

    rng = np.random.default_rng(6)
    n, d = 4096, 16
    x = rng.normal(0, 1, (n, d)).astype(np.float32)
    keys = np.array([f"k{i:06d}" for i in range(n)], dtype=object)
    index = build_exact_index(keys, x)
    index.topk_impl = "exact"
    d_x, i_x = index.query_arrays(5, x[:16])
    index.scan_strategy = "pallas"
    d_p, i_p = index.query_arrays(5, x[:16])
    assert np.array_equal(np.asarray(i_x)[:, 0], np.asarray(i_p)[:, 0])
    overlap = np.mean([
        len(set(np.asarray(i_x)[j]) & set(np.asarray(i_p)[j])) / 5
        for j in range(16)
    ])
    assert overlap >= 0.95, overlap


def test_packed_codes_t_dtypes_match(setup):
    """i8 (offset-encoded) / i16 / i32 pretransposed operands give
    identical results."""
    from gulon_tpu.ops.pallas.adc import pack_codes_t

    x, q, pq, codes, norms = setup
    n = np.asarray(codes).shape[0]
    kw = dict(bounds=pq.bounds, k=5, tile_rows=5120, interpret=True,
              num_rows=n)
    qd = jnp.asarray(q)
    c8 = pack_codes_t(codes, 256)
    c16 = pack_codes_t(codes, 1024)
    c32 = jnp.asarray(np.asarray(codes, np.int32).T)
    assert c8.dtype == jnp.int8 and c16.dtype == jnp.int16
    d8, i8 = adc_scan_pallas(qd, pq.codebooks, c8, norms, **kw)
    d16, i16 = adc_scan_pallas(qd, pq.codebooks, c16, norms, **kw)
    d32, i32 = adc_scan_pallas(qd, pq.codebooks, c32, norms, **kw)
    np.testing.assert_array_equal(np.asarray(i8), np.asarray(i32))
    np.testing.assert_array_equal(np.asarray(i16), np.asarray(i32))
    np.testing.assert_allclose(np.asarray(d8), np.asarray(d32))
    # rescore path decodes the offset encoding too
    dr, ir = adc_scan_pallas(
        qd, pq.codebooks, c8, norms, rescore=True, **kw
    )
    dr32, ir32 = adc_scan_pallas(
        qd, pq.codebooks, c32, norms, rescore=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(ir), np.asarray(ir32))
    np.testing.assert_allclose(np.asarray(dr), np.asarray(dr32), rtol=1e-6)


def test_probe_natural_mode_matches():
    """The natural-layout probe variant (benchmarks/adc_probes.py, dead
    end #3: in-kernel dec^T transpose + canonical matmul at deep
    contractions) stays correctness-tested: results match the XLA
    reference scan in interpret mode."""
    from benchmarks.adc_probes import adc_scan_probe

    rng = np.random.default_rng(9)
    n, d, m = 5000, 128, 16
    x = rng.normal(size=(n, d)).astype(np.float32)
    q = (x[:8] + rng.normal(0, 0.01, (8, d))).astype(np.float32)
    pq = train_product_quantizer(
        x, PQConfig(num_clusters=16, num_quantizers=m, max_iters=5)
    )
    codes = pq.encode(x)
    norms = pq.reconstruction_norms(codes)
    d_ref, i_ref = adc_scan_decode(
        jnp.asarray(q), pq.codebooks, codes, norms,
        bounds=pq.bounds, k=10,
        precision="highest", decode_impl="gather", topk_impl="exact",
    )
    d_pl, i_pl = adc_scan_probe(
        jnp.asarray(q), pq.codebooks, codes, norms,
        bounds=pq.bounds, k=10, tile_rows=5120, interpret=True,
        natural=True,
    )
    i_ref, i_pl = np.asarray(i_ref), np.asarray(i_pl)
    recall = np.mean(
        [len(set(i_pl[j]) & set(i_ref[j])) / 10 for j in range(len(q))]
    )
    assert recall >= 0.85, recall
    np.testing.assert_allclose(
        np.asarray(d_pl)[:, 0], np.asarray(d_ref)[:, 0],
        rtol=5e-2, atol=5e-2,
    )


def test_dense_operand_rescore_matches_f32():
    """Default rescore (bf16 operand + norm lanes) picks the same
    neighbours as the exact-f32 rescore; distances agree to bf16 class."""
    from gulon_tpu.ops.pallas.dense import dense_scan_pallas, prepare_data
    from gulon_tpu.ops.distance import sq_norms

    rng = np.random.default_rng(11)
    n, d, k = 65536, 24, 8
    x = jnp.asarray(rng.normal(0, 1, (n, d)).astype(np.float32))
    q = jnp.asarray(rng.normal(0, 1, (40, d)).astype(np.float32))
    dt = prepare_data(x)
    kw = dict(k=k, interpret=True, rescore=4, tile_rows=1024)
    d_f, i_f = dense_scan_pallas(q, dt, sq_norms(x), rescore_rows=x, **kw)
    d_o, i_o = dense_scan_pallas(q, dt, sq_norms(x), **kw)
    i_f, i_o = np.asarray(i_f), np.asarray(i_o)
    overlap = np.mean(
        [len(set(i_f[j]) & set(i_o[j])) / k for j in range(len(q))]
    )
    assert overlap >= 0.95, overlap
    agree = i_f == i_o
    np.testing.assert_allclose(
        np.asarray(d_o)[agree], np.asarray(d_f)[agree], rtol=2e-2, atol=2e-1
    )


def test_pallas_inf_norms_are_inert(setup):
    """+inf reconstruction norms (the sharded paths' row padding) must
    never win a block or leak NaN distances (regression: the v6 hi/lo
    norm split turned inf into NaN via inf - inf)."""
    x, q, pq, codes, norms = setup
    n = np.asarray(codes).shape[0]
    bad = jnp.asarray(
        np.where(np.arange(n) >= n - 200, np.inf, np.asarray(norms))
    )
    d_pl, i_pl = adc_scan_pallas(
        jnp.asarray(q), pq.codebooks, codes, bad,
        bounds=pq.bounds, k=10, tile_rows=5120, interpret=True,
    )
    d_pl, i_pl = np.asarray(d_pl), np.asarray(i_pl)
    assert np.all(np.isfinite(d_pl) | (i_pl == -1))
    assert not np.any(np.isnan(d_pl))
    assert np.all((i_pl < n - 200) | (i_pl == -1))


def test_cached_dense_route_matches_cached_scan():
    """The TPU cached strategy's dense-kernel route (_augment_cache +
    dense_scan_pallas over the decoded cache) returns the XLA
    cached_scan's results (interpret mode)."""
    from gulon_tpu.models.build import build_flat_index
    from gulon_tpu.models.flat import _augment_cache
    from gulon_tpu.ops.pallas.dense import dense_scan_pallas
    from gulon_tpu.ops.scan import cached_scan

    rng = np.random.default_rng(23)
    n, d, k = 40960, 16, 5
    x = rng.normal(size=(n, d)).astype(np.float32)
    keys = np.array([f"w{i:06d}" for i in range(n)], dtype=object)
    index = build_flat_index(
        keys, x,
        pq_config=PQConfig(num_clusters=16, num_quantizers=4, max_iters=6),
    )
    index.enable_cache(dtype=jnp.bfloat16)
    q = jnp.asarray(x[:16])
    q_pad = index._q_pad(q)
    d_x, i_x = cached_scan(
        q_pad.astype(index.decoded_cache.dtype), index.decoded_cache,
        index.recon_norms, k=k, topk_impl="exact",
    )
    aug = _augment_cache(index.decoded_cache, index.recon_norms)
    d_p, i_p = dense_scan_pallas(
        q_pad, aug, index.recon_norms, k=k, interpret=True,
        tile_rows=1024,
    )
    i_x, i_p = np.asarray(i_x), np.asarray(i_p)
    d_x, d_p = np.asarray(d_x), np.asarray(d_p)
    # tiny-K PQ collapses many rows onto identical codes -> exact
    # distance ties, where the packed tie-break picks a different (equally
    # valid) representative than the exact scan: compare DISTANCES
    np.testing.assert_allclose(d_p[:, 0], d_x[:, 0], rtol=2e-2, atol=2e-1)
    close = np.isclose(d_p, d_x, rtol=2e-2, atol=2e-1)
    assert close.mean() >= 0.9, close.mean()
    # and every returned id's distance matches its reported value
    dec = np.asarray(index.decoded_cache, np.float32)
    for j in range(16):
        truth = ((dec[i_p[j]] - np.asarray(q_pad)[j][None]) ** 2).sum(-1)
        np.testing.assert_allclose(d_p[j], truth, rtol=2e-2, atol=2e-1)


def test_flat_winners_recover_tie_heavy_recall():
    """winners>1 on the flat kernel path: a tie-heavy corpus (few
    distinct codes) puts several true top-k members in one 128-row
    block; extra ranked winners recover them. winners=2 recall vs the
    exact decode reference must be >= winners=1."""
    rng = np.random.default_rng(31)
    n, d, k = 60000, 16, 10
    # low-intrinsic: rows collapse onto few code words
    f = rng.normal(size=(4, d)).astype(np.float32)
    x = (rng.normal(size=(n, 4)) @ f + 0.02 * rng.normal(size=(n, d))
         ).astype(np.float32)
    q = jnp.asarray(x[:8])
    pq = train_product_quantizer(
        x, PQConfig(num_clusters=16, num_quantizers=4, max_iters=6)
    )
    codes = pq.encode(x)
    norms = pq.reconstruction_norms(codes)
    d_ref, i_ref = adc_scan_decode(
        q, pq.codebooks, codes, norms, bounds=pq.bounds, k=k,
        precision="highest", decode_impl="gather", topk_impl="exact",
    )
    kw = dict(
        bounds=pq.bounds, k=k, tile_rows=1024, interpret=True,
        rescore=True,  # exact f32 reported distances: the cutoff compare
        # must not be polluted by bf16 matmul noise
    )
    res = {}
    for w in (1, 2):
        d_w, i_w = adc_scan_pallas(
            q, pq.codebooks, codes, norms, winners=w, **kw
        )
        # compare by DISTANCE against the reference's kth distance: id
        # sets are arbitrary under massive code ties
        cut = np.asarray(d_ref)[:, -1] * (1 + 1e-4) + 1e-5
        d_w = np.asarray(d_w)
        res[w] = float((d_w <= cut[:, None]).mean())
    assert res[2] >= res[1] - 1e-9, res
    assert res[2] >= 0.9, res  # near-reference coverage with 2 winners


def test_epilogue_ties_break_toward_smaller_row_ids():
    """Exact-score ties must resolve toward SMALLER row ids, matching the
    reference heap's keep-earliest-row semantics (``TopKHeap.scala:69-79``)
    and the exact decode scan. Regression for the v7 epilogue ranking the
    lane-packed floats directly: lane bits break score ties by DESCENDING
    row-in-block for negative scores, which measured an 11% distance-cutoff
    recall loss on tie-heavy corpora on v5e (the true-neighbour mass of a
    self-query sits wherever the exact scan's smallest-id picks land)."""
    rng = np.random.default_rng(7)
    n, d, k = 8192, 16, 10
    x = rng.normal(size=(n, d)).astype(np.float32)
    proto = rng.normal(size=(d,)).astype(np.float32)
    # plant exact-duplicate rows in distinct 128-blocks at VARYING
    # row-in-block lanes (stride 520 = 512 + 8, so lane walks 8 per
    # duplicate — a lane-ordered tie-break would reorder them, a
    # column-ordered one keeps ascending ids): all share one code =>
    # bit-identical ADC scores
    dup_rows = np.arange(64, n - 512, 520)
    x[dup_rows] = proto
    pq = train_product_quantizer(
        x, PQConfig(num_clusters=16, num_quantizers=4, max_iters=6)
    )
    codes = pq.encode(x)
    norms = pq.reconstruction_norms(codes)
    q = jnp.asarray(proto[None, :])
    d_p, i_p = adc_scan_pallas(
        q, pq.codebooks, codes, norms, bounds=pq.bounds, k=k,
        tile_rows=1024, interpret=True,
    )
    i_p = np.asarray(i_p)[0]
    # every returned id must come from the EARLIEST duplicate blocks: the
    # k duplicates with smallest ids (one per 128-block, column order)
    expected = set(dup_rows[:k].tolist())
    got = set(i_p.tolist())
    assert got == expected, (sorted(got), sorted(expected))


def test_auto_rerank_degeneracy_stat():
    """rerank_factor=0 (default) resolves from the distinct-code stat:
    healthy corpora -> 1 (no over-fetch), code-collapsed corpora -> >1
    (VERDICT r3 item 3: the default config must express what its codes
    can without an operator knob)."""
    import dataclasses

    rng = np.random.default_rng(3)
    n, d = 4000, 16
    # healthy: full-rank gaussian rows -> nearly all code tuples distinct
    x = rng.normal(size=(n, d)).astype(np.float32)
    keys = random_keys(rng, n)
    cfg = PQConfig(num_clusters=32, num_quantizers=4, max_iters=8)
    healthy = build_flat_index(keys, x, pq_config=cfg)
    assert healthy.rerank_factor == 0  # the auto default
    assert healthy.resolved_rerank_factor() == 1

    # degenerate: every row is one of 64 repeated prototypes -> ~64
    # distinct code tuples over 4000 rows (dup ~ 62)
    protos = rng.normal(size=(64, d)).astype(np.float32)
    xd = protos[rng.integers(0, 64, n)]
    degen = build_flat_index(keys, xd, pq_config=cfg)
    rf = degen.resolved_rerank_factor()
    assert rf >= 4, rf
    # memoized, and reset by row updates
    assert degen._auto_rerank == rf
    degen2 = degen.remove([keys[0]])
    assert degen2._auto_rerank is None
    # explicit knob still wins
    forced = dataclasses.replace(degen, rerank_factor=2)
    assert forced.resolved_rerank_factor() == 2

    # end-to-end on the degenerate corpus: the default (auto) pallas scan
    # must reach the decode-scan ceiling under the distance protocol
    q = (xd[:8] + rng.normal(0, 0.01, (8, d))).astype(np.float32)
    ceiling = dataclasses.replace(degen, scan_strategy="decode",
                                  precision="highest", topk_impl="exact")
    d_c, _ = map(np.asarray, ceiling.query_arrays(10, q))
    degen.scan_strategy = "pallas"  # interpret mode on CPU
    d_p, i_p = map(np.asarray, degen.query_arrays(10, q))
    # every returned distance within the ceiling's kth cutoff (eps=1e-5:
    # the rescore's f32 LUT contraction differs from the ceiling scan's
    # by ~1 ulp on identical-code cohorts — the protocol's eps exists for
    # exactly this, Tests.scala:33-35)
    cutoff = d_c[:, -1] * (1 + 1e-5)
    assert (d_p <= cutoff[:, None]).mean() >= 0.99, (d_p, cutoff)


def test_probe_decode_mode_variants_match(setup):
    """The probe decode formulations (bf16 compare one-hot; gather-based
    table walk — benchmarks/adc_probes.py, dead ends #6/#7) return the
    production kernel's results in interpret mode."""
    from benchmarks.adc_probes import adc_scan_probe

    x, q, pq, codes, norms = setup
    q8 = jnp.asarray(q[:8])
    kw = dict(bounds=pq.bounds, k=10, tile_rows=5120, interpret=True)

    d_b, i_b = adc_scan_pallas(
        q8, pq.codebooks, codes, norms, center_scores=False, **kw
    )
    base = (np.asarray(d_b), np.asarray(i_b))
    for mode in ("bf16cmp", "take"):
        d_v, i_v = adc_scan_probe(
            q8, pq.codebooks, codes, norms, decode_mode=mode, **kw
        )
        d_v, i_v = np.asarray(d_v), np.asarray(i_v)
        np.testing.assert_allclose(d_v, base[0], rtol=2e-2, atol=2e-2)
        agree = np.mean(
            [len(set(i_v[j]) & set(base[1][j])) / 10 for j in range(8)]
        )
        assert agree == 1.0, (mode, agree)


def test_probe_pipe_schedule_matches_base(setup):
    """The software-pipelined probe schedule (pair-grid decode,
    benchmarks/adc_probes.py, dead end #5) returns bit-identical results
    to the production schedule in interpret mode, for winners 1 and 2
    and for odd row-tile counts (pair padding)."""
    from benchmarks.adc_probes import adc_scan_probe

    x, q, pq, codes, norms = setup  # n=5000 -> odd tile count at t=1024
    q8 = jnp.asarray(q[:8])
    kw = dict(bounds=pq.bounds, k=10, tile_rows=1024, interpret=True)

    for winners in (1, 2):
        d_b, i_b = adc_scan_pallas(
            q8, pq.codebooks, codes, norms,
            winners=winners, center_scores=False, **kw
        )
        d_p, i_p = adc_scan_probe(
            q8, pq.codebooks, codes, norms,
            winners=winners, pipe=True, **kw
        )
        np.testing.assert_allclose(
            np.asarray(d_p), np.asarray(d_b), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_b))


def test_centered_scores_report_true_adc_distances(setup):
    """Centered mode (the default): the matmul itself emits the full ADC
    distance (norms centered by their mean + per-query ``||q||^2 + mean``
    lanes), so reported non-rescore distances equal the exact f32 LUT
    distances of the returned rows within lane-pack coarsening + bf16
    operand noise. center_scores=False (the round-3 convention, query
    norm added in the epilogue) must return the same neighbours; the
    GULON_ADC_CENTER env only sets the argument's default and is
    resolved at call time (part of the jit cache key — no stale-cache
    footgun, ADVICE r4)."""
    import gulon_tpu.ops.pallas.adc as adc
    from gulon_tpu.ops.pq import _lut, split_subspaces

    x, q, pq, codes, norms = setup
    qd = jnp.asarray(q)
    d_c, i_c = adc.adc_scan_pallas(
        qd, pq.codebooks, codes, norms,
        bounds=pq.bounds, k=10, tile_rows=5120, interpret=True,
    )
    d_c, i_c = np.asarray(d_c), np.asarray(i_c)
    # exact f32 ADC distance of each returned row
    qs = split_subspaces(qd, pq.bounds, pq.pad_width)
    lut = np.asarray(_lut(qs, pq.codebooks))  # [Q, m, K]
    sel = np.asarray(codes)[i_c.reshape(-1)].reshape(*i_c.shape, -1)
    exact = np.take_along_axis(
        lut[np.arange(len(q))[:, None, None],
            np.arange(sel.shape[-1])[None, None, :], :],
        sel[..., None].astype(np.int64),
        axis=-1,
    )[..., 0].sum(-1)
    np.testing.assert_allclose(d_c, exact, rtol=3e-2, atol=3e-2)

    d_u, i_u = adc.adc_scan_pallas(
        qd, pq.codebooks, codes, norms,
        bounds=pq.bounds, k=10, tile_rows=5120, interpret=True,
        center_scores=False,
    )
    agree = np.mean(
        [len(set(np.asarray(i_u)[j]) & set(i_c[j])) / 10
         for j in range(len(q))]
    )
    assert agree >= 0.9, agree
    np.testing.assert_allclose(np.asarray(d_u), d_c, rtol=5e-2, atol=5e-2)

    # the env flips the DEFAULT at call time — same result as the
    # explicit argument, no cache clearing required
    import os

    os.environ["GULON_ADC_CENTER"] = "0"
    try:
        d_e, i_e = adc.adc_scan_pallas(
            qd, pq.codebooks, codes, norms,
            bounds=pq.bounds, k=10, tile_rows=5120, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(i_e), np.asarray(i_u))
        np.testing.assert_array_equal(np.asarray(d_e), np.asarray(d_u))
    finally:
        del os.environ["GULON_ADC_CENTER"]


def test_dense_i8_matches_bf16_under_exact_rescore():
    """The int8 dense kernel (2x MXU rate; norms ride as a base-127
    digit pair against constant (127, 1) query lanes) must match the
    bf16 kernel's recall under the same exact f32 rescore, and its
    rescored distances must be the true squared distances."""
    from benchmarks.common import low_rank_corpus_device
    from gulon_tpu.ops.distance import sq_norms
    from gulon_tpu.ops.pallas.dense import (
        dense_scan_pallas,
        dense_scan_pallas_i8,
        prepare_data,
        prepare_data_i8,
    )
    from gulon_tpu.ops.scan import exact_scan

    n, d, k = 20480, 64, 10
    x = low_rank_corpus_device(3, n, d, intrinsic=16, n_clusters=1024)
    rng = np.random.default_rng(2)
    qi = np.sort(rng.choice(n, 8, replace=False))
    q = jnp.take(x, jnp.asarray(qi), axis=0)
    _, i_ex = exact_scan(q, x, k=k)
    i_ex = np.asarray(i_ex)
    norms = sq_norms(x)

    _, ib = dense_scan_pallas(
        q, prepare_data(x, norms), norms, k=k, tile_rows=5120,
        interpret=True, rescore=4, rescore_rows=x,
    )
    data8, meta, _ = prepare_data_i8(x, norms)
    assert 1 <= meta.gain <= 64
    d8, i8 = dense_scan_pallas_i8(
        q, data8, meta, norms, k=k, tile_rows=5120, interpret=True,
        rescore=4, rescore_rows=x,
    )
    ib, i8, d8 = np.asarray(ib), np.asarray(i8), np.asarray(d8)
    r_bf = np.mean([len(set(ib[j]) & set(i_ex[j])) / k for j in range(8)])
    r_i8 = np.mean([len(set(i8[j]) & set(i_ex[j])) / k for j in range(8)])
    assert r_i8 >= r_bf - 0.05, (r_i8, r_bf)
    # exact-rescored distances are true squared L2 of the returned rows
    xn = np.asarray(x)
    qn_ = np.asarray(q)
    true = np.array(
        [[((xn[i_] - qn_[j]) ** 2).sum() for i_ in i8[j]] for j in range(8)]
    )
    np.testing.assert_allclose(d8, true, rtol=1e-3, atol=1e-3)

    # raw (no-rescore) path: dequantized reported distances track the
    # true distances within the documented quantization noise
    d8r, i8r = dense_scan_pallas_i8(
        q, data8, meta, norms, k=k, tile_rows=5120, interpret=True,
    )
    d8r, i8r = np.asarray(d8r), np.asarray(i8r)
    true_r = np.array(
        [[((xn[i_] - qn_[j]) ** 2).sum() for i_ in i8r[j]] for j in range(8)]
    )
    scale_ref = float(np.mean(true_r) + 1.0)
    # mean-based: individual rows carry gaussian quantization-noise
    # tails (query lanes coarsen with the gain), the rescore path above
    # is what reports exact distances
    assert np.abs(d8r - true_r).mean() <= 0.15 * scale_ref, (
        np.abs(d8r - true_r).mean(), scale_ref
    )
    assert np.all(np.diff(d8r, axis=1) >= -1e-3)
