import numpy as np
import pytest

from generators import planted_clusters
from gulon_tpu.ops.pq import (
    PQConfig,
    code_width,
    subspace_bounds,
    train_product_quantizer,
)


def test_subspace_bounds_match_reference_rule():
    """Widths differ by <=1, partition the columns (Vectors.scala:91-103)."""
    for d in [1, 5, 12, 100, 300, 301, 317, 1024]:
        for m in [1, 2, 3, 7, 25]:
            if m > d:
                continue
            bounds = subspace_bounds(d, m)
            assert len(bounds) == m
            ideal = -(-d // m)
            num_large = m - (ideal * m - d)
            widths = [w for _, w in bounds]
            assert widths[:num_large] == [ideal] * num_large
            assert widths[num_large:] == [ideal - 1] * (m - num_large)
            assert sum(widths) == d
            starts = [s for s, _ in bounds]
            assert starts == list(np.cumsum([0] + widths[:-1]))


def test_code_width():
    assert code_width(1) == 0
    assert code_width(2) == 1
    assert code_width(256) == 8
    assert code_width(257) == 9
    assert code_width(65536) == 16


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(0)
    x, _, _ = planted_clusters(rng, 500, 10, 8, scale=0.3)
    pq = train_product_quantizer(
        x, PQConfig(num_clusters=16, num_quantizers=3, max_iters=25, seed=0,
                    block_rows=128)
    )
    return x, pq


def test_encode_decode_idempotent(trained):
    """decode(encode(decode(encode(x)))) == decode(encode(x))."""
    x, pq = trained
    codes = pq.encode(x)
    rec = np.asarray(pq.decode(codes))
    codes2 = pq.encode(rec)
    rec2 = np.asarray(pq.decode(codes2))
    np.testing.assert_allclose(rec, rec2, atol=1e-5)


def test_encode_picks_nearest_codeword(trained):
    x, pq = trained
    codes = np.asarray(pq.encode(x)).astype(np.int64)
    xs = np.asarray(pq.split(x))  # [m, n, dp]
    cb = np.asarray(pq.codebooks)  # [m, K, dp]
    for s in range(pq.num_quantizers):
        d = ((xs[s][:, None, :] - cb[s][None, :, :]) ** 2).sum(-1)
        # f32 matmul-trick argmin may differ from float64 brute force only
        # when two codewords are (near-)equidistant.
        chosen = d[np.arange(len(d)), codes[:, s]]
        best = d.min(axis=1)
        np.testing.assert_allclose(chosen, best, atol=1e-4, rtol=1e-4)


def test_reconstruction_norms(trained):
    x, pq = trained
    codes = pq.encode(x)
    rec = np.asarray(pq.decode(codes))
    norms = np.asarray(pq.reconstruction_norms(codes))
    np.testing.assert_allclose(norms, (rec ** 2).sum(-1), rtol=1e-4)


def test_lut_matches_bruteforce(trained):
    x, pq = trained
    q = x[:7]
    lut = np.asarray(pq.lut(q))  # [Q, m, K]
    qs = np.asarray(pq.split(q))  # [m, Q, dp]
    cb = np.asarray(pq.codebooks)
    for s in range(pq.num_quantizers):
        expected = ((qs[s][:, None, :] - cb[s][None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(lut[:, s, :], expected, atol=1e-3)


def test_more_clusters_lower_reconstruction_error():
    """Ref ProductQuantizerSpec:75-104 property."""
    rng = np.random.default_rng(5)
    x, _, _ = planted_clusters(rng, 400, 8, 6, scale=0.5)

    def err(k, m):
        pq = train_product_quantizer(
            x, PQConfig(num_clusters=k, num_quantizers=m, max_iters=12,
                        block_rows=128)
        )
        rec = np.asarray(pq.decode(pq.encode(x)))
        return float(((x - rec) ** 2).sum(-1).mean())

    assert err(32, 4) < err(4, 4)
    assert err(8, 8) < err(8, 2)


def test_uneven_subspace_split_roundtrip():
    """D not divisible by m: padding must stay exact."""
    rng = np.random.default_rng(11)
    x, _, _ = planted_clusters(rng, 300, 13, 4, scale=0.2)
    pq = train_product_quantizer(
        x, PQConfig(num_clusters=8, num_quantizers=4, max_iters=15,
                    block_rows=64)
    )
    assert [w for _, w in pq.bounds] == [4, 3, 3, 3]
    rec = np.asarray(pq.decode(pq.encode(x)))
    assert rec.shape == x.shape
    # padded coordinates never leak: error is bounded by quantization alone
    assert ((x - rec) ** 2).mean() < 1.0


def test_centroid_code_dot_matches_decode():
    """LUT-gather crdot == einsum over the decoded corpus (used by IVF
    builds/loads to avoid reconstructing the corpus)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2000, 37)).astype(np.float32)
    pq = train_product_quantizer(
        x, PQConfig(num_clusters=16, num_quantizers=5, max_iters=6)
    )
    codes = np.asarray(pq.encode(x))
    num_p = 13
    gids = np.sort(rng.integers(0, num_p, size=len(x))).astype(np.int32)
    cents = rng.normal(size=(num_p, 37)).astype(np.float32)
    fast = pq.centroid_code_dot(codes, cents, gids, chunk_rows=700)
    dec = np.asarray(pq.decode(jnp.asarray(codes)))
    ref = np.einsum("nd,nd->n", cents[gids], dec)
    assert np.abs(fast - ref).max() < 1e-4


def test_snap_bf16_default_and_opt_out():
    """Trained codebooks are bf16-representable by default (every scan
    strategy's hot matmul casts the decoded operand to bf16; snapping
    makes the reconstruction points exactly what kernels compute
    against). snap_bf16=False keeps the raw k-means means."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    x, _, _ = planted_clusters(rng, 400, 12, 6, scale=0.4)
    pq = train_product_quantizer(
        x, PQConfig(num_clusters=8, num_quantizers=3, max_iters=10, seed=1)
    )
    cb = np.asarray(pq.codebooks)
    snapped = np.asarray(
        jnp.asarray(cb).astype(jnp.bfloat16).astype(jnp.float32)
    )
    np.testing.assert_array_equal(cb, snapped)

    pq_raw = train_product_quantizer(
        x,
        PQConfig(
            num_clusters=8, num_quantizers=3, max_iters=10, seed=1,
            snap_bf16=False,
        ),
    )
    raw = np.asarray(pq_raw.codebooks)
    # raw means are generically NOT bf16-exact, and the snap of raw equals
    # the default codebooks (same training, snap applied after)
    assert not np.array_equal(
        raw,
        np.asarray(jnp.asarray(raw).astype(jnp.bfloat16).astype(jnp.float32)),
    )
    np.testing.assert_array_equal(
        cb,
        np.asarray(jnp.asarray(raw).astype(jnp.bfloat16).astype(jnp.float32)),
    )
