"""Product quantization: per-subspace codebooks, trained simultaneously.

TPU-native counterpart of reference ``ProductQuantizer.scala`` +
``Vectors.scala``:

- the subspace decomposition reproduces ``Vectors.subvectors`` exactly
  (``Vectors.scala:91-103``): with ``ideal = ceil(D/m)``, the first
  ``m - (ideal*m - D)`` subspaces get ``ideal`` dims, the rest ``ideal - 1``;
- subspaces are zero-padded to a common width and stacked ``[m, n, dsub]``,
  so all m codebooks train in ONE jitted, vmapped Lloyd loop instead of m
  thread-pool tasks (``ProductQuantizer.scala:130-145``). Zero padding is
  exact: padded coordinates contribute nothing to inner products or norms;
- encode is a vmapped blocked argmin producing an ``[n, m]`` unsigned code
  matrix (``ProductQuantizer.scala:25-35``); decode gathers codebook rows
  (``ProductQuantizer.scala:37-78``);
- ``lut`` builds the ADC lookup table ``||q_sub - c||^2`` for all
  (query, subquantizer, centroid) triples (``Index.scala:352-383``) as one
  batched einsum.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gulon_tpu.ops.distance import sq_norms
from gulon_tpu.ops.kmeans import KMeansConfig, _assign_blocked, fit_kmeans


def subspace_bounds(dimension: int, num_quantizers: int) -> Tuple[Tuple[int, int], ...]:
    """(start, width) of each subspace; matches ``Vectors.scala:91-103``."""
    if not 0 < num_quantizers <= dimension:
        raise ValueError(
            f"need 0 < m={num_quantizers} <= d={dimension}"
        )
    ideal = -(-dimension // num_quantizers)
    num_large = num_quantizers - (ideal * num_quantizers - dimension)
    bounds = []
    start = 0
    for i in range(num_quantizers):
        width = ideal if i < num_large else ideal - 1
        bounds.append((start, width))
        start += width
    assert start == dimension
    return tuple(bounds)


def code_dtype(num_clusters: int):
    if num_clusters <= 256:
        return jnp.uint8
    if num_clusters <= 65536:
        return jnp.uint16
    raise ValueError(f"num_clusters {num_clusters} > 65536 unsupported")


def code_width(num_clusters: int) -> int:
    """Logical bits per code: ``ceil(log2(k))`` (``ProductQuantizer.scala:11-16``)."""
    return max(0, math.ceil(math.log2(num_clusters))) if num_clusters > 1 else 0


@functools.partial(jax.jit, static_argnames=("bounds", "pad_width"))
def split_subspaces(x: jax.Array, bounds, pad_width: int) -> jax.Array:
    """``[n, D] -> [m, n, pad_width]`` zero-padded subspace stack."""
    parts = []
    for start, width in bounds:
        p = x[:, start : start + width]
        if width < pad_width:
            p = jnp.pad(p, ((0, 0), (0, pad_width - width)))
        parts.append(p)
    return jnp.stack(parts, axis=0)


class PQConfig(NamedTuple):
    """Mirrors ``ProductQuantizer.Config`` (``ProductQuantizer.scala:107-111``)."""

    num_clusters: int = 256
    num_quantizers: int = 25
    max_iters: int = 100
    seed: int = 0
    block_rows: int = 65536
    # Training/encode matmul precision; see KMeansConfig.precision.
    precision: str = "default"
    # Optional row subsample for codebook training (the reference always
    # trains on every row; a large sample is statistically equivalent and
    # keeps HBM bounded for huge corpora).
    train_sample: Optional[int] = None
    # Codebook seeding: "sample" (reference-faithful uniform rows) or
    # "kmeans++" (D^2-weighted; see KMeansConfig.init).
    init: str = "sample"
    # Snap trained centroids to bf16-representable values (default on, a
    # TPU-native choice): every scan strategy's hot matmul casts the
    # decoded operand to bf16, so snapping makes the reconstruction
    # points EXACTLY what the kernels compute against — the decode-
    # operand rounding noise class vanishes and the f32 "decode ceiling"
    # becomes achievable by the fused kernel by construction. The snap
    # moves each centroid by <= 2^-9 relative, orders of magnitude under
    # the PQ quantization error itself (measured no recall change vs
    # exact ground truth). Wire format unaffected (snapped floats are
    # ordinary f32; loaded foreign indices keep their exact centroids).
    snap_bf16: bool = True


@dataclasses.dataclass(frozen=True)
class ProductQuantizer:
    """Trained PQ: padded stacked codebooks + subspace geometry."""

    codebooks: jax.Array  # [m, K, pad_width] f32, zero-padded
    bounds: Tuple[Tuple[int, int], ...]  # (start, width) per subspace
    num_clusters: int

    @property
    def num_quantizers(self) -> int:
        return len(self.bounds)

    @property
    def dimension(self) -> int:
        return sum(w for _, w in self.bounds)

    @property
    def pad_width(self) -> int:
        return int(self.codebooks.shape[2])

    @property
    def dtype_codes(self):
        return code_dtype(self.num_clusters)

    @property
    def code_bits(self) -> int:
        return code_width(self.num_clusters)

    def cnorms(self) -> jax.Array:
        """Squared norms of codebook entries: ``[m, K]``."""
        return sq_norms(self.codebooks)

    def split(self, x: jax.Array) -> jax.Array:
        return split_subspaces(
            jnp.asarray(x, jnp.float32), self.bounds, self.pad_width
        )

    def encode(
        self, x, block_rows: int = 65536, precision: str = "default"
    ) -> jax.Array:
        """``[n, D] -> [n, m]`` nearest-codeword indices per subspace."""
        xs = self.split(x)
        return _encode_stacked(xs, self.codebooks, block_rows, precision).astype(
            self.dtype_codes
        )

    def decode(self, codes: jax.Array) -> jax.Array:
        """``[n, m] -> [n, D]`` reconstruction (``ProductQuantizer.scala:37-78``)."""
        return _decode(codes, self.codebooks, self.bounds)

    def reconstruction_norms(self, codes: jax.Array) -> jax.Array:
        """``||decode(codes)||^2`` per row via codeword-norm gathers: ``[n]``.

        Valid because subspaces are orthogonal coordinate ranges, so the
        squared norm is the sum of per-subspace codeword norms.
        """
        return _recon_norms(codes, self.cnorms())

    def lut(self, queries: jax.Array) -> jax.Array:
        """ADC lookup table ``[Q, m, K]`` of ``||q_sub - c||^2``."""
        qs = self.split(queries)  # [m, Q, dp]
        return _lut(qs, self.codebooks)

    def centroid_code_dot(
        self,
        codes,
        centroids,
        group_ids,
        chunk_rows: int = 1 << 20,
    ) -> np.ndarray:
        """``<centroids[group_ids[i]], decode(codes[i])>`` per row: ``[n]``.

        Computed WITHOUT decoding the corpus: per-partition LUTs
        ``lut[p, m, K] = <centroid_p restricted to subspace m, codebook[m, K]>``
        are built for the partition range each row chunk touches, then the
        dot is ``sum_m lut[g_i, m, codes[i, m]]`` — one [n, m] gather instead
        of an [n, D] reconstruction. Assumes the grouped row layout (rows of
        a partition contiguous, ``group_ids`` nondecreasing), so a chunk's
        partition range stays narrow.
        """
        codes = np.asarray(codes)
        gids = np.asarray(group_ids, np.int32)
        cs = self.split(jnp.asarray(centroids))  # [m, P, dp]
        n = codes.shape[0]
        out = np.empty(n, np.float32)
        num_p = int(cs.shape[1])
        for start in range(0, n, chunk_rows):
            sl = slice(start, min(start + chunk_rows, n))
            g0 = int(gids[sl].min())
            # pad the partition span to a power of two so chunk shapes (and
            # therefore jit traces) stay bounded regardless of how partition
            # boundaries fall across chunks
            span = int(gids[sl].max()) + 1 - g0
            pc = 1
            while pc < span:
                pc *= 2
            g0 = min(g0, num_p - pc) if pc <= num_p else 0
            pc = min(pc, num_p)
            out[sl] = np.asarray(
                _centroid_code_dot_chunk(
                    jnp.asarray(codes[sl]),
                    jnp.asarray(gids[sl] - g0),
                    jax.lax.slice_in_dim(cs, g0, g0 + pc, axis=1),
                    self.codebooks,
                )
            )
        return out


@functools.partial(jax.jit, static_argnames=("block_rows", "precision"))
def _encode_stacked(
    xs: jax.Array, codebooks: jax.Array, block_rows: int,
    precision: str = "default",
):
    assigns = jax.vmap(
        lambda x, c: _assign_blocked(x, c, block_rows, precision)
    )(xs, codebooks)  # [m, n]
    return assigns.T  # [n, m]


@functools.partial(jax.jit, static_argnames=("bounds",))
def _decode(codes: jax.Array, codebooks: jax.Array, bounds) -> jax.Array:
    codes = codes.astype(jnp.int32)
    parts = []
    for s, (_, width) in enumerate(bounds):
        parts.append(codebooks[s, codes[:, s], :width])
    return jnp.concatenate(parts, axis=1)


@jax.jit
def _recon_norms(codes: jax.Array, cnorms: jax.Array) -> jax.Array:
    codes = codes.astype(jnp.int32)
    # cnorms [m, K]; gather per subspace and sum.
    gathered = jax.vmap(lambda cn, c: cn[c], in_axes=(0, 1))(cnorms, codes)
    return jnp.sum(gathered, axis=0)


@jax.jit
def _centroid_code_dot_chunk(
    codes: jax.Array,  # [R, m] uint
    gid_rel: jax.Array,  # [R] i32, relative to the chunk's first partition
    cs_chunk: jax.Array,  # [m, Pc, dp] centroid subspace stack
    codebooks: jax.Array,  # [m, K, dp]
) -> jax.Array:
    lut = jnp.einsum(
        "mpd,mkd->pmk",
        cs_chunk,
        codebooks,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Pc, m, K]
    m = codes.shape[1]
    return jnp.sum(
        lut[
            gid_rel[:, None],
            jnp.arange(m, dtype=jnp.int32)[None, :],
            codes.astype(jnp.int32),
        ],
        axis=1,
    )


@jax.jit
def _lut(qs: jax.Array, codebooks: jax.Array) -> jax.Array:
    qn = sq_norms(qs)  # [m, Q]
    cn = sq_norms(codebooks)  # [m, K]
    ip = jnp.einsum(
        "mqd,mkd->mqk",
        qs,
        codebooks,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    lut = qn[:, :, None] + cn[:, None, :] - 2.0 * ip
    return jnp.transpose(lut, (1, 0, 2))  # [Q, m, K]


def train_product_quantizer(
    x,
    config: PQConfig,
    report_fn=None,
    mesh=None,
) -> ProductQuantizer:
    """Train per-subspace codebooks (``ProductQuantizer.scala:121-153``).

    Subspace i's initialization derives from ``fold_in(seed, i)`` — a key
    depending only on (seed, subspace index), the counterpart of the
    reference seeding each subspace's k-means with its index
    (``ProductQuantizer.scala:140``).

    Device-resident input stays on device (no host round-trip — host<->device
    transfers can be the bottleneck for multi-GB corpora); host input is
    subsampled host-side before the transfer.
    """
    on_device = isinstance(x, jax.Array)
    if not on_device:
        x = np.asarray(x, np.float32)
    n, d = x.shape
    bounds = subspace_bounds(d, config.num_quantizers)
    pad_width = max(w for _, w in bounds)

    train_x = x
    if config.train_sample is not None and config.train_sample < n:
        if on_device:
            key = jax.random.key(config.seed)
            idx = jax.random.choice(
                key, n, (config.train_sample,), replace=False
            )
            train_x = jnp.take(x, jnp.sort(idx), axis=0)
        else:
            rng = np.random.default_rng(config.seed)
            idx = rng.choice(n, size=config.train_sample, replace=False)
            train_x = x[np.sort(idx)]

    xs = split_subspaces(jnp.asarray(train_x), bounds, pad_width)
    kmeans_cfg = KMeansConfig(
        k=config.num_clusters,
        max_iters=config.max_iters,
        seed=config.seed,
        block_rows=config.block_rows,
        precision=config.precision,
        init=config.init,
    )
    if mesh is not None:
        from gulon_tpu.parallel.ops import sharded_fit_kmeans

        res = sharded_fit_kmeans(np.asarray(xs), kmeans_cfg, mesh)
    else:
        res = fit_kmeans(xs, kmeans_cfg, report_fn=report_fn)
    centroids = res.centroids
    if config.snap_bf16:
        centroids = centroids.astype(jnp.bfloat16).astype(jnp.float32)
    return ProductQuantizer(
        codebooks=centroids,
        bounds=bounds,
        num_clusters=config.num_clusters,
    )
