"""Protobuf persistence, wire-compatible with the reference index format.

Counterpart of the converters at reference ``Index.scala:147-207``,
``ProductQuantizer.scala:88-105`` and ``EncodedMatrix.scala:38-51``:

- codebooks serialize per quantizer with (start_index, dimension, centroids),
  padding stripped;
- codes serialize quantizer-major: one packed ``bytes`` blob per subquantizer
  holding that subquantizer's code for every row, bit-packed at the storage
  width from ``gulon_tpu.ops.coder``;
- ``GroupedIndex.offsets`` are the internal group boundaries
  (``centroids == offsets + 1`` invariant).

Derived device-side arrays (reconstruction norms, IVF row constants, group
ids) are not part of the wire format; they are rebuilt on load.
"""

from __future__ import annotations

import math
from typing import Union

import jax.numpy as jnp
import numpy as np

from gulon_tpu.models.flat import FlatIndex
from gulon_tpu.models.ivf import IVFIndex, LimitGroups, LimitVectors
from gulon_tpu.models.keyindex import GroupedKeyIndex, SortedKeyIndex
from gulon_tpu.models.metric import Metric
from gulon_tpu.ops import coder
from gulon_tpu.ops.pq import ProductQuantizer, code_dtype, subspace_bounds
from gulon_tpu.proto import index_pb2 as pb

AnyIndex = Union[FlatIndex, IVFIndex]


def _pq_to_proto(pq: ProductQuantizer) -> pb.ProductQuantizer:
    msg = pb.ProductQuantizer()
    msg.num_clusters = pq.num_clusters
    cb = np.asarray(pq.codebooks)
    for s, (start, width) in enumerate(pq.bounds):
        q = msg.quantizers.add()
        q.start_index = start
        q.dimension = width
        for row in cb[s, :, :width]:
            q.centroids.add().values.extend(row.tolist())
    return msg


def _pq_from_proto(msg: pb.ProductQuantizer) -> ProductQuantizer:
    bounds = tuple((q.start_index, q.dimension) for q in msg.quantizers)
    pad_width = max(w for _, w in bounds)
    k = msg.num_clusters
    m = len(bounds)
    cb = np.zeros((m, k, pad_width), np.float32)
    for s, q in enumerate(msg.quantizers):
        for j, cvec in enumerate(q.centroids):
            cb[s, j, : q.dimension] = np.asarray(cvec.values, np.float32)
    return ProductQuantizer(
        codebooks=jnp.asarray(cb), bounds=bounds, num_clusters=k
    )


def _codes_to_proto(codes: np.ndarray, num_clusters: int) -> pb.EncodedMatrix:
    n, m = codes.shape
    logical = max(1, math.ceil(math.log2(num_clusters))) if num_clusters > 1 else 0
    width = coder.storage_width(logical)
    msg = pb.EncodedMatrix()
    msg.code_width = width
    msg.length = n
    for s in range(m):
        msg.encodings.append(coder.pack(codes[:, s].astype(np.int64), width))
    return msg


def _codes_from_proto(msg: pb.EncodedMatrix, num_clusters: int) -> np.ndarray:
    n = msg.length
    cols = [
        coder.unpack(enc, n, msg.code_width) for enc in msg.encodings
    ]
    codes = np.stack(cols, axis=1) if cols else np.zeros((n, 0), np.int32)
    return codes.astype(code_dtype(num_clusters))


def index_to_proto(index: AnyIndex) -> pb.Index:
    msg = pb.Index()
    if isinstance(index, FlatIndex) and index.packed_width:
        # in-memory packed codes (pack_memory) are a runtime layout only;
        # the wire format is always logical [N, m] codes
        codes_np = np.asarray(index._unpacked_codes())
    else:
        codes_np = np.asarray(index.codes)
    if isinstance(index, FlatIndex):
        si = msg.sorted
        si.sorted_words.extend(str(w) for w in index.key_index.keys)
        si.vector_index.product_quantizer.CopyFrom(_pq_to_proto(index.pq))
        si.vector_index.data.CopyFrom(
            _codes_to_proto(codes_np, index.pq.num_clusters)
        )
        si.metric = index.metric.proto_value
        if index.rotation is not None:
            # gulon_tpu extension field (see index.proto): row-major
            # [D*D]; absent for plain-PQ indices, keeping their bytes
            # identical to the reference writer's
            si.rotation.values.extend(
                np.asarray(index.rotation, np.float32).reshape(-1).tolist()
            )
    elif isinstance(index, IVFIndex):
        gi = msg.grouped
        gi.grouped_words.extend(str(w) for w in index.key_index.keys)
        gi.vector_index.product_quantizer.CopyFrom(_pq_to_proto(index.pq))
        gi.vector_index.data.CopyFrom(
            _codes_to_proto(codes_np, index.pq.num_clusters)
        )
        gi.metric = index.metric.proto_value
        for row in np.asarray(index.centroids):
            gi.centroids.add().values.extend(row.tolist())
        gi.offsets.extend(
            int(o) for o in np.asarray(index.key_index.group_offsets)
        )
        gi.strategy = index.strategy.proto_value
        gi.limit = index.strategy.count
        if index.rotation is not None:
            # extension field: centroids/codebooks above are already in
            # the rotated basis, this records the basis change itself
            gi.rotation.values.extend(
                np.asarray(index.rotation, np.float32).reshape(-1).tolist()
            )
    else:
        raise TypeError(f"cannot serialize {type(index)!r}")
    return msg


def index_from_proto(msg: pb.Index) -> AnyIndex:
    which = msg.WhichOneof("implementation")
    if which == "sorted":
        si = msg.sorted
        pq = _pq_from_proto(si.vector_index.product_quantizer)
        codes = jnp.asarray(
            _codes_from_proto(si.vector_index.data, pq.num_clusters)
        )
        rotation = None
        if si.HasField("rotation") and len(si.rotation.values):
            d = pq.dimension
            rotation = jnp.asarray(
                np.asarray(si.rotation.values, np.float32).reshape(d, d)
            )
        return FlatIndex(
            _key_index=SortedKeyIndex(np.array(list(si.sorted_words), object)),
            pq=pq,
            codes=codes,
            recon_norms=pq.reconstruction_norms(codes),
            metric=Metric.from_proto(si.metric),
            rotation=rotation,
        )
    if which == "grouped":
        gi = msg.grouped
        pq = _pq_from_proto(gi.vector_index.product_quantizer)
        codes_np = _codes_from_proto(gi.vector_index.data, pq.num_clusters)
        codes = jnp.asarray(codes_np)
        offsets = np.asarray(list(gi.offsets), np.int32)
        n = codes_np.shape[0]
        centroids = np.stack(
            [np.asarray(c.values, np.float32) for c in gi.centroids]
        )
        # Rebuild derived arrays (group ids + the expanded-distance row
        # term). crdot comes from per-partition LUT gathers — O(n·m) work,
        # never decoding the corpus, so 10M-row indices load fast.
        bounds = np.concatenate([[0], offsets, [n]])
        group_ids = np.repeat(
            np.arange(len(bounds) - 1, dtype=np.int32), np.diff(bounds)
        )
        rnorm = np.asarray(pq.reconstruction_norms(codes))
        crdot = pq.centroid_code_dot(codes_np, centroids, group_ids)
        row_const = jnp.asarray(rnorm + 2.0 * crdot)
        if gi.strategy == pb.GroupedIndex.LIMIT_GROUPS:
            strategy = LimitGroups(gi.limit)
        else:
            strategy = LimitVectors(gi.limit)
        rotation = None
        if gi.HasField("rotation") and len(gi.rotation.values):
            d = pq.dimension
            rotation = jnp.asarray(
                np.asarray(gi.rotation.values, np.float32).reshape(d, d)
            )
        return IVFIndex(
            _key_index=GroupedKeyIndex(
                np.array(list(gi.grouped_words), object), offsets
            ),
            pq=pq,
            codes=codes,
            row_const=row_const,
            group_ids=jnp.asarray(group_ids),
            centroids=jnp.asarray(centroids),
            metric=Metric.from_proto(gi.metric),
            strategy=strategy,
            rotation=rotation,
        )
    raise ValueError("index proto has no implementation set")


def save_index(index, path) -> None:
    """Persist any index: PQ indices as reference-format protobuf,
    ExactIndex as npz (raw vectors have no reference wire format).
    Sharded indices persist their base — placement is runtime state
    (re-shard with ``shard_index``/``--mesh`` after loading)."""
    from gulon_tpu.models.exact import ExactIndex

    base = getattr(index, "base", None)
    if base is not None and hasattr(index, "mesh"):
        index = base
    if isinstance(index, ExactIndex):
        index.save(path)
        return
    data = index_to_proto(index).SerializeToString()
    with open(path, "wb") as f:
        f.write(data)


def load_index(path):
    """Load an index file of either format (sniffed by magic bytes):
    npz (zip, ``PK\\x03\\x04``) -> ExactIndex, anything else -> protobuf."""
    with open(path, "rb") as f:
        head = f.read(4)
        f.seek(0)
        if head == b"PK\x03\x04":
            from gulon_tpu.models.exact import ExactIndex

            return ExactIndex.load(f)
        msg = pb.Index()
        msg.ParseFromString(f.read())
    return index_from_proto(msg)
