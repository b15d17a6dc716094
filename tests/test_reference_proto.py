"""Parse gulon_tpu-written bytes under the VERBATIM reference schema.

The golden fixtures (test_golden.py) pin our writer's bytes against
hand-derived values, and test_serde.py parses them with *our* copy of the
schema. This module closes the remaining cross-schema gap reachable in this
image (no JVM is installed, so bytes written by the actual scalapb writer
cannot be produced): it compiles the unmodified reference proto file
(/root/reference/core/src/main/protobuf/index.proto) with protoc and proves
that a full index serialized by gulon_tpu parses under THAT descriptor with
every field intact.

The reference proto imports ``scalapb/scalapb.proto`` (codegen options only —
custom options never affect the message wire format). A minimal
name-resolving stub is supplied so protoc can compile the file; the stub's
option field numbers are irrelevant to the assertions below, which only
touch ``gulon.*`` message fields.

Both schemas declare ``package gulon``, so the reference-generated module
would collide with ``gulon_tpu.proto.index_pb2`` in protobuf's default
descriptor pool. The parse therefore runs in a clean subprocess that never
imports gulon_tpu.
"""

import json
import pathlib
import shutil
import subprocess
import sys
import tempfile

import numpy as np
import pytest

import gulon_tpu as g

REFERENCE_PROTO = pathlib.Path(
    "/root/reference/core/src/main/protobuf/index.proto"
)

SCALAPB_STUB = """\
syntax = "proto2";
package scalapb;
import "google/protobuf/descriptor.proto";
message ScalaPbOptions {
    optional string package_name = 1;
    optional bool flat_package = 2;
}
message FieldOptions {
    optional string type = 1;
    optional string scala_name = 2;
    optional string collection_type = 3;
}
extend google.protobuf.FileOptions {
    optional ScalaPbOptions options = 1020;
}
extend google.protobuf.FieldOptions {
    optional FieldOptions field = 1020;
}
"""

# Runs inside the subprocess: parse the blob with the reference-compiled
# module and dump a JSON summary of every field the assertions need.
EXTRACT = """\
import json, sys
sys.path.insert(0, sys.argv[1])
import index_pb2

blob = open(sys.argv[2], "rb").read()
idx = index_pb2.Index.FromString(blob)
kind = idx.WhichOneof("implementation")
out = {"kind": kind}
if kind == "grouped":
    gi = idx.grouped
    pq = gi.vector_index.product_quantizer
    out.update(
        metric=gi.metric,
        strategy=gi.strategy,
        limit=gi.limit,
        offsets=list(gi.offsets),
        num_centroids=len(gi.centroids),
        centroid0=list(gi.centroids[0].values),
        words=list(gi.grouped_words),
        num_clusters=pq.num_clusters,
        quantizer_starts=[q.start_index for q in pq.quantizers],
        quantizer_dims=[q.dimension for q in pq.quantizers],
        q0_centroid0=list(pq.quantizers[0].centroids[0].values),
        code_width=gi.vector_index.data.code_width,
        code_length=gi.vector_index.data.length,
        encodings=[
            enc.hex() for enc in gi.vector_index.data.encodings
        ],
    )
else:
    si = idx.sorted
    out.update(
        metric=si.metric,
        words=list(si.sorted_words),
        num_clusters=si.vector_index.product_quantizer.num_clusters,
        code_width=si.vector_index.data.code_width,
        code_length=si.vector_index.data.length,
        encodings=[
            enc.hex() for enc in si.vector_index.data.encodings
        ],
    )
print(json.dumps(out))
"""


@pytest.fixture(scope="module")
def reference_pb2_dir():
    if not REFERENCE_PROTO.exists():
        pytest.skip("reference proto not mounted")
    if shutil.which("protoc") is None:
        pytest.skip("protoc not available")
    tmp = tempfile.mkdtemp(prefix="refproto_")
    src = pathlib.Path(tmp, "src")
    (src / "scalapb").mkdir(parents=True)
    (src / "scalapb" / "scalapb.proto").write_text(SCALAPB_STUB)
    shutil.copy(REFERENCE_PROTO, src / "index.proto")
    out = pathlib.Path(tmp, "gen")
    out.mkdir()
    subprocess.run(
        [
            "protoc",
            f"-I{src}",
            f"--python_out={out}",
            str(src / "index.proto"),
            str(src / "scalapb" / "scalapb.proto"),
        ],
        check=True,
    )
    # Make the generated ``scalapb`` directory importable as a package.
    (out / "scalapb" / "__init__.py").touch()
    return out


def _parse_with_reference_schema(pb2_dir, blob_path):
    proc = subprocess.run(
        [sys.executable, "-c", EXTRACT, str(pb2_dir), str(blob_path)],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr
    return json.loads(proc.stdout)


def test_grouped_index_parses_under_reference_schema(
    reference_pb2_dir, tmp_path
):
    rng = np.random.default_rng(7)
    n, d = 600, 24
    x = rng.normal(0, 1, (n, d)).astype(np.float32)
    keys = np.array([f"w{i:04d}" for i in range(n)], dtype=object)
    idx = g.build_ivf_index(
        keys,
        x,
        metric=g.Metric.COSINE,
        num_partitions=6,
        strategy=g.LimitVectors(200),
        pq_config=g.PQConfig(num_clusters=16, num_quantizers=4, max_iters=8),
    )
    path = tmp_path / "ref.pb"
    g.save_index(idx, str(path))

    got = _parse_with_reference_schema(reference_pb2_dir, path)

    assert got["kind"] == "grouped"
    assert got["metric"] == 1  # COSINE = 1 (reference index.proto:33-36)
    assert got["strategy"] == 2  # LIMIT_VECTORS = 2 (index.proto:49-61)
    assert got["limit"] == 200
    assert got["num_clusters"] == 16
    assert got["code_width"] == 4
    assert got["code_length"] == n
    assert got["words"] == list(idx.key_index.keys)
    assert got["offsets"] == [
        int(o) for o in np.asarray(idx.key_index.group_offsets)
    ]
    np.testing.assert_allclose(
        got["centroid0"], np.asarray(idx.centroids[0]), rtol=1e-6
    )
    starts = got["quantizer_starts"]
    dims = got["quantizer_dims"]
    assert starts == [0, 6, 12, 18] and dims == [6, 6, 6, 6]
    np.testing.assert_allclose(
        got["q0_centroid0"],
        np.asarray(idx.pq.codebooks[0][0][: dims[0]]),
        rtol=1e-6,
    )
    # The packed per-subquantizer code planes must match our writer's bytes.
    from gulon_tpu.ops.coder import pack

    codes = np.asarray(idx.codes)
    expect = [pack(codes[:, q], 4).hex() for q in range(codes.shape[1])]
    assert got["encodings"] == expect


# ---------------------------------------------------------------------------
# Reverse direction: a blob CONSTRUCTED by the reference-descriptor-generated
# classes (field-by-field from raw arrays, never touching gulon_tpu's writer
# or packer) must load and serve. This simulates the reader side of
# ``Index.scala:176-207`` against bytes from a foreign writer — as foreign as
# an image with no JVM allows. The subprocess script reimplements the
# reference's byte layouts independently (Coder.scala:114-127 low-nibble-
# first 4-bit packing; Coder.scala:142-168 MSB-plane + packed-LSB for >8-bit).
# ---------------------------------------------------------------------------

FOREIGN_BUILD = """\
import sys
import numpy as np
sys.path.insert(0, sys.argv[1])
import index_pb2


def pack(ind, width):
    n = len(ind)
    if width == 8:
        return bytes(int(v) & 0xFF for v in ind)
    if width == 4:
        out = bytearray((n + 1) // 2)
        for i, v in enumerate(ind):
            out[i >> 1] |= (int(v) & 0xF) << ((i & 1) * 4)
        return bytes(out)
    if width == 12:
        msb = bytes((int(v) >> 4) & 0xFF for v in ind)
        lsb = bytearray((n + 1) // 2)
        for i, v in enumerate(ind):
            lsb[i >> 1] |= (int(v) & 0xF) << ((i & 1) * 4)
        return msb + bytes(lsb)
    raise ValueError(width)


z = np.load(sys.argv[2], allow_pickle=True)
codebooks = z["codebooks"]  # [m, K, dsub]
codes = z["codes"]          # [n, m]
keys = list(z["keys"])
width = int(z["width"])
m, K, dsub = codebooks.shape
n = codes.shape[0]

msg = index_pb2.Index()
if "centroids" in z:
    body = msg.grouped
    body.grouped_words.extend(str(w) for w in keys)
    for row in z["centroids"]:
        body.centroids.add().values.extend(row.tolist())
    body.offsets.extend(int(o) for o in z["offsets"])
    body.strategy = int(z["strategy"])
    body.limit = int(z["limit"])
else:
    body = msg.sorted
    body.sorted_words.extend(str(w) for w in keys)
body.metric = int(z["metric"])
pq = body.vector_index.product_quantizer
pq.num_clusters = K
for s in range(m):
    q = pq.quantizers.add()
    q.start_index = s * dsub
    q.dimension = dsub
    for row in codebooks[s]:
        q.centroids.add().values.extend(row.tolist())
data = body.vector_index.data
data.code_width = width
data.length = n
for s in range(m):
    data.encodings.append(pack(codes[:, s], width))
open(sys.argv[3], "wb").write(msg.SerializeToString())
"""


def _foreign_blob(pb2_dir, tmp_path, arrays):
    npz = tmp_path / "foreign_in.npz"
    np.savez(npz, **arrays)
    blob = tmp_path / "foreign.pb"
    proc = subprocess.run(
        [
            sys.executable, "-c", FOREIGN_BUILD,
            str(pb2_dir), str(npz), str(blob),
        ],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    return blob


def _numpy_adc_oracle(codebooks, codes, queries, k, add=None):
    """Independent oracle: exact top-k over decoded vectors.

    ``add``: per-row vector to add back after decode (IVF centroid)."""
    m, _K, dsub = codebooks.shape
    n = codes.shape[0]
    decoded = np.concatenate(
        [codebooks[s][codes[:, s]] for s in range(m)], axis=1
    ).astype(np.float64)
    if add is not None:
        decoded = decoded + add
    d = (
        np.sum(decoded**2, axis=1)[None, :]
        - 2.0 * queries.astype(np.float64) @ decoded.T
        + np.sum(queries.astype(np.float64) ** 2, axis=1)[:, None]
    )
    ids = np.argsort(d, axis=1, kind="stable")[:, :k]
    return ids, np.take_along_axis(d, ids, axis=1)


@pytest.mark.parametrize(
    "width,K,m",
    [(8, 256, 4), (4, 16, 6), (12, 4096, 3)],
    ids=["w8", "w4", "w12"],
)
def test_foreign_written_flat_blob_loads_and_serves(
    reference_pb2_dir, tmp_path, width, K, m
):
    rng = np.random.default_rng(width)
    dsub = 4
    codebooks = rng.normal(0, 1, (m, K, dsub)).astype(np.float32)
    codes = rng.integers(0, K, (320, m)).astype(np.int64)
    keys = np.array([f"fw{i:04d}" for i in range(320)], dtype=object)
    blob = _foreign_blob(
        reference_pb2_dir, tmp_path,
        dict(codebooks=codebooks, codes=codes, keys=keys,
             width=width, metric=0),
    )

    idx = g.load_index(str(blob))
    queries = rng.normal(0, 1, (8, m * dsub)).astype(np.float32)
    ids_o, d_o = _numpy_adc_oracle(codebooks, codes, queries, k=5)
    for qi in range(len(queries)):
        res = idx.query(5, queries[qi])
        got_rows = [int(w[2:]) for w in res.keys]
        # same decoded set scanned by both: id sets must agree up to exact
        # distance ties, distances to 1e-3 (f32 scan vs f64 oracle)
        np.testing.assert_allclose(
            np.sort(res.distances), np.sort(d_o[qi]), rtol=1e-3, atol=1e-3
        )
        assert len(set(got_rows) & set(ids_o[qi].tolist())) >= 4


def test_foreign_written_grouped_blob_loads_and_serves(
    reference_pb2_dir, tmp_path
):
    rng = np.random.default_rng(99)
    m, K, dsub, n, P = 4, 16, 4, 300, 5
    d = m * dsub
    codebooks = (rng.normal(0, 0.2, (m, K, dsub))).astype(np.float32)
    codes = rng.integers(0, K, (n, m)).astype(np.int64)
    centroids = rng.normal(0, 3.0, (P, d)).astype(np.float32)
    sizes = [60] * P
    offsets = np.cumsum(sizes)[:-1]
    group_of = np.repeat(np.arange(P), sizes)
    keys = np.array([f"fg{i:04d}" for i in range(n)], dtype=object)
    blob = _foreign_blob(
        reference_pb2_dir, tmp_path,
        dict(codebooks=codebooks, codes=codes, keys=keys, width=4,
             metric=0, centroids=centroids, offsets=offsets,
             strategy=0, limit=P),  # LIMIT_GROUPS probing ALL partitions
    )

    idx = g.load_index(str(blob))
    queries = centroids[[1, 3]] + rng.normal(0, 0.3, (2, d)).astype(
        np.float32
    )
    ids_o, d_o = _numpy_adc_oracle(
        codebooks, codes, queries, k=5, add=centroids[group_of]
    )
    for qi in range(len(queries)):
        res = idx.query(5, queries[qi])
        got_rows = [int(w[2:]) for w in res.keys]
        np.testing.assert_allclose(
            np.sort(res.distances), np.sort(d_o[qi]), rtol=1e-3, atol=1e-3
        )
        assert len(set(got_rows) & set(ids_o[qi].tolist())) >= 4


def test_round_trip_through_reference_schema_is_identity(
    reference_pb2_dir, tmp_path
):
    """Reserialize under the reference descriptor; our reader must accept it
    and produce an identical index (field-number/type agreement in both
    directions, not just parseability)."""
    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, (300, 16)).astype(np.float32)
    keys = np.array([f"k{i:03d}" for i in range(300)], dtype=object)
    idx = g.build_flat_index(
        keys,
        x,
        pq_config=g.PQConfig(num_clusters=8, num_quantizers=4, max_iters=6),
    )
    path = tmp_path / "ours.pb"
    g.save_index(idx, str(path))

    reser = tmp_path / "reser.pb"
    script = (
        "import sys; sys.path.insert(0, sys.argv[1]);"
        "import index_pb2;"
        "i = index_pb2.Index.FromString(open(sys.argv[2],'rb').read());"
        "open(sys.argv[3],'wb').write(i.SerializeToString())"
    )
    subprocess.run(
        [
            sys.executable,
            "-c",
            script,
            str(reference_pb2_dir),
            str(path),
            str(reser),
        ],
        check=True,
    )
    back = g.load_index(str(reser))
    q = x[17]
    a = idx.query(5, q)
    b = back.query(5, q)
    assert list(a.keys) == list(b.keys)
    np.testing.assert_allclose(a.distances, b.distances, rtol=1e-6)
