"""gulon_tpu — a TPU-native (JAX/XLA/Pallas) approximate-nearest-neighbour framework.

A from-scratch rebuild of the capabilities of the JVM reference library
``tixxit/gulon`` (product-quantization ANN indices over keyed embedding
vectors), redesigned idiomatically for TPUs:

- k-means codebook training = batched Lloyd iterations on the MXU
  (assignment is one matmul + argmin, the update is a blocked one-hot matmul),
- product-quantizer training is vmapped across subspaces (all codebooks train
  simultaneously in one jitted loop),
- queries use asymmetric distance computation (ADC) re-expressed in MXU form:
  per-tile gather-decode of PQ codes followed by a query x tile matmul with
  precomputed reconstruction norms (mathematically identical to the classic
  per-query LUT scan, which is also provided),
- indices shard row-wise across a ``jax.sharding.Mesh`` with per-shard top-k
  merged via all-gather over ICI.

Reference parity map lives in SURVEY.md; each module cites the reference
file/lines whose behavior it reproduces.
"""

__version__ = "0.1.0"

_EXPORTS = {
    "SummaryStats": "gulon_tpu.ops.stats",
    "KMeansConfig": "gulon_tpu.ops.kmeans",
    "fit_kmeans": "gulon_tpu.ops.kmeans",
    "PQConfig": "gulon_tpu.ops.pq",
    "ProductQuantizer": "gulon_tpu.ops.pq",
    "train_product_quantizer": "gulon_tpu.ops.pq",
    "Metric": "gulon_tpu.models.metric",
    "Index": "gulon_tpu.models.index",
    "Result": "gulon_tpu.models.index",
    "FlatIndex": "gulon_tpu.models.flat",
    "IVFIndex": "gulon_tpu.models.ivf",
    "LimitGroups": "gulon_tpu.models.ivf",
    "LimitVectors": "gulon_tpu.models.ivf",
    "build_flat_index": "gulon_tpu.models.build",
    "build_ivf_index": "gulon_tpu.models.build",
    "train_opq": "gulon_tpu.ops.opq",
    "reconstruction_mse": "gulon_tpu.ops.opq",
    "build_flat_index_streaming": "gulon_tpu.models.streaming",
    "build_ivf_index_streaming": "gulon_tpu.models.streaming",
    "Word2VecStream": "gulon_tpu.utils.native",
    "export_serving": "gulon_tpu.utils.aot",
    "save_serving": "gulon_tpu.utils.aot",
    "load_serving": "gulon_tpu.utils.aot",
    "AOTServing": "gulon_tpu.utils.aot",
    "ExactIndex": "gulon_tpu.models.exact",
    "build_exact_index": "gulon_tpu.models.exact",
    "WordVectors": "gulon_tpu.utils.word2vec",
    "read_word2vec": "gulon_tpu.utils.word2vec",
    "read_word2vec_path": "gulon_tpu.utils.word2vec",
    "write_word2vec": "gulon_tpu.utils.word2vec",
    "read_word2vec_bin": "gulon_tpu.utils.word2vec",
    "write_word2vec_bin": "gulon_tpu.utils.word2vec",
    "sniff_word2vec_binary": "gulon_tpu.utils.word2vec",
    "load_index": "gulon_tpu.utils.serde",
    "save_index": "gulon_tpu.utils.serde",
    "sample_ground_truth": "gulon_tpu.utils.eval",
    "ground_truth_for_queries": "gulon_tpu.utils.eval",
    "recall_of": "gulon_tpu.utils.eval",
    "format_recall": "gulon_tpu.utils.eval",
    "DEFAULT_KS": "gulon_tpu.utils.eval",
    "tune_probe_limit": "gulon_tpu.utils.tune",
    "TuneResult": "gulon_tpu.utils.tune",
}

__all__ = sorted(_EXPORTS) + ["__version__"]


def __getattr__(name):
    module = _EXPORTS.get(name)
    if module is None:
        raise AttributeError(f"module 'gulon_tpu' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(module), name)


def __dir__():
    return __all__
