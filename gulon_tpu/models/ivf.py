"""IVF-style coarse-partitioned residual PQ index.

Counterpart of the reference ``GroupedIndex`` (``Index.scala:231-308``):
vectors are grouped by nearest coarse centroid, PQ encodes the *residuals*,
and a query probes the partitions picked by a strategy:

- ``LimitGroups(count)``: probe the ``count`` nearest centroids
  (``Index.scala:287-288``);
- ``LimitVectors(count)``: probe centroids in ascending-distance order while
  the cumulative candidate count is below ``count`` (``Index.scala:289-298``).

TPU-native redesign of the scan: the reference rebuilds a fresh ADC LUT per
probed partition because the residual query ``q - c_g`` differs per partition
(``Index.scala:273-281``). Expanding the residual distance instead:

    ||(q - c_g) - r^||^2 = ||q||^2
                         + (||c_g||^2 - 2<q, c_g>)      # per (query, group)
                         + (||r^||^2 + 2<c_g, r^>)      # per row, build-time
                         - 2<q, r^>                     # ONE matmul, partition-free

so the whole probed scan is a single gather-decode + MXU matmul over row
tiles — the partition structure only contributes a per-row constant
(precomputed at build time), a per-(query, group) term (already computed when
ranking centroids), and a probe mask. Batched queries jointly cover most
partitions, so the masked full scan runs at flat-scan MXU throughput while
returning exactly the reference's probed-partition results.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from gulon_tpu.models.index import Index, Result
from gulon_tpu.models.keyindex import GroupedKeyIndex
from gulon_tpu.models.metric import Metric
from gulon_tpu.ops import scan as scan_ops
from gulon_tpu.ops.distance import normalize_rows, sq_norms
from gulon_tpu.ops.pq import ProductQuantizer, split_subspaces
from gulon_tpu.ops.topk import smallest_k


@dataclasses.dataclass(frozen=True)
class LimitGroups:
    """Probe the ``count`` nearest partitions (proto Strategy LIMIT_GROUPS=0)."""

    count: int
    proto_value = 0


@dataclasses.dataclass(frozen=True)
class LimitVectors:
    """Probe nearest partitions until >= ``count`` candidate vectors
    (proto Strategy LIMIT_VECTORS=2)."""

    count: int
    proto_value = 2


Strategy = Union[LimitGroups, LimitVectors]


@functools.partial(jax.jit, static_argnames=("count",))
def _probe_mask_limit_groups(cdist: jax.Array, count: int) -> jax.Array:
    """[Q, P] bool: True for the ``count`` nearest centroids per query."""
    num_q, num_p = cdist.shape
    count = min(count, num_p)
    _, idx = smallest_k(cdist, count)
    mask = jnp.zeros((num_q, num_p), jnp.bool_)
    rows = jnp.arange(num_q)[:, None]
    return mask.at[rows, idx].set(True)


@functools.partial(jax.jit, static_argnames=("count",))
def _probe_mask_limit_vectors(
    cdist: jax.Array, sizes: jax.Array, count: int
) -> jax.Array:
    """Probe in ascending-distance order while cumulative size < count.

    Matches the prefix rule at ``Index.scala:289-298`` (the partition that
    crosses the threshold is included).
    """
    num_q = cdist.shape[0]
    order = jnp.argsort(cdist, axis=1)
    sz = sizes[order].astype(jnp.int32)
    cum_before = jnp.cumsum(sz, axis=1) - sz
    include = cum_before < count
    mask = jnp.zeros(cdist.shape, jnp.bool_)
    rows = jnp.arange(num_q)[:, None]
    return mask.at[rows, order].set(include)


@functools.partial(
    jax.jit,
    static_argnames=(
        "bounds", "k", "tile_rows", "precision", "topk_impl", "recall_target"
    ),
)
def _ivf_scan(
    queries: jax.Array,  # [Q, D]
    codebooks: jax.Array,  # [m, K, dsub]
    codes: jax.Array,  # [N, m]
    row_const: jax.Array,  # [N] = ||r^||^2 + 2<c_g, r^> (+inf padding)
    group_ids: jax.Array,  # [N] int32
    group_term: jax.Array,  # [Q, P] = ||c_g||^2 - 2<q, c_g>
    probe_mask: jax.Array,  # [Q, P] bool
    *,
    bounds,
    k: int,
    tile_rows: int,
    precision: str = "default",
    topk_impl: str = "approx",
    recall_target: float = 0.95,
):
    num_q = queries.shape[0]
    m, _, dsub = codebooks.shape
    tile_rows = min(tile_rows, max(codes.shape[0], 1))

    qs = split_subspaces(queries, bounds, dsub)
    q_pad = jnp.transpose(qs, (1, 0, 2)).reshape(num_q, m * dsub)
    qn = sq_norms(queries)

    code_tiles = scan_ops._tile(codes, tile_rows)
    const_tiles = scan_ops._tile(row_const, tile_rows, pad_value=jnp.inf)
    gid_tiles = scan_ops._tile(group_ids, tile_rows)

    def dist_tile(inp):
        ct, rc, gid = inp
        ci = ct.astype(jnp.int32)
        dec = scan_ops.decode_tile(codebooks, ci, "auto", precision)
        ip = jnp.matmul(
            q_pad,
            dec.T,
            preferred_element_type=jnp.float32,
            precision=scan_ops.resolve_precision(precision),
        )
        gt = jnp.take(group_term, gid, axis=1)  # [Q, T]
        pm = jnp.take(probe_mask, gid, axis=1)  # [Q, T]
        d = qn[:, None] + rc[None, :] + gt - 2.0 * ip
        return jnp.where(pm, d, jnp.inf)

    return scan_ops._streaming_topk(
        dist_tile,
        code_tiles.shape[0],
        tile_rows,
        num_q,
        k,
        (code_tiles, const_tiles, gid_tiles),
        topk_impl=topk_impl,
        recall_target=recall_target,
    )


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _plan_entry_schedule(
    probe_np: np.ndarray,  # [Q, L] i32, -1 = unused slot
    sizes: np.ndarray,  # [P] partition sizes
    starts: np.ndarray,  # [P] partition start rows
    rcap: int,  # rows per entry
    qcap: int,  # queries per entry
    kk: int,
):
    """Host-side planner for the exact partition-centric ("bucketed") scan.

    The (query, probe) pairs are inverted into a 2D-tiled *entry* schedule:
    every probed partition is split into ``ceil(size/rcap)`` row chunks x
    ``ceil(occupancy/qcap)`` query sub-buckets, and each (row chunk, query
    sub-bucket) cell becomes one fixed-shape entry. Unlike a global
    [P, qcap] bucket matrix this is lossless by construction — hot
    partitions get *more entries* instead of dropped overflow pairs
    (``Index.scala:273-281`` probes are never lossy), an oversized
    partition never inflates other probes' slice widths, and unprobed
    partitions cost nothing.

    Returns device-ready schedule arrays plus the per-pair candidate slot
    map used to regroup entry winners per query:
      e_start/e_size/e_part [E], e_bucket [E, qcap] (query ids, -1 pad),
      pair_slots [Q, L*max_nr] flat indices into the [E*qcap] candidate
      table (sentinel = E*qcap for unused).
    """
    num_q, L = probe_np.shape
    qs = np.repeat(np.arange(num_q, dtype=np.int32), L)
    ps = probe_np.reshape(-1)
    valid = ps >= 0
    orig_pos = np.nonzero(valid)[0]
    qs, ps = qs[valid], ps[valid]
    order = np.argsort(ps, kind="stable")
    ps_s, qs_s = ps[order], qs[order]
    orig_pos = orig_pos[order]

    used, used_start = np.unique(ps_s, return_index=True)
    occ = np.diff(np.append(used_start, len(ps_s)))
    nq = -(-occ // qcap)
    nr = np.maximum(-(-sizes[used] // rcap), 1)
    max_nr = int(nr.max()) if len(nr) else 1

    # rank of each pair within its partition -> (query chunk, slot)
    first = np.searchsorted(ps_s, ps_s, side="left")
    rank = (np.arange(len(ps_s)) - first).astype(np.int64)
    uidx = np.searchsorted(used, ps_s)
    j_q = rank // qcap
    slot = (rank % qcap).astype(np.int64)

    # entries: per used partition, an nr x nq grid (row-chunk major)
    reps = nr * nq
    num_e = int(reps.sum())
    if num_e == 0:
        # no (query, probe) pairs at all — e.g. a shard none of whose
        # partitions are probed by this batch: an all-padding schedule
        # (size-0 entries, empty buckets, sentinel pair slots)
        e_pad = 8
        return (
            np.zeros(e_pad, np.int32),
            np.zeros(e_pad, np.int32),
            np.zeros(e_pad, np.int32),
            np.full((e_pad, qcap), -1, np.int32),
            np.full((num_q, L), e_pad * qcap, np.int32),
        )
    cum = np.concatenate([[0], np.cumsum(reps)[:-1]])
    e_upart = np.repeat(np.arange(len(used)), reps)
    within = np.arange(num_e) - np.repeat(cum, reps)
    i_row = within // nq[e_upart]
    j_ent = within % nq[e_upart]
    e_start = (starts[used][e_upart] + i_row * rcap).astype(np.int32)
    e_size = np.minimum(
        rcap, sizes[used][e_upart] - i_row * rcap
    ).astype(np.int32)
    e_part = used[e_upart].astype(np.int32)

    # bucket contents per (used partition, query chunk)
    bucket_base = np.cumsum(np.append(0, nq))[:-1]
    bucket_of_entry = (bucket_base[e_upart] + j_ent).astype(np.int64)
    num_b = int(nq.sum())
    buckets = np.full((num_b, qcap), -1, np.int32)
    brow = bucket_base[uidx] + j_q
    buckets[brow, slot] = qs_s

    # pad E to a power of two (bounded jit variants); padded entries are
    # size-0 and point at an all-empty bucket row
    e_pad = max(_next_pow2(num_e), 8)
    if e_pad > num_e:
        pad = e_pad - num_e
        e_start = np.concatenate([e_start, np.zeros(pad, np.int32)])
        e_size = np.concatenate([e_size, np.zeros(pad, np.int32)])
        e_part = np.concatenate([e_part, np.zeros(pad, np.int32)])
        bucket_of_entry = np.concatenate(
            [bucket_of_entry, np.full(pad, num_b, np.int64)]
        )
    buckets = np.concatenate(
        [buckets, np.full((1, qcap), -1, np.int32)], axis=0
    )
    e_bucket = buckets[bucket_of_entry]  # [E_pad, qcap]

    # per-pair candidate slots: pair (q, p) owns slot `slot` of every
    # row-chunk entry (i, j_q) of p
    max_nr_pad = _next_pow2(max_nr)
    eids = (
        cum[uidx][:, None]
        + np.arange(max_nr_pad)[None, :] * nq[uidx][:, None]
        + j_q[:, None]
    )
    pair_ok = np.arange(max_nr_pad)[None, :] < nr[uidx][:, None]
    flat = np.where(pair_ok, eids * qcap + slot[:, None], e_pad * qcap)
    pair_slots = np.full(
        (num_q, L, max_nr_pad), e_pad * qcap, np.int64
    )
    pair_slots[qs_s, orig_pos % L] = flat
    return (
        e_start,
        e_size,
        e_part,
        e_bucket,
        pair_slots.reshape(num_q, L * max_nr_pad).astype(np.int32),
    )


# Flat-top-k memory budget: below this, per-entry distances are stacked
# into one [E*qcap, rcap] tensor and selected with a single wide
# PartialReduce — ~10x cheaper than a top-k inside the entry loop
# (profiled: in-loop approx_top_k over tiny [qcap, rcap] tiles dominated
# the whole scan). Above it, top-k runs per chunk inside the loop.
_FLAT_TOPK_BYTES = 1 << 30


def _entry_topk(
    dist_chunk_fn,  # vmapped: chunk of schedule rows -> [chunk, qcap, rcap]
    schedule,  # tuple of [E, ...] arrays to feed dist_chunk_fn
    e_start: jax.Array,  # [E] i32 (for global row ids)
    *,
    rcap: int,
    qcap: int,
    kk: int,
    chunk: int,
    topk_impl: str,
    recall_target: float,
):
    """Scan entry distances in chunks, then select kk per entry slot."""
    e_total = e_start.shape[0]
    n_chunks = e_total // chunk
    chunked = tuple(
        a.reshape((n_chunks, chunk) + a.shape[1:]) for a in schedule
    )
    flat_ok = e_total * qcap * rcap * 4 <= _FLAT_TOPK_BYTES

    if flat_ok:
        def scan_chunk(carry, inp):
            return carry, dist_chunk_fn(*inp)

        _, dist_all = jax.lax.scan(scan_chunk, None, chunked)
        flat = dist_all.reshape(e_total * qcap, rcap)
        if topk_impl == "approx" and rcap >= 128:
            kv, kp = jax.lax.approx_min_k(
                flat, kk, recall_target=recall_target
            )
            kp = kp.astype(jnp.int32)
        else:
            kv, kp = smallest_k(flat, kk)
        ki = e_start[:, None, None] + kp.reshape(e_total, qcap, kk)
        return kv.reshape(e_total, qcap, kk), ki

    def scan_chunk(carry, inp):
        dist = dist_chunk_fn(*inp)  # [chunk, qcap, rcap]
        d2 = dist.reshape(chunk * qcap, rcap)
        if topk_impl == "approx" and rcap >= 128:
            kv, kp = jax.lax.approx_min_k(
                d2, kk, recall_target=recall_target
            )
            kp = kp.astype(jnp.int32)
        else:
            kv, kp = smallest_k(d2, rcap if kk > rcap else kk)
        return carry, (
            kv.reshape(chunk, qcap, kk), kp.reshape(chunk, qcap, kk)
        )

    _, (all_v, all_p) = jax.lax.scan(scan_chunk, None, chunked)
    all_i = e_start.reshape(n_chunks, chunk)[:, :, None, None] + all_p
    return (
        all_v.reshape(e_total, qcap, kk),
        all_i.reshape(e_total, qcap, kk),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "rcap", "qcap", "kk", "chunk", "precision",
        "topk_impl", "recall_target",
    ),
)
def _scan_entries_codes(
    q_pad: jax.Array,  # [Q, m*dsub] f32 (subspace layout)
    qn: jax.Array,  # [Q] f32
    group_term: jax.Array,  # [Q, P] f32
    codebooks: jax.Array,  # [m, K, dsub]
    codes_pad: jax.Array,  # [N + rcap, m] uint
    row_const_pad: jax.Array,  # [N + rcap] f32 (+inf padding)
    e_start: jax.Array,  # [E] i32
    e_size: jax.Array,  # [E] i32
    e_part: jax.Array,  # [E] i32
    e_bucket: jax.Array,  # [E, qcap] i32 query ids (-1 pad)
    *,
    rcap: int,
    qcap: int,
    kk: int,
    chunk: int = 16,
    precision: str = "default",
    topk_impl: str = "exact",
    recall_target: float = 0.95,
):
    """Code-resident entry scan: decode each probed row chunk in-flight.

    Memory stays at ``m`` bytes/vector (the reference's ranged code scan,
    ``Index.scala:411-412``); the reconstruction cache is optional (see
    :func:`_scan_entries_cached`). Returns per-entry-slot candidates
    ([E, qcap, kk] dists, [E, qcap, kk] global row ids).
    """
    num_q = q_pad.shape[0]
    m = codes_pad.shape[1]
    q_safe = jnp.concatenate(
        [q_pad, jnp.zeros((1, q_pad.shape[1]), q_pad.dtype)]
    )
    qn_safe = jnp.concatenate([qn, jnp.zeros((1,), qn.dtype)])
    gt_safe = jnp.concatenate(
        [group_term, jnp.zeros((1, group_term.shape[1]), group_term.dtype)]
    )
    col_iota = jnp.arange(rcap, dtype=jnp.int32)

    def one_entry(st, sz, part, bucket):
        cs = jax.lax.dynamic_slice(
            codes_pad, (st, 0), (rcap, m)
        ).astype(jnp.int32)
        dec = scan_ops.decode_tile(codebooks, cs, "auto", precision)
        rc = jax.lax.dynamic_slice(row_const_pad, (st,), (rcap,))
        qidx = jnp.where(bucket >= 0, bucket, num_q)
        qb = q_safe[qidx]  # [qcap, m*dsub]
        ip = jnp.matmul(
            qb,
            dec.T,
            preferred_element_type=jnp.float32,
            precision=scan_ops.resolve_precision(precision),
        )
        gt = gt_safe[qidx, part]
        dist = (
            qn_safe[qidx][:, None] + gt[:, None] + rc[None, :] - 2.0 * ip
        )
        ok = (bucket >= 0)[:, None] & (col_iota[None, :] < sz)
        return jnp.where(ok, dist, jnp.inf)

    return _entry_topk(
        jax.vmap(one_entry),
        (e_start, e_size, e_part, e_bucket),
        e_start,
        rcap=rcap, qcap=qcap, kk=kk, chunk=chunk,
        topk_impl=topk_impl, recall_target=recall_target,
    )


@functools.partial(
    jax.jit,
    static_argnames=("rcap", "qcap", "kk", "chunk", "topk_impl", "recall_target"),
)
def _scan_entries_cached(
    queries: jax.Array,  # [Q, D] f32 (already normalized)
    recon_pad: jax.Array,  # [N + rcap, D] bf16/f32 reconstruction
    recon_norms_pad: jax.Array,  # [N + rcap] f32 (+inf padding)
    e_start: jax.Array,
    e_size: jax.Array,
    e_bucket: jax.Array,
    *,
    rcap: int,
    qcap: int,
    kk: int,
    chunk: int = 16,
    topk_impl: str = "exact",
    recall_target: float = 0.95,
):
    """Entry scan over a materialized reconstruction cache (pure matmuls)."""
    num_q, d = queries.shape
    qn = sq_norms(queries)
    q_safe = jnp.concatenate([queries, jnp.zeros((1, d), queries.dtype)])
    qn_safe = jnp.concatenate([qn, jnp.zeros((1,), qn.dtype)])
    col_iota = jnp.arange(rcap, dtype=jnp.int32)

    def one_entry(st, sz, bucket):
        block = jax.lax.dynamic_slice(recon_pad, (st, 0), (rcap, d))
        bn = jax.lax.dynamic_slice(recon_norms_pad, (st,), (rcap,))
        qidx = jnp.where(bucket >= 0, bucket, num_q)
        qb = q_safe[qidx]
        ip = jnp.matmul(
            qb.astype(block.dtype),
            block.T,
            preferred_element_type=jnp.float32,
        )
        dist = qn_safe[qidx][:, None] + bn[None, :] - 2.0 * ip
        ok = (bucket >= 0)[:, None] & (col_iota[None, :] < sz)
        return jnp.where(ok, dist, jnp.inf)

    return _entry_topk(
        jax.vmap(one_entry),
        (e_start, e_size, e_bucket),
        e_start,
        rcap=rcap, qcap=qcap, kk=kk, chunk=chunk,
        topk_impl=topk_impl, recall_target=recall_target,
    )


@functools.partial(jax.jit, static_argnames=("k",))
def _regroup_pairs(
    cand_v: jax.Array,  # [E, qcap, kk]
    cand_i: jax.Array,  # [E, qcap, kk]
    pair_slots: jax.Array,  # [Q, W] flat (entry*qcap + slot); E*qcap = pad
    *,
    k: int,
):
    """Gather every pair's entry winners and take the per-query top-k."""
    e_total, qcap, kk = cand_v.shape
    num_q, w = pair_slots.shape
    cv = jnp.concatenate(
        [
            cand_v.reshape(e_total * qcap, kk),
            jnp.full((1, kk), jnp.inf, jnp.float32),
        ]
    )
    ci = jnp.concatenate(
        [
            cand_i.reshape(e_total * qcap, kk),
            jnp.full((1, kk), -1, jnp.int32),
        ]
    )
    safe = jnp.minimum(pair_slots, e_total * qcap)
    per_q_v = cv[safe].reshape(num_q, w * kk)
    per_q_i = ci[safe].reshape(num_q, w * kk)
    kf = min(k, w * kk)
    best_d, pos = smallest_k(per_q_v, kf)
    best_i = jnp.take_along_axis(per_q_i, pos, axis=1)
    if kf < k:
        best_d = jnp.pad(
            best_d, ((0, 0), (0, k - kf)), constant_values=jnp.inf
        )
        best_i = jnp.pad(best_i, ((0, 0), (0, k - kf)), constant_values=-1)
    best_i = jnp.where(jnp.isinf(best_d), -1, best_i)
    return best_d, best_i


@functools.partial(
    jax.jit,
    static_argnames=("mode", "num_probe", "pmax", "k", "precision",
                     "topk_impl", "recall_target"),
)
def _ivf_scan_gathered(
    q_op: jax.Array,         # cached: [Q, D] queries; codes: [Q, m*dsub]
    qn: jax.Array,           # [Q] f32
    group_term,              # codes: [Q, P] f32; cached: None (folded in aux)
    codebooks,               # codes: [m, K, dsub]; cached: None
    data_pad: jax.Array,     # cached: [N + pmax, D] recon; codes: [N + pmax, m]
    aux_pad: jax.Array,      # cached: recon norms; codes: row_const (+inf pad)
    starts: jax.Array,       # [P] i32 partition start rows
    sizes: jax.Array,        # [P] i32 partition sizes
    probe_ids: jax.Array,    # [Q, L] i32 partitions to probe; -1 = unused
    *,
    mode: str,               # "cached" | "codes"
    num_probe: int,
    pmax: int,
    k: int,
    precision: str = "default",
    topk_impl: str = "exact",
    recall_target: float = 0.95,
):
    """Sublinear probed scan: per query, L contiguous partition slices.

    Partitions are contiguous row ranges (rows grouped at build), so a
    probe is one ``dynamic_slice`` — the per-query work is O(L * pmax)
    rows regardless of corpus size. The win over the masked full scan
    (``_ivf_scan``) is the latency/small-batch regime; for large batches
    whose probes jointly cover the corpus the masked scan reads everything
    once and stays preferable.

    ``mode="codes"`` is code-resident: probed row chunks of the [N, m]
    code matrix are decoded in-flight (``Index.scala:411-412`` — the
    reference scans probed partitions directly over codes; ``m``
    bytes/vector). ``mode="cached"`` scans a materialized reconstruction
    (pure matmuls, ``2*D`` bytes/vector; see :meth:`IVFIndex.enable_cache`).
    The slicing / validity-masking / selection skeleton is shared; only
    the per-slot block producer differs.
    """
    num_q = q_op.shape[0]
    width = data_pad.shape[1]
    row_iota = jnp.arange(pmax, dtype=jnp.int32)

    def select(dist, ids_flat):
        if topk_impl == "approx" and num_probe * pmax >= 256 * k:
            vals, pos = jax.lax.approx_min_k(
                dist[None], k, recall_target=recall_target
            )
        else:
            vals, pos = smallest_k(dist[None], k)
        return vals[0], ids_flat[pos[0]]

    def slot_slices(p):
        """Common per-probe plumbing: (active, start, aux chunk, ids)."""
        active = p >= 0  # LimitVectors probe sets vary per query
        p_safe = jnp.maximum(p, 0)
        s = starts[p_safe]
        aux = jax.lax.dynamic_slice(aux_pad, (s,), (pmax,))
        valid = active & (row_iota < sizes[p_safe])
        return p_safe, s, aux, valid

    if mode == "cached":

        def per_query(qv, qn_v, pids):
            def per_slot(p):
                _, s, bn, valid = slot_slices(p)
                block = jax.lax.dynamic_slice(data_pad, (s, 0), (pmax, width))
                return block, jnp.where(valid, bn, jnp.inf), s + row_iota

            blocks, bns, ids = jax.vmap(per_slot)(pids)  # [L, pmax, ...]
            flat = blocks.reshape(num_probe * pmax, width)
            ip = jnp.matmul(
                flat, qv.astype(flat.dtype)[:, None],
                preferred_element_type=jnp.float32,
            )[:, 0]
            return select(qn_v + bns.reshape(-1) - 2.0 * ip, ids.reshape(-1))

        dists, ids = jax.vmap(per_query)(q_op, qn, probe_ids)
    else:

        def per_query(qv, qn_v, gt_row, pids):
            def per_slot(p):
                p_safe, s, rc, valid = slot_slices(p)
                cs = jax.lax.dynamic_slice(
                    data_pad, (s, 0), (pmax, width)
                ).astype(jnp.int32)
                dec = scan_ops.decode_tile(codebooks, cs, "auto", precision)
                rc = jnp.where(valid, rc + gt_row[p_safe], jnp.inf)
                return dec, rc, s + row_iota

            blocks, rcs, ids = jax.vmap(per_slot)(pids)  # [L, pmax, ...]
            flat = blocks.reshape(num_probe * pmax, -1)
            ip = jnp.matmul(
                flat,
                qv[:, None],
                preferred_element_type=jnp.float32,
                precision=scan_ops.resolve_precision(precision),
            )[:, 0]
            return select(qn_v + rcs.reshape(-1) - 2.0 * ip, ids.reshape(-1))

        dists, ids = jax.vmap(per_query)(q_op, qn, group_term, probe_ids)
    ids = jnp.where(jnp.isinf(dists), -1, ids)
    return dists, ids


@functools.partial(jax.jit, static_argnames=("kind", "count"))
def _rank_and_probe(q, centroids, sizes, *, kind: str, count: int):
    """Centroid ranking (``exactNearestNeighbours`` over centroids,
    ``Index.scala:285-299``) + probe-mask construction, fused into one
    computation: (group_term [Q, P], qn [Q], cdist [Q, P], mask [Q, P])."""
    cn = sq_norms(centroids)
    qc_ip = jnp.matmul(
        q,
        centroids.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    group_term = cn[None, :] - 2.0 * qc_ip
    qn = sq_norms(q)
    cdist = group_term + qn[:, None]
    if kind == "groups":
        pm = _probe_mask_limit_groups(cdist, count)
    else:
        pm = _probe_mask_limit_vectors(cdist, sizes, count)
    return group_term, qn, cdist, pm


@functools.partial(
    jax.jit,
    static_argnames=(
        "bounds", "num_rows", "k", "topk_impl", "recall_target", "interpret",
        "winners", "rescore",
    ),
)
def _pallas_ivf_query(
    q: jax.Array,            # [Q, D] f32 (already metric-normalized)
    qn: jax.Array,           # [Q] f32 ||q||^2
    group_term: jax.Array,   # [Q, P] f32
    probe_mask: jax.Array,   # [Q, P] bool
    codebooks: jax.Array,
    codes_t: jax.Array,      # [m, Np] i32 partition-padded, pretransposed
    rc_pal: jax.Array,       # [Np] f32 (sentinel > _INVALID_MIN on padding)
    col_part: jax.Array,     # [NW] i32 partition of each winner COLUMN
    row_map: jax.Array,      # [Np] i32 padded row -> original row (-1 pad)
    *,
    bounds,
    num_rows: int,
    k: int,
    topk_impl: str,
    recall_target: float,
    interpret: bool,
    winners: int = 2,
    rescore: int = 0,
):
    """Kernel + epilogue of the IVF ``pallas`` strategy as ONE computation.

    The kernel emits two (value, row) candidates per 128-row block of the
    partition-padded layout (``winners=2``: losing a true top-k member
    needs three of them in one block). Each winner *column* belongs to a
    fixed block — and hence partition — of the static layout
    (``col_part``), so the block-constant group term and probe mask apply
    after the in-kernel min via shared-index column gathers.

    ``rescore > 0`` over-fetches ``rescore*k`` ranked candidates and
    re-ranks them with exact f32 ADC distances (the per-partition exact
    distances of ``Index.scala:273-281``): an f32 inner-product LUT
    replaces the kernel's bf16 matmul term, decoupling winners-per-block
    (latency) from final ranking fidelity.
    """
    from gulon_tpu.ops.pallas.adc import (
        _INVALID_MIN,
        adc_block_scan_pallas,
    )

    bv, bi = adc_block_scan_pallas(
        q, codebooks, codes_t, rc_pal,
        bounds=bounds, num_rows=num_rows, winners=winners,
        interpret=interpret,
    )
    # winner column -> partition via the STATIC col_part vector (shared
    # across queries): a single-index-vector column gather lowers well on
    # TPU, where per-element take_along_axis gathers do not
    gt = jnp.take(group_term, col_part, axis=1)  # [Q, NW]
    pm = jnp.take(probe_mask, col_part, axis=1)
    valid = (bv < _INVALID_MIN) & pm
    d = jnp.where(valid, bv + gt + qn[:, None], jnp.inf)
    kk = min(k, d.shape[1])
    fetch = min(rescore * kk, d.shape[1]) if rescore else kk
    if (
        not rescore
        and topk_impl == "approx"
        and fetch >= 32
        and d.shape[1] >= 4 * fetch
    ):
        # the approx fetch is NOT used under rescore: losing ~5% of the
        # over-fetched set loses true top-k members the rescore exists to
        # recover (measured -0.09 recall@10 at ivf1m)
        best, pos = jax.lax.approx_min_k(
            d, fetch, recall_target=recall_target
        )
        pos = pos.astype(jnp.int32)
    else:
        best, pos = smallest_k(d, fetch)
    win_rows = jnp.take_along_axis(bi, pos, axis=1)
    if rescore:
        best, win_rows = scan_ops.ivf_block_rescore(
            q, qn, codebooks, codes_t, rc_pal,
            best, win_rows, jnp.take_along_axis(gt, pos, axis=1),
            bounds=bounds, k=kk,
        )
    ids = jnp.where(jnp.isinf(best), -1, jnp.take(row_map, win_rows))
    if kk < k:
        pad = k - kk
        best = jnp.pad(best, ((0, 0), (0, pad)), constant_values=jnp.inf)
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
    return best, ids


_PALLAS_BLOCK = 128


@dataclasses.dataclass
class IVFIndex(Index):
    _key_index: GroupedKeyIndex
    pq: ProductQuantizer  # trained on residuals
    codes: jax.Array  # [N, m] uint (grouped row order)
    row_const: jax.Array  # [N] f32 = ||r^||^2 + 2<c_g, r^>
    group_ids: jax.Array  # [N] int32, partition of each row
    centroids: jax.Array  # [P, D] f32 coarse centroids (empty groups dropped)
    metric: Metric
    strategy: Strategy
    # [D, D] learned OPQ rotation (ops/opq.py) as a GLOBAL basis change:
    # corpus, coarse centroids, and residual codebooks all live in the
    # rotated basis, so every internal scan path is untouched; queries
    # rotate once in _prepare_queries, lookups map back. None = plain PQ.
    rotation: Optional[jax.Array] = None
    tile_rows: int = scan_ops.DEFAULT_TILE_ROWS
    precision: str = "default"
    topk_impl: str = "approx"
    recall_target: float = 0.95
    # "auto" (default) = pick per batch from probed-work estimates: small
    #   batches whose probes touch far less than the corpus go sublinear
    #   (gathered, then bucketed as the batch grows); covering batches go
    #   to the fused kernel on TPU, the masked full scan elsewhere — so
    #   default single-query latency is sublinear in N, no knob required
    #   (the reference's probed scan is the whole point at scale,
    #   Index.scala:273-281);
    # "masked" = single masked full scan (best when batched probes
    # jointly cover the corpus);
    # "pallas" = the fused block-min kernel over a partition-padded row
    #   layout: every 128-row selection block lies inside one partition, so
    #   the per-(query, partition) term and the probe mask apply to the
    #   [Q, N/128] block winners AFTER the in-kernel min (they are block-
    #   constant and commute with it) — masked-scan semantics at fused-
    #   kernel throughput, at approx_min_k-style selection granularity;
    # "gathered" = per-query partition slices — sublinear in corpus size,
    # the latency/small-batch path;
    # "bucketed" = exact partition-centric schedule: probed partitions are
    # host-planned into fixed row-chunk x query-sub-bucket entries (hot
    # partitions get MORE entries instead of dropped overflow pairs, and an
    # oversized partition never inflates other probes) — the large-batch
    # sublinear path.
    # Both sublinear paths are code-resident (m bytes/vector, probed rows
    # decoded in-flight, matching the reference's ranged code scan at
    # Index.scala:411-412); if enable_cache() materialized the bf16
    # reconstruction they use it automatically instead.
    scan_strategy: str = "auto"
    recon_cache: Optional[jax.Array] = None  # [N + pad, D], see enable_cache
    recon_norms_cache: Optional[jax.Array] = None  # [N + pad] f32
    _codes_pad: Optional[jax.Array] = None  # [N + pad, m], built lazily
    _row_const_pad: Optional[jax.Array] = None  # [N + pad] f32
    # lazily-built partition-padded layout for the fused-kernel strategy:
    # (codes^T [m, Np] i32, row_const [Np] f32, blk_part [NB] i32,
    #  row_map [Np] i32) — see scan_strategy "pallas" in query_arrays
    _pallas_layout: Optional[tuple] = None
    _sizes_dev: Optional[jax.Array] = None  # partition_sizes() on device
    # ranked candidates the fused kernel keeps per 128-row block (1..4):
    # losing a true top-k member needs pallas_winners+1 of them in one
    # block; higher = better recall, more selection VPU work. At 4 the
    # strategy beats the masked scan on BOTH latency and recall at the
    # ivf1m config (3.5 vs 9.9 ms/batch, R@10 0.572 vs 0.565 — the masked
    # scan's approx_min_k carries its own selection loss); 2 is the fast
    # setting (2.2 ms, R@10 0.548)
    pallas_winners: int = 4
    # >0: the fused strategy over-fetches pallas_rescore*k block winners
    # and re-ranks them with exact f32 ADC distances (f32 IP LUT + group
    # term, the per-partition exact distances of Index.scala:273-281) —
    # decouples winners-per-block (latency) from ranking fidelity
    pallas_rescore: int = 0

    @property
    def key_index(self) -> GroupedKeyIndex:
        return self._key_index

    @property
    def dimension(self) -> int:
        return self.pq.dimension

    @property
    def size(self) -> int:
        return int(self.codes.shape[0])

    @property
    def num_partitions(self) -> int:
        return int(self.centroids.shape[0])

    def partition_sizes(self) -> np.ndarray:
        offsets = self._key_index.group_offsets
        bounds = np.concatenate([[0], offsets, [self.size]])
        return np.diff(bounds).astype(np.int32)

    def batch_query(self, k: int, vectors) -> List[Result]:
        return self._make_results(*self.query_arrays(k, vectors))

    def _pad_rows(self) -> int:
        """Row padding so any rcap/pmax dynamic slice stays in bounds."""
        sizes = self.partition_sizes()
        pmax = int(sizes.max()) if len(sizes) else 1
        return max(pmax, 512)

    def _code_operands(self):
        """Padded code matrix + row constants for code-resident probing."""
        if self._codes_pad is None:
            pad = self._pad_rows()
            self._codes_pad = jnp.pad(self.codes, ((0, pad), (0, 0)))
            self._row_const_pad = jnp.pad(
                self.row_const, (0, pad), constant_values=jnp.inf
            )
        return self._codes_pad, self._row_const_pad

    def _q_subspace(self, q: jax.Array) -> jax.Array:
        qs = split_subspaces(q, self.pq.bounds, self.pq.pad_width)
        return jnp.transpose(qs, (1, 0, 2)).reshape(q.shape[0], -1)

    _PALLAS_PAD_SENTINEL = 2.0e38  # > _INVALID_MIN: padding never wins

    def _pallas_operands(self):
        """Partition-padded layout for the fused-kernel scan (built once).

        Every partition is padded to a 128-row-block boundary so each
        selection block belongs to exactly one partition. Padding rows get
        a row constant above the kernel's invalid threshold, so they can
        never win a block min.
        """
        if self._pallas_layout is None:
            sizes = self.partition_sizes().astype(np.int64)
            starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
            psz = -(-sizes // 128) * 128
            pstarts = np.concatenate([[0], np.cumsum(psz)[:-1]])
            npad = int(psz.sum())
            m = self.pq.num_quantizers
            gid = np.asarray(self.group_ids)
            dst = (
                pstarts[gid] + (np.arange(self.size) - starts[gid])
            ).astype(np.int64)
            codes_pal = np.zeros((npad, m), np.int32)
            codes_pal[dst] = np.asarray(self.codes, np.int32)
            # minimal-width kernel operand (m bytes/vector at K<=256)
            from gulon_tpu.ops.pallas.adc import pack_codes_t
            rc_pal = np.full(npad, self._PALLAS_PAD_SENTINEL, np.float32)
            rc_pal[dst] = np.asarray(self.row_const, np.float32)
            row_map = np.full(npad, -1, np.int32)
            row_map[dst] = np.arange(self.size, dtype=np.int32)
            blk_part = np.repeat(
                np.arange(len(sizes), dtype=np.int32), psz // 128
            )
            self._pallas_layout = (
                pack_codes_t(codes_pal, self.pq.num_clusters),
                jnp.asarray(rc_pal),
                blk_part,  # host-side: the col_part map is built per (Q, k)
                jnp.asarray(row_map),
                npad,
            )
        return self._pallas_layout

    def _pallas_eligible(self, k_eff: int) -> bool:
        return (
            k_eff <= 128
            and self.pq.num_clusters <= 1024
            and self.size >= 1024
        )

    def _resolve_auto(self, num_q: int, k_eff: int) -> str:
        """Pick a scan strategy from batch size vs probed-work estimates.

        Mirrors FlatIndex's "auto": the masked full scan reads all N rows
        once per batch (best when the batch's probes jointly cover the
        corpus — then it IS the probed result at flat-scan throughput),
        while the sublinear paths read only probed rows, the regime where
        the reference's probed scan is the whole point
        (``Index.scala:273-281``). Estimates are host-side: exact probe
        count for LimitGroups; LimitVectors probes ~count/mean_size
        partitions. ``gathered`` (one jitted computation, per-query padded
        slices) serves small batches; ``bucketed`` (host-planned lossless
        entry schedule, no pmax padding) takes over as the batch grows;
        covering batches go to the fused kernel on TPU, masked elsewhere.
        """
        sizes = self.partition_sizes()
        if len(sizes) == 0 or self.size == 0:
            return "masked"
        pmax = int(sizes.max())
        mean_size = self.size / len(sizes)
        if isinstance(self.strategy, LimitGroups):
            probes = min(self.strategy.count, self.num_partitions)
            bucketed_rows = num_q * probes * mean_size
        else:
            # LimitVectors probes until cumulative size >= count, so rows
            # probed per query are bounded by count + pmax (exact bound);
            # the PROBE COUNT is data-dependent — estimate conservatively
            # with the 25th-percentile partition size (a mean-based
            # estimate undercounts badly under skew, and gathered pays
            # probes * pmax of PADDED rows per query)
            nz = sizes[sizes > 0]
            p25 = max(int(np.percentile(nz, 25)), 1) if len(nz) else 1
            probes = min(
                self.num_partitions,
                max(1, -(-self.strategy.count // p25)),
            )
            bucketed_rows = num_q * min(
                self.strategy.count + pmax, self.size
            )
        gathered_rows = num_q * probes * pmax  # padded slices per query
        if num_q <= 32 and gathered_rows * 2 < self.size:
            return "gathered"
        if bucketed_rows * 2 < self.size:
            return "bucketed"
        if jax.default_backend() == "tpu" and self._pallas_eligible(k_eff):
            # measured at ivf1m: the fused block-min kernel beats the
            # masked scan on both latency and recall (benchmarks/run.py)
            return "pallas"
        return "masked"

    def _query_pallas(self, q, qn, group_term, probe_mask, k_eff: int):
        """Fused-kernel masked scan (see scan_strategy comment).

        One jitted computation (``_pallas_ivf_epilogue`` fused around the
        kernel call): chaining the epilogue as eager ops would pay ~10
        device dispatches per query batch — through a remote-TPU tunnel
        that dwarfs the 1.5 ms of actual compute.
        """
        from gulon_tpu.ops.pallas.adc import block_layout, padded_depth

        codes_t, rc_pal, blk_part, row_map, npad = self._pallas_operands()
        # static winner-column -> partition map for this (Q, layout):
        # per row tile r the kernel writes winners*nblk columns, the two
        # winner ranks of block r*nblk+j at columns r*W + j and
        # r*W + nblk + j (W = winners*nblk)
        m = self.pq.num_quantizers
        mdp = padded_depth(m, self.pq.pad_width)
        w = self.pallas_winners
        _, _, n_rt, nblk = block_layout(
            q.shape[0], self.pq.num_clusters, mdp, npad, winners=w
        )
        nb = len(blk_part)
        col = np.arange(n_rt * w * nblk, dtype=np.int64)
        col_blk = (col // (w * nblk)) * nblk + (col % (w * nblk)) % nblk
        col_part = blk_part[np.minimum(col_blk, nb - 1)].astype(np.int32)
        return _pallas_ivf_query(
            q, qn, group_term, probe_mask,
            self.pq.codebooks, codes_t, rc_pal, jnp.asarray(col_part),
            row_map,
            bounds=self.pq.bounds,
            num_rows=npad,
            k=k_eff,
            topk_impl=self.topk_impl,
            recall_target=self.recall_target,
            interpret=jax.default_backend() != "tpu",
            winners=w,
            rescore=self.pallas_rescore,
        )

    def _prepare_queries(self, vectors) -> jax.Array:
        """Validate shape, normalize for cosine, apply the OPQ rotation."""
        q = jnp.asarray(vectors, jnp.float32)
        if q.ndim != 2 or q.shape[1] != self.dimension:
            raise ValueError(
                f"queries must be [Q, {self.dimension}], got {q.shape}"
            )
        if self.metric.normalized:
            q = normalize_rows(q)  # Index.scala:268-269
        if self.rotation is not None:
            q = jnp.matmul(
                q, self.rotation, precision=jax.lax.Precision.HIGHEST
            )
        return q

    def query_arrays(self, k: int, vectors):
        q = self._prepare_queries(vectors)

        # Rank coarse centroids + build the probe mask in ONE jitted
        # computation (eager chaining costs a device dispatch per op —
        # material through a remote-device transport).
        if isinstance(self.strategy, LimitGroups):
            kind = "groups"
        elif isinstance(self.strategy, LimitVectors):
            kind = "vectors"
        else:
            raise ValueError(f"unknown strategy {self.strategy!r}")
        if self._sizes_dev is None:
            self._sizes_dev = jnp.asarray(self.partition_sizes())
        group_term, qn, cdist, probe_mask = _rank_and_probe(
            q, self.centroids, self._sizes_dev,
            kind=kind, count=self.strategy.count,
        )

        k_eff = min(k, self.size)
        strategy = self.scan_strategy
        if strategy == "auto":
            strategy = self._resolve_auto(int(q.shape[0]), k_eff)
        if strategy == "pallas" and self._pallas_eligible(k_eff):
            return self._query_pallas(q, qn, group_term, probe_mask, k_eff)
        if strategy in ("gathered", "bucketed"):
            use_cache = self.recon_cache is not None
            sizes_np = self.partition_sizes()
            pmax = int(sizes_np.max()) if len(sizes_np) else 1
            if isinstance(self.strategy, LimitGroups):
                num_probe = min(self.strategy.count, self.num_partitions)
            else:
                # LimitVectors: probe the mask's max set size. num_probe is
                # a static jit argument, so round up to the next power of
                # two — probe counts vary per batch and unbucketed values
                # would recompile the scan on every new maximum.
                raw = int(np.asarray(probe_mask.sum(axis=1)).max())
                num_probe = 1
                while num_probe < raw:
                    num_probe *= 2
                num_probe = min(num_probe, self.num_partitions)
            # the num_probe nearest centroids, best first; queries with
            # smaller probe sets (LimitVectors) mark unused slots -1
            masked_cdist = jnp.where(probe_mask, cdist, jnp.inf)
            probe_d, probe_ids = smallest_k(masked_cdist, num_probe)
            probe_ids = jnp.where(
                jnp.isinf(probe_d), -1, probe_ids
            ).astype(jnp.int32)
            starts = np.concatenate(
                [[0], np.cumsum(sizes_np)[:-1]]
            ).astype(np.int32)
            if strategy == "bucketed":
                probe_np = np.asarray(probe_ids)
                flat_p = probe_np[probe_np >= 0]
                max_occ = (
                    int(np.bincount(flat_p).max()) if flat_p.size else 1
                )
                rcap = min(512, _next_pow2(pmax))
                qcap = min(64, max(8, _next_pow2(max_occ)))
                kk = min(k_eff, rcap)
                (
                    e_start, e_size, e_part, e_bucket, pair_slots
                ) = _plan_entry_schedule(
                    probe_np, sizes_np, starts, rcap, qcap, kk
                )
                chunk = min(16, e_start.shape[0])
                if use_cache:
                    cand_v, cand_i = _scan_entries_cached(
                        q,
                        self.recon_cache,
                        self.recon_norms_cache,
                        jnp.asarray(e_start),
                        jnp.asarray(e_size),
                        jnp.asarray(e_bucket),
                        rcap=rcap, qcap=qcap, kk=kk, chunk=chunk,
                        topk_impl=self.topk_impl,
                        recall_target=self.recall_target,
                    )
                else:
                    codes_pad, rc_pad = self._code_operands()
                    cand_v, cand_i = _scan_entries_codes(
                        self._q_subspace(q),
                        qn,
                        group_term,
                        self.pq.codebooks,
                        codes_pad,
                        rc_pad,
                        jnp.asarray(e_start),
                        jnp.asarray(e_size),
                        jnp.asarray(e_part),
                        jnp.asarray(e_bucket),
                        rcap=rcap, qcap=qcap, kk=kk, chunk=chunk,
                        precision=self.precision,
                        topk_impl=self.topk_impl,
                        recall_target=self.recall_target,
                    )
                return _regroup_pairs(
                    cand_v, cand_i, jnp.asarray(pair_slots), k=k_eff
                )
            # gathered: candidate pool holds num_probe*pmax rows per query
            k_g = min(k_eff, num_probe * pmax)
            if use_cache:
                dists, ids = _ivf_scan_gathered(
                    q,
                    qn,
                    None,
                    None,
                    self.recon_cache,
                    self.recon_norms_cache,
                    jnp.asarray(starts),
                    jnp.asarray(sizes_np),
                    probe_ids,
                    mode="cached",
                    num_probe=num_probe,
                    pmax=pmax,
                    k=k_g,
                    topk_impl=self.topk_impl,
                    recall_target=self.recall_target,
                )
            else:
                codes_pad, rc_pad = self._code_operands()
                dists, ids = _ivf_scan_gathered(
                    self._q_subspace(q),
                    qn,
                    group_term,
                    self.pq.codebooks,
                    codes_pad,
                    rc_pad,
                    jnp.asarray(starts),
                    jnp.asarray(sizes_np),
                    probe_ids,
                    mode="codes",
                    num_probe=num_probe,
                    pmax=pmax,
                    k=k_g,
                    precision=self.precision,
                    topk_impl=self.topk_impl,
                    recall_target=self.recall_target,
                )
            if k_g < k_eff:  # pad to the requested width (inf/-1 slots)
                pad = k_eff - k_g
                dists = jnp.pad(dists, ((0, 0), (0, pad)),
                                constant_values=jnp.inf)
                ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
            return dists, ids
        if strategy not in ("masked", "pallas"):
            # "pallas" lands here when the kernel envelope doesn't fit
            # (tiny corpus / k > 128 / K > 1024): the masked scan is
            # semantically identical
            raise ValueError(
                f"unknown ivf scan strategy {strategy!r} "
                "(expected auto|masked|pallas|gathered|bucketed)"
            )
        dists, ids = _ivf_scan(
            q,
            self.pq.codebooks,
            self.codes,
            self.row_const,
            self.group_ids,
            group_term,
            probe_mask,
            bounds=self.pq.bounds,
            k=k_eff,
            tile_rows=self.tile_rows,
            precision=self.precision,
            topk_impl=self.topk_impl,
            recall_target=self.recall_target,
        )
        return dists, ids

    def enable_cache(self, dtype=None, chunk: int = 1 << 20) -> None:
        """Materialize the full reconstruction (residual decode + centroid)
        as an optional accelerator for the sublinear strategies: probed
        entries become pure matmuls instead of decode+matmul, at
        ``2*D`` bytes/vector of HBM. bf16 on TPU, f32 elsewhere. The buffer
        is padded so probe slices never clamp.
        """
        if dtype is None:
            dtype = (
                jnp.bfloat16
                if jax.default_backend() == "tpu"
                else jnp.float32
            )
        pmax = self._pad_rows()
        gids = np.asarray(self.group_ids)
        cents = np.asarray(self.centroids)
        codes = np.asarray(self.codes)
        parts = []
        norms = []
        for start in range(0, self.size, chunk):
            sl = slice(start, min(start + chunk, self.size))
            dec = np.asarray(self.pq.decode(jnp.asarray(codes[sl])))
            rec = dec + cents[gids[sl]]
            norms.append((rec.astype(np.float64) ** 2).sum(1).astype(np.float32))
            parts.append(rec.astype(np.float32))
        rec_full = (
            np.concatenate(parts, axis=0)
            if parts
            else np.zeros((0, self.dimension), np.float32)
        )
        pad = np.zeros((pmax, self.dimension), np.float32)
        self.recon_cache = jnp.asarray(
            np.concatenate([rec_full, pad], axis=0)
        ).astype(dtype)
        norms_full = (
            np.concatenate(norms) if norms else np.zeros(0, np.float32)
        )
        self.recon_norms_cache = jnp.asarray(
            np.concatenate([norms_full, np.full(pmax, np.inf, np.float32)])
        )

    def add(self, keys, vectors) -> "IVFIndex":
        """Return a new index with ``(keys, vectors)`` appended.

        New rows are assigned to their nearest EXISTING coarse centroid and
        residual-encoded with the frozen codebooks (``models/update.py``;
        an extra over the reference's build-once pipeline). Rows land in
        their partition's range keeping keys sorted within each group, so
        every scan strategy and ``lookup`` work unchanged; the lazy
        partition-padded kernel layout rebuilds on first query.
        """
        from gulon_tpu.models import update as up
        from gulon_tpu.ops.distance import nearest

        keys_new, x = up.validate_add(keys, vectors, self.dimension)
        xd = jnp.asarray(x)
        if self.metric.normalized:
            xd = normalize_rows(xd)
        if self.rotation is not None:
            # centroids/codebooks live in the rotated basis (global basis
            # change, see build_ivf_index); rotate ingest the same way
            xd = jnp.matmul(
                xd, self.rotation, precision=jax.lax.Precision.HIGHEST
            )
        gid_new = np.asarray(nearest(xd, self.centroids))
        residuals = xd - jnp.take(self.centroids, jnp.asarray(gid_new), axis=0)
        codes_new = self.pq.encode(residuals)
        codes_new_np = np.asarray(codes_new)
        rnorm = np.asarray(self.pq.reconstruction_norms(codes_new))
        crdot = self.pq.centroid_code_dot(
            codes_new_np, np.asarray(self.centroids), gid_new
        )
        rc_new = jnp.asarray(rnorm + 2.0 * crdot)

        merged_keys, gids, offsets, order = up.merge_grouped_order(
            np.asarray(self.group_ids), self._key_index.keys,
            gid_new, keys_new, self.num_partitions,
        )
        order_dev = jnp.asarray(order)
        return self._replace_rows(
            GroupedKeyIndex(merged_keys, offsets),
            jnp.take(
                jnp.concatenate([self.codes, codes_new], axis=0),
                order_dev, axis=0,
            ),
            jnp.take(jnp.concatenate([self.row_const, rc_new]), order_dev),
            jnp.asarray(gids),
        )

    def remove(self, keys) -> "IVFIndex":
        """Return a new index without the given keys (all occurrences).

        Partitions may become empty; their centroids are kept so group ids
        (and serialized strategy/limit semantics) stay stable — an empty
        partition simply never yields candidates. ``KeyError`` for absent
        keys, ``ValueError`` on emptying the index.
        """
        from gulon_tpu.models import update as up

        keep = up.removal_mask(self._key_index.keys, keys)
        keep_idx = np.flatnonzero(keep)
        gids = np.asarray(self.group_ids)[keep_idx]
        counts = np.bincount(gids, minlength=self.num_partitions)
        offsets = np.cumsum(counts)[:-1].astype(np.int32)
        keep_dev = jnp.asarray(keep_idx)
        return self._replace_rows(
            GroupedKeyIndex(self._key_index.keys[keep], offsets),
            jnp.take(self.codes, keep_dev, axis=0),
            jnp.take(self.row_const, keep_dev),
            jnp.asarray(gids),
        )

    def _replace_rows(
        self,
        key_index: GroupedKeyIndex,
        codes: jax.Array,
        row_const: jax.Array,
        group_ids: jax.Array,
    ) -> "IVFIndex":
        return dataclasses.replace(
            self,
            _key_index=key_index,
            codes=codes,
            row_const=row_const,
            group_ids=group_ids,
            recon_cache=None,  # caches/layouts cover the old row set;
            recon_norms_cache=None,  # they rebuild lazily (enable_cache
            _codes_pad=None,         # must be re-called if it was used)
            _row_const_pad=None,
            _pallas_layout=None,
            _sizes_dev=None,
        )

    def lookup(self, word: str) -> Optional[np.ndarray]:
        """Decode residual + add partition centroid (``Index.scala:247-254``)."""
        row = self._key_index.lookup(word)
        if row is None:
            return None
        g = self._key_index.group_of(row)
        residual = np.asarray(self.pq.decode(self.codes[row : row + 1]))[0]
        rec = residual + np.asarray(self.centroids[g])
        if self.rotation is not None:
            # the stored basis is rotated; report in the original basis
            rec = rec @ np.asarray(self.rotation).T
        return rec
