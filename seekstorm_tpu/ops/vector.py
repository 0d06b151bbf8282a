"""Device vector scan: tiled quantized distance matmul with fused masking
and top-k.

Replaces the reference's per-cluster SIMD similarity loops (reference
seekstorm/src/vector.rs:1397-1467 scan + vector_similarity.rs AVX2/NEON
kernels) with one MXU formulation:

* Vectors live in HBM as [n_tiles, T, d] int8 (or f32) with per-row affine
  stats (scale, zero_point, qsum) and exact pre-quantization norms.
* A query batch selects clusters via a medoid matmul + top-nprobe
  (reference vector.rs:1311-1392); cluster selection becomes a boolean
  [B, C] matrix, and rows are masked by their cluster id — no ragged
  cluster gathers, tiles are selected at 256-row granularity.
* The scan is `Q = q_i8 @ tiles_i8^T` on the MXU (int32 accumulation) with
  rank-1 affine corrections (see quantize.py), the norm trick for
  Euclidean, field-filter/delete/threshold masks applied in-register, and
  lax.top_k fused at the end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _dots(q_data, tiles, quantized: bool):
    if quantized:
        # int8 x int8 -> int32 accumulation is exact on the MXU.
        return jax.lax.dot_general(
            q_data,
            tiles,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    # Precision.HIGHEST: the TPU MXU's default f32 matmul runs bf16 passes,
    # whose ~8-bit mantissa flips near-tie ranks (measured: 95% vs 100%
    # recall@10 on a 200K euclidean benchmark). Full f32 passes restore
    # exactness — the f32 path exists precisely for exact scoring.
    return jax.lax.dot_general(
        q_data,
        tiles,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _reconstruct(Q, q_scale, q_zp, q_qsum, r_scale, r_zp, r_qsum, d, quantized):
    """Affine-corrected dot products (see quantize.reconstruct_dot)."""
    if not quantized:
        return Q
    Sa = q_qsum[:, None]
    Sb = r_qsum[None, :]
    sa = q_scale[:, None]
    za = q_zp[:, None]
    sb = r_scale[None, :]
    zb = r_zp[None, :]
    core = Q + 128.0 * Sa + 128.0 * Sb + 16384.0 * d
    return (
        sa * sb * core
        + sa * zb * (Sa + 128.0 * d)
        + sb * za * (Sb + 128.0 * d)
        + d * za * zb
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "quantized", "euclidean", "with_counts",
                     "exhaustive", "use_field_filter"),
)
def vector_scan_topk(
    data,          # i8/f32 [n_tiles, T, d]
    r_scale,       # f32[n_tiles, T]
    r_zp,          # f32[n_tiles, T]
    r_qsum,        # f32[n_tiles, T]
    r_norm2,       # f32[n_tiles, T]
    row_docid,     # i32[n_tiles, T]  (-1 = padding)
    row_field,     # i32[n_tiles, T]
    deleted,       # bool[n_docs_pad] per shard-doc
    tile_ids,      # i32[NT] selected tiles (-1 = padding; exhaustive ignores)
    field_ok,      # bool[NF] allowed vector fields (shared by the batch)
    q_data,        # i8/f32 [B, d]
    q_scale, q_zp, q_qsum, q_norm2,  # f32[B]
    score_min,     # f32[B] ranking-score threshold (-inf = none)
    *,
    k: int,
    quantized: bool,
    euclidean: bool,
    with_counts: bool,
    exhaustive: bool,
    use_field_filter: bool,
):
    """Returns (scores f32[B,k], rows i32[B,k] global row ids, counts i32[B]).

    nprobe cluster selection happens at tile granularity on the host (the
    union of clusters selected by any query in the batch) — per-query
    per-row cluster masks cost a [B, N] gather that dwarfs the scan itself,
    and a batch-level union only ever IMPROVES recall vs per-query nprobe."""
    T = data.shape[1]
    d = data.shape[2]
    B = q_data.shape[0]

    if exhaustive:
        NT = data.shape[0]
        tiles = data.reshape(NT * T, d)
        sc = r_scale.reshape(NT * T)
        zp = r_zp.reshape(NT * T)
        qs = r_qsum.reshape(NT * T)
        n2 = r_norm2.reshape(NT * T)
        docid = row_docid.reshape(NT * T)
        fldid = row_field.reshape(NT * T)
        valid = docid >= 0
        row_base = jnp.arange(NT * T, dtype=jnp.int32)
    else:
        NT = tile_ids.shape[0]
        tid = jnp.maximum(tile_ids, 0)
        tiles = jnp.take(data, tid, axis=0).reshape(NT * T, d)
        sc = jnp.take(r_scale, tid, axis=0).reshape(NT * T)
        zp = jnp.take(r_zp, tid, axis=0).reshape(NT * T)
        qs = jnp.take(r_qsum, tid, axis=0).reshape(NT * T)
        n2 = jnp.take(r_norm2, tid, axis=0).reshape(NT * T)
        docid = jnp.take(row_docid, tid, axis=0).reshape(NT * T)
        fldid = jnp.take(row_field, tid, axis=0).reshape(NT * T)
        valid = (docid >= 0) & (jnp.repeat(tile_ids, T) >= 0)
        row_base = tid.repeat(T) * T + jnp.tile(
            jnp.arange(T, dtype=jnp.int32), NT)

    Q = _dots(q_data, tiles, quantized)                       # [B, NT*T]
    dots = _reconstruct(Q, q_scale, q_zp, q_qsum, sc, zp, qs, d, quantized)
    if euclidean:
        scores = -(q_norm2[:, None] + n2[None, :] - 2.0 * dots)
    else:
        scores = dots

    row_ok = valid & ~jnp.take(deleted, jnp.maximum(docid, 0), axis=0)
    if use_field_filter:
        row_ok = row_ok & jnp.take(field_ok, jnp.maximum(fldid, 0), axis=0)
    mask = row_ok[None, :] & (scores >= score_min[:, None])
    scores = jnp.where(mask, scores, -jnp.inf)

    counts = (
        jnp.sum(mask, axis=1, dtype=jnp.int32)
        if with_counts
        else jnp.zeros((B,), jnp.int32)
    )
    kk = min(k, NT * T)
    ts, ti = jax.lax.top_k(scores, kk)
    rows = jnp.take(row_base, ti, axis=0)
    if kk < k:
        ts = jnp.concatenate(
            [ts, jnp.full((B, k - kk), -jnp.inf, jnp.float32)], axis=1
        )
        rows = jnp.concatenate([rows, jnp.zeros((B, k - kk), rows.dtype)], axis=1)
    return ts, rows, counts


@functools.partial(jax.jit, static_argnames=("quantized", "euclidean", "nprobe"))
def medoid_select(
    med_data,      # i8/f32 [C_pad, d]
    m_scale, m_zp, m_qsum, m_norm2,  # f32[C_pad]
    m_valid,       # bool[C_pad]
    always_scan,   # bool[C_pad]
    q_data, q_scale, q_zp, q_qsum, q_norm2,
    cluster_thr,   # f32[B] ranking-score threshold for clusters (-inf = none)
    *,
    quantized: bool,
    euclidean: bool,
    nprobe: int,
):
    """Score medoids and select top-nprobe clusters per query
    (reference vector.rs:1300-1392).  nprobe=0 selects all valid clusters."""
    d = med_data.shape[1]
    Q = _dots(q_data, med_data, quantized)
    dots = _reconstruct(Q, q_scale, q_zp, q_qsum, m_scale, m_zp, m_qsum, d, quantized)
    if euclidean:
        scores = -(q_norm2[:, None] + m_norm2[None, :] - 2.0 * dots)
    else:
        scores = dots
    scores = jnp.where(m_valid[None, :], scores, -jnp.inf)
    if nprobe > 0:
        kk = min(nprobe, med_data.shape[0])
        thr = jax.lax.top_k(scores, kk)[0][:, -1:]
        sel = scores >= thr
    else:
        sel = m_valid[None, :].repeat(q_data.shape[0], axis=0)
    sel = sel & (scores >= cluster_thr[:, None])
    sel = sel | always_scan[None, :]
    return sel, scores


# ---------------------------------------------------------------------------
# mesh (shard_map) programs: the TPU-native restatement of the reference's
# per-shard vector fan-out (reference search.rs:1698-1740, vector.rs:1202).
# Shard tensors are stacked [S, ...] and sharded over the mesh's "shards"
# axis; each device scans its S/D local shards and the per-shard top-k
# merges over ICI (all_gather; counts via psum).


def make_medoid_mesh(mesh, statics: dict):
    """Cluster-selection program.  Returns, replicated per device:
      any_sel bool[S, C_pad]  batch-union cluster selection per shard
                              (drives host tile selection),
      obs_cl  i32[B]          observed clusters per query (psum),
      obs_vec f32[B]          observed vectors per query (psum of selected
                              clusters' child counts; exact below 2^24).
    The observed counters mirror the reference's observed_cluster_count /
    observed_vector_count (reference search.rs:200-204)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    S = statics["S"]
    SL = S // int(mesh.devices.size)

    def body(med_data, m_scale, m_zp, m_qsum, m_norm2, m_valid, always_scan,
             sizes, q_data, q_scale, q_zp, q_qsum, q_norm2, cluster_thr):
        sels, ocl, ovec = [], 0, 0.0
        for j in range(SL):
            sel, _ = medoid_select(
                med_data[j], m_scale[j], m_zp[j], m_qsum[j], m_norm2[j],
                m_valid[j], always_scan[j],
                q_data, q_scale, q_zp, q_qsum, q_norm2, cluster_thr,
                quantized=statics["quantized"],
                euclidean=statics["euclidean"],
                nprobe=statics["nprobe"])
            # shards with fewer valid clusters than nprobe tie at -inf:
            # keep selection (and the observed counters) to real clusters
            sel = sel & m_valid[j][None, :]
            sels.append(jnp.any(sel, axis=0))
            ocl = ocl + jnp.sum(sel, axis=1, dtype=jnp.int32)
            ovec = ovec + sel.astype(jnp.float32) @ sizes[j]
        any_sel = jnp.stack(sels)                       # [SL, C_pad]
        any_all = jax.lax.all_gather(any_sel, "shards")  # [D, SL, C_pad]
        any_all = any_all.reshape(S, any_sel.shape[1])
        ocl = jax.lax.psum(ocl, "shards")
        ovec = jax.lax.psum(ovec, "shards")
        return any_all[None], ocl[None], ovec[None]

    in_specs = (P("shards"),) * 8 + (P(None),) * 6
    fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                   out_specs=(P("shards"),) * 3, check_vma=False)
    return jax.jit(lambda *a: tuple(x[0] for x in fn(*a)))


def make_vector_scan_mesh(mesh, statics: dict):
    """Tiled distance-scan program over the mesh.  Each device scans its
    local shards' selected tiles (or everything, exhaustive mode) and the
    candidates merge over ICI.  Returns (ts f32[B, S*k], gid i32[B, S*k],
    counts i32[B]) — gid = docid * S + shard (reference doc-id
    globalization, search.rs:1671); the host dedups multi-vector docs."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    S = statics["S"]
    SL = S // int(mesh.devices.size)
    k = statics["k"]

    def body(data, r_scale, r_zp, r_qsum, r_norm2, row_docid, row_field,
             deleted, tile_ids, field_ok,
             q_data, q_scale, q_zp, q_qsum, q_norm2, score_min):
        didx = jax.lax.axis_index("shards")
        ts_l, gid_l, cnt = [], [], 0
        for j in range(SL):
            ts, rows, c = vector_scan_topk(
                data[j], r_scale[j], r_zp[j], r_qsum[j], r_norm2[j],
                row_docid[j], row_field[j], deleted[j], tile_ids[j],
                field_ok,
                q_data, q_scale, q_zp, q_qsum, q_norm2, score_min,
                k=k, quantized=statics["quantized"],
                euclidean=statics["euclidean"],
                with_counts=statics["with_counts"],
                exhaustive=statics["exhaustive"],
                use_field_filter=statics["use_field_filter"])
            did = jnp.take(row_docid[j].reshape(-1), jnp.maximum(rows, 0))
            gid = did * S + (didx * SL + j)
            ts_l.append(ts)
            gid_l.append(gid)
            cnt = cnt + c
        B = ts_l[0].shape[0]
        ts_all = jax.lax.all_gather(jnp.stack(ts_l), "shards")
        gid_all = jax.lax.all_gather(jnp.stack(gid_l), "shards")
        cnt = jax.lax.psum(cnt, "shards")
        ts_m = jnp.transpose(ts_all, (2, 0, 1, 3)).reshape(B, S * k)
        gid_m = jnp.transpose(gid_all, (2, 0, 1, 3)).reshape(B, S * k)
        return ts_m[None], gid_m[None], cnt[None]

    in_specs = (P("shards"),) * 9 + (P(None),) * 7
    fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                   out_specs=(P("shards"),) * 3, check_vma=False)
    return jax.jit(lambda *a: tuple(x[0] for x in fn(*a)))
