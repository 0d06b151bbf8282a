"""Device lexical scoring: batched block-decode -> dense impact matrix ->
MXU matmul scoring -> fused running top-k.

This replaces the reference's per-query pointer-chasing query path
(reference intersection.rs / union.rs / add_result.rs SIMD loops) with a
TPU-native batched formulation:

  for each candidate 64K-doc block (lax.scan axis):
    1. ragged-range gather: the block's posting segments (one per query-term
       slot) are flattened into a fixed-width [P_max] posting window read
       from the HBM-resident CSR arrays;
    2. per-posting BM25F impact is computed on the VPU from (tf, doc-length
       component, field boosts) — formulas match add_result.rs:868-1484;
    3. impacts scatter into a dense impact matrix D[V, 65536] (the dense
       doc-domain form of the decoded posting block);
    4. scores for the whole query batch come from ONE matmul on the MXU:
       S[B, 65536] = W[B, V] @ D, with W[q, v] = idf of slot v in query q;
       boolean AND/NOT semantics come from a second matmul
       C = Mreq @ (D > 0) (required=+1, negated=-1e4) and the mask
       C >= n_required — the batched analog of the reference's
       intersection/union/NOT list walks;
    5. per-block lax.top_k merges into the running per-query top-k.

Block-max pruning happens in the host planner (plan.py) by selecting which
blocks enter the scan — the analog of the reference's max_block_score
early-exit (intersection.rs:2224-2300), restated as a two-phase
select-then-score so the device never needs data-dependent control flow.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..schema import BLOCK_SIZE, BM25_K

# postings per chunk == TPU lane width: the CSR arrays live in HBM as
# [P/128, 128] 2-D tensors and chunk loads are full-row gathers, which XLA
# lowers to contiguous 256-byte block transfers (measured 130 GB/s vs
# ~1 GB/s for element gathers on v5e)
CHUNK = 128
# 2-stage exact top-k: bucket count over the 64K-doc block axis
_TOPK_BUCKETS = 512


def fast_mode() -> bool:
    """bf16 MXU matmuls in the scoring kernel (~0.4% score error) — the
    analog of the reference's speedup flags vs its exact-result
    enable_search_quality_test mode (index.rs:117-118,1615).

    Default ON for TPU backends: the ~0.4% bf16 rounding is the same
    order as the reference's own SmallFloat u8 doc-length quantization
    (index.rs:4237-4279), and the boolean AND/NOT matrix C stays EXACT in
    bf16 (0/1 inputs, small-integer outputs, f32 accumulation).  CPU
    (tests, oracle parity) keeps f32.  Override: SEEKSTORM_TPU_FAST=1
    forces bf16, SEEKSTORM_TPU_EXACT=1 forces f32."""
    if os.environ.get("SEEKSTORM_TPU_FAST"):
        return True
    if os.environ.get("SEEKSTORM_TPU_EXACT"):
        return False
    import jax

    return jax.default_backend() != "cpu"


def _qsel_mask(qw, B: int):
    """Unpack a per-block query-selection bitmask word row -> bool[B]."""
    idx = jnp.arange(B, dtype=jnp.int32)
    words = qw.astype(jnp.uint32)
    return ((words[idx // 32] >> (idx % 32).astype(jnp.uint32)) & 1) > 0


def _block_step(
    pl_docid,      # u16[P]         (HBM, full shard)
    pl_tf,         # u16[P, F]
    comp,          # f32[NB_total*BLOCK_SIZE, F]
    deleted,       # bool[NB_total*BLOCK_SIZE]
    boosts,        # f32[V, F]
    W,             # f32[B, V]
    Mreq,          # f32[B, V]
    nreq,          # i32[B]
    bid,           # i32 scalar     block id for this step
    seg_off,       # i32[V]         posting offset per slot (-len 0 if absent)
    seg_len,       # i32[V]
    qw,            # i32[ceil(B/32)] per-query selection bits for this block
    P_max: int,
    dense_tf=None,     # u16[ND, BLOCK_SIZE, F] dense-term store (optional)
    dense_ids=None,    # i32[VD] dense rows for this block (-1 pad)
    dense_slots=None,  # i32[VD] W/Mreq column per dense entry
):
    """Decode + score one block for the whole query batch.

    Dense-term entries (>= lexindex.DENSE_MIN postings in the block) skip
    the window gather/scatter: their u16 tf columns row-gather from HBM and
    contribute to S/C via a rank-VD matmul — the kernel-side analog of the
    reference's roaring bitmap posting blocks.

    Returns (scores f32[B, BLOCK_SIZE] masked with -inf, matched bool[B, BLOCK_SIZE]).
    """
    V = seg_len.shape[0]
    F = pl_tf.shape[1]

    # ragged ranges -> flat posting window of size P_max.
    # slot-per-posting = searchsorted(cum, i, 'right'), built in O(P) as a
    # cumsum over segment-START markers (the naive [P_max, V] comparison
    # matrix costs ~60% of the whole scan; jnp.searchsorted lowers to a
    # serial loop — both are far slower).
    cum = jnp.cumsum(seg_len)
    total = cum[-1]
    pidx = jnp.arange(P_max, dtype=jnp.int32)
    # slot[i] = #{v : cum[v] <= i} = inclusive cumsum of segment-END markers
    # (a marker at exactly P_max is dropped, correctly: no i < P_max reaches
    # it; empty segments stack markers at the same position)
    markers = jnp.zeros((P_max,), jnp.int32).at[cum].add(1, mode="drop")
    slot = jnp.cumsum(markers)
    slot_c = jnp.minimum(slot, V - 1)
    prev = jnp.where(slot_c > 0, cum[jnp.maximum(slot_c - 1, 0)], 0)
    hbm_idx = seg_off[slot_c] + (pidx - prev)
    valid = pidx < total

    docid = jnp.take(pl_docid, hbm_idx, axis=0, mode="clip").astype(jnp.int32)
    tf = jnp.take(pl_tf, hbm_idx, axis=0, mode="clip").astype(jnp.float32)  # [P_max, F]
    compd = jnp.take(comp, bid * BLOCK_SIZE + docid, axis=0, mode="clip")   # [P_max, F]
    bst = jnp.take(boosts, slot_c, axis=0, mode="clip")                     # [P_max, F]

    sat = tf * (BM25_K + 1.0) / (tf + compd)          # 0 where tf == 0
    impact = jnp.sum(bst * sat, axis=1)               # [P_max]
    impact = jnp.where(valid, impact, 0.0)

    flat = slot_c * BLOCK_SIZE + docid                # collisions add 0 for invalid
    D = jnp.zeros((V * BLOCK_SIZE,), jnp.float32).at[flat].add(
        impact, mode="drop", unique_indices=False
    )
    D = D.reshape(V, BLOCK_SIZE)

    if fast_mode():
        # bf16 MXU matmuls with f32 accumulation (~0.4% score error)
        Db = D.astype(jnp.bfloat16)
        S = jnp.dot(W.astype(jnp.bfloat16), Db,
                    preferred_element_type=jnp.float32)
        C = jnp.dot(Mreq.astype(jnp.bfloat16), (D > 0).astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    else:
        S = W @ D                                      # [B, BLOCK_SIZE] MXU
        pres = (D > 0).astype(jnp.float32)
        C = Mreq @ pres                                # [B, BLOCK_SIZE] MXU

    if dense_tf is not None and dense_ids is not None \
            and dense_ids.shape[0] > 0 and dense_tf.shape[0] > 0:
        ok = dense_ids >= 0
        did = jnp.maximum(dense_ids, 0)
        slc = jnp.maximum(dense_slots, 0)
        dtf = jnp.take(dense_tf, did, axis=0).astype(jnp.float32)  # [VD,BLK,F]
        compb = jax.lax.dynamic_slice(
            comp, (bid * BLOCK_SIZE, 0), (BLOCK_SIZE, comp.shape[1])
        )                                                          # [BLK, F]
        dsat = dtf * (BM25_K + 1.0) / (dtf + compb[None])          # 0 at tf=0
        dbst = jnp.take(boosts, slc, axis=0)                       # [VD, F]
        dimp = jnp.sum(dsat * dbst[:, None, :], axis=2)            # [VD, BLK]
        dimp = jnp.where(ok[:, None], dimp, 0.0)
        Wd = jnp.where(ok[None, :], jnp.take(W, slc, axis=1), 0.0)
        Md = jnp.where(ok[None, :], jnp.take(Mreq, slc, axis=1), 0.0)
        S = S + Wd @ dimp
        C = C + Md @ (dimp > 0).astype(jnp.float32)

    del_block = jax.lax.dynamic_slice(deleted, (bid * BLOCK_SIZE,), (BLOCK_SIZE,))
    sel = _qsel_mask(qw, W.shape[0])
    matched = (S > 0) & (C >= nreq[:, None].astype(jnp.float32)) \
        & ~del_block[None, :] & sel[:, None]
    scores = jnp.where(matched, S, -jnp.inf)
    return scores, matched


@functools.partial(
    jax.jit,
    static_argnames=(
        "P_max", "k", "with_counts", "n_facets", "facet_codes_max",
        "use_sort_key", "sort_desc",
    ),
)
def lexical_scan(
    pl_docid, pl_tf, comp, deleted,
    block_ids, seg_off, seg_len, qsel_w,
    W, Mreq, nreq, boosts,
    facet_codes,   # i32[n_facets, NBtot*BLOCK] (dummy [1, 1] if n_facets == 0)
    sort_key,      # f32[NBtot*BLOCK]           (dummy [1] if not use_sort_key)
    dense_tf,      # u16[ND, BLOCK, F] dense-term store ([0, BLOCK, F] if none)
    dense_ids,     # i32[NB, VD] dense rows per block (VD may be 0)
    dense_slots,   # i32[NB, VD]
    *,
    P_max: int,
    k: int,
    with_counts: bool,
    n_facets: int,
    facet_codes_max: int,
    use_sort_key: bool,
    sort_desc: bool,
):
    """General lexical scan: score + top-k + (optional) facet counting and
    facet-field result ordering.

    Facet counting (reference add_result.rs:487 facet_count) accumulates a
    [n_facets, B, facet_codes_max] histogram over ALL matched docs via
    per-block scatter-adds.  With use_sort_key, the top-k ranks by the
    per-doc sort-key column (facet value / geo distance) instead of BM25
    (reference result_ordering_root min_heap.rs:56-545); sort_desc=False
    negates the key so lax.top_k yields ascending order.

    Returns (rank f32[B,k], ids i32[B,k], counts i32[B],
             fcounts f32[n_facets, B, facet_codes_max]).
    """
    B = W.shape[0]

    def step(carry, xs):
        ts, ti, cnt, fc = carry
        bid, off, ln, qw, did, dsl = xs
        pad = bid < 0
        bid_c = jnp.maximum(bid, 0)
        ln = jnp.where(pad, 0, ln)
        qw = jnp.where(pad, 0, qw)
        did = jnp.where(pad, -1, did)
        scores, matched = _block_step(
            pl_docid, pl_tf, comp, deleted, boosts, W, Mreq, nreq,
            bid_c, off, ln, qw, P_max,
            dense_tf=dense_tf, dense_ids=did, dense_slots=dsl,
        )
        if with_counts:
            cnt = cnt + jnp.sum(matched, axis=1, dtype=jnp.int32)
        if n_facets:
            fc = _facet_update(fc, matched, facet_codes, bid_c,
                               n_facets, facet_codes_max)
        if use_sort_key:
            key_b = jax.lax.dynamic_slice(
                sort_key, (bid_c * BLOCK_SIZE,), (BLOCK_SIZE,)
            )
            if not sort_desc:
                key_b = -key_b
            rank = jnp.where(matched, key_b[None, :], -jnp.inf)
        else:
            rank = scores
        kk = min(k, BLOCK_SIZE)
        bs, bi = jax.lax.top_k(rank, kk)
        bi = bid_c * BLOCK_SIZE + bi
        if k > BLOCK_SIZE:
            fill = k - BLOCK_SIZE
            bs = jnp.concatenate([bs, jnp.full((B, fill), -jnp.inf)], axis=1)
            bi = jnp.concatenate([bi, jnp.zeros((B, fill), jnp.int32)], axis=1)
        cs = jnp.concatenate([ts, bs], axis=1)
        ci = jnp.concatenate([ti, bi], axis=1)
        ts, sel = jax.lax.top_k(cs, k)
        ti = jnp.take_along_axis(ci, sel, axis=1)
        return (ts, ti, cnt, fc), None

    init = (
        jnp.full((B, k), -jnp.inf, jnp.float32),
        jnp.zeros((B, k), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((max(n_facets, 1), B, facet_codes_max), jnp.float32),
    )
    (ts, ti, cnt, fc), _ = jax.lax.scan(
        step, init, (block_ids, seg_off, seg_len, qsel_w, dense_ids,
                     dense_slots)
    )
    return ts, ti, cnt, fc


# ---------------------------------------------------------------------------
# impact fast path: chunked row-gather + scatter-free one-hot MXU decode
#
# This is the default scoring path (queries with the schema's default boost
# profile).  Per-posting BM25F impacts are precomputed at commit
# (lexindex.build_shard_lexical), so the kernel never touches tf/comp:
#
#   * the CSR arrays are stored 2-D [P/128, 128]; a "chunk" is one 128-wide
#     storage row restricted to [cs, ce) — the overlap of one (term, block)
#     posting segment with that row.  Chunk loads are full-row gathers
#     (contiguous 256/512-byte blocks), never element gathers.
#   * dense decode is TWO MXU matmuls instead of a scatter: with
#     docid = hi*256 + lo, the block's dense impact matrix per chunk is
#       D_c = A^T @ B,  A[p, h] = impact_p * (hi_p == h),  B[p, l] = (lo_p == l)
#     (docids are unique within a chunk, so no collisions).  XLA fuses the
#     one-hot compares into the matmul operands.
#   * scores come from S = (W @ OH) @ D_c and the boolean AND/NOT matrix
#     from C = (Mreq @ OH) @ (D_c > 0), where OH is the slot->chunk one-hot
#     (replacing the reference's intersection/union list walks,
#     intersection.rs:112, union.rs:32).
#   * per-block top-k is a 2-stage exact reduction: bucket-max over 512
#     buckets, top-k buckets, then top-k over the gathered candidates —
#     exact because fewer than k buckets can have max > the k-th score
#     (replaces lax.top_k on [B, 64K], ~5x faster).



def _facet_update(fc, matched, facet_codes, bid_c, n_facets: int,
                  fcm: int):
    """Per-block facet histogram accumulation over matched docs.

    Small code spaces use an MXU matmul of the 0/1 match matrix against
    the one-hot code matrix (exact counts: 0/1 bf16 inputs, f32
    accumulation, per-block sums <= 64K << 2^24) — the scatter-add it
    replaces runs ~50x off roofline on v5e and was ~0.2 ms/query of the
    faceted workloads.  Wide code spaces (raw numeric facets) keep the
    scatter."""
    B = matched.shape[0]
    mf16 = matched.astype(jnp.bfloat16)
    for fi in range(n_facets):
        codes_b = jax.lax.dynamic_slice(
            facet_codes[fi], (bid_c * BLOCK_SIZE,), (BLOCK_SIZE,))
        codes_b = jnp.clip(codes_b, 0, fcm - 1)
        if fcm <= 512:
            oh = (codes_b[:, None]
                  == jnp.arange(fcm, dtype=jnp.int32)[None, :]
                  ).astype(jnp.bfloat16)
            upd = jax.lax.dot_general(
                mf16, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            upd = jnp.zeros((B, fcm), jnp.float32).at[
                :, codes_b].add(matched.astype(jnp.float32))
        fc = fc.at[fi].add(upd)
    return fc


def _topk_block(rank, k: int):
    """Exact top-k over one 64K-doc block: (values [B, k], ids [B, k]).

    2-stage bucket reduction; the winning buckets' columns are extracted
    with a one-hot MXU einsum instead of take_along_axis (XLA gathers run
    10-100 ns/element on v5e — the matmul is ~50x cheaper here)."""
    B = rank.shape[0]
    if k > CHUNK:
        ts, ti = jax.lax.top_k(rank, min(k, BLOCK_SIZE))
        return ts, ti
    nb = _TOPK_BUCKETS
    sub = BLOCK_SIZE // nb                       # 128 docs per bucket
    # bucket-major layout (doc = j * sub + i) + ascending-sorted selected
    # buckets make the flat candidate order equal global docid order, so
    # lax.top_k's lowest-index tie rule yields EXACT oracle tie semantics
    # (score desc, docid asc membership AND order; oracle.topk_from_scores)
    xb = rank.reshape(B, nb, sub)
    bmax = xb.max(axis=2)                        # [B, nb]
    _, bti = jax.lax.top_k(bmax, k)              # [B, k] bucket ids
    bti = jnp.sort(bti, axis=1)                  # docid-ordered extraction
    oh = (bti[:, :, None] == jnp.arange(nb, dtype=jnp.int32)
          ).astype(rank.dtype)                   # [B, k, nb]
    # -inf * 0 = NaN in the extraction matmul: clamp, then restore
    # (values pass through the 0/1 matmul exactly in either dtype)
    xf = jnp.maximum(xb, jnp.finfo(rank.dtype).min)
    cand = jnp.einsum("bns,bjn->bjs", xf, oh,
                      preferred_element_type=jnp.float32)
    ts, tf_ = jax.lax.top_k(cand.reshape(B, k * sub), k)
    ts = jnp.where(ts <= jnp.float32(jnp.finfo(rank.dtype).min),
                   -jnp.inf, ts)
    jj = tf_ // sub
    i = tf_ % sub
    ti = jnp.take_along_axis(bti, jj, axis=1) * sub + i
    return ts, ti


def _block_step_imp(
    pl2_docid,     # u16[R, 128]   (HBM, full shard, row-major chunks)
    pl2_imp,       # f32[R, 128]   commit-time default-boost impacts
    deleted,       # bool[NB_total*BLOCK_SIZE]
    W,             # f32[B, V]
    Mreq,          # f32[B, V]
    nreq,          # i32[B]
    bid,           # i32 scalar    block id for this step
    c_row,         # i32[NW, NC]   storage row per chunk, per sub-window
    c_se,          # i32[NW, NC]   packed slot<<16 | cs<<8 | (ce-1)
    qw,            # i32[ceil(B/32)] per-query selection bits for this block
    bitmaps=None,      # u32[NBM, BLOCK_SIZE // 32] presence bitmaps
    sat1=None,         # f32[NBtot*BLOCK_SIZE] shared plain-posting impact
    bm_ids=None,       # i32[VB] bitmap rows for this block (-1 pad)
    bm_slots=None,     # i32[VB] W/Mreq column per bitmap entry
    fast: bool = False,
):
    """Decode + score one block for the whole query batch (impact path).

    The 64K-doc block is decoded in NW sub-windows of Z = 64K/NW docs
    (planner splits each segment's chunks per window from the commit-time
    window-split table): the one-hot decode einsum and the S/C score
    matmuls then cost 2*Z instead of 2*64K FLOPs per posting — on v5e
    this is ~2x wall per block at reference-scale chunk counts.  Docs
    outside a chunk's window self-mask (their hi one-hot row is all
    zero), so boundary chunks shared by two windows stay exact.

    Returns (scores f32[B, BLOCK_SIZE] masked with -inf, matched bool[B, BLOCK_SIZE]).
    """
    V = W.shape[1]
    NW, NC = c_row.shape
    Z = BLOCK_SIZE // NW
    exact = not fast
    dt = jnp.float32 if exact else jnp.bfloat16

    io = jnp.arange(Z // CHUNK, dtype=jnp.int32)
    lo_io = jnp.arange(CHUNK, dtype=jnp.int32)
    vio = jnp.arange(V, dtype=jnp.int32)
    lane = jnp.arange(CHUNK, dtype=jnp.int32)[None, :]

    Ss, Cs = [], []
    for w in range(NW):
        sw = c_se[w]
        slot = sw >> 16
        cs = (sw >> 8) & 0xFF
        ce = ((sw & 0xFF) + 1) & 0xFF            # padded chunks pack ce-1=255

        doc = jnp.take(pl2_docid, c_row[w], axis=0,
                       mode="clip").astype(jnp.int32)
        imp = jnp.take(pl2_imp, c_row[w], axis=0, mode="clip")   # [NC, 128]
        valid = (lane >= cs[:, None]) & (lane < ce[:, None])
        imp = jnp.where(valid, imp, 0.0)

        # slot -> chunk one-hot (tiny MXU matmuls instead of a column
        # gather); window-relative doc split hi*128 + lo
        ohf = (slot[None, :] == vio[:, None]).astype(dt)
        wd = doc - w * Z
        hi = wd >> 7
        lo = doc & 127
        Wc = jnp.dot(W.astype(dt), ohf, preferred_element_type=jnp.float32)
        Mc = jnp.dot(Mreq.astype(dt), ohf,
                     preferred_element_type=jnp.float32)
        A = (imp[..., None] * (hi[..., None] == io)).astype(dt)
        Bm = (lo[..., None] == lo_io).astype(dt)
        Dc = jnp.einsum(
            "nkh,nkl->nhl", A, Bm, preferred_element_type=jnp.float32
        ).reshape(NC, Z)
        if not exact:
            Dc = Dc.astype(dt)
        Ss.append(jnp.dot(Wc.astype(dt), Dc,
                          preferred_element_type=jnp.float32))
        Cs.append(jnp.dot(Mc.astype(dt), (Dc > 0).astype(dt),
                          preferred_element_type=jnp.float32))
    S = jnp.concatenate(Ss, axis=1) if NW > 1 else Ss[0]  # [B, 64K]
    C = jnp.concatenate(Cs, axis=1) if NW > 1 else Cs[0]

    if bitmaps is not None and bm_ids is not None \
            and bm_ids.shape[0] > 0 and bitmaps.shape[0] > 0:
        # presence-bitmap slots: unpack u32 words -> 0/1 matrix E, then
        # S += (W_b @ E) * sat1(d) and C += M_b @ E.  Plain postings all
        # share the per-doc sat1 impact (see lexindex.BITMAP_MIN), so the
        # bitmap needs no per-posting decode at all — the TPU analog of
        # the reference's roaring Bitmap blocks (compress_postinglist.rs).
        ok = bm_ids >= 0
        bi_ = jnp.maximum(bm_ids, 0)
        slc = jnp.maximum(bm_slots, 0)
        rows = jnp.take(bitmaps, bi_, axis=0).astype(jnp.uint32)
        bits = (rows[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)) & 1
        VB = bm_ids.shape[0]
        s1 = jax.lax.dynamic_slice(sat1, (bid * BLOCK_SIZE,), (BLOCK_SIZE,))
        Wb = jnp.where(ok[None, :], jnp.take(W, slc, axis=1), 0.0)
        Mb = jnp.where(ok[None, :], jnp.take(Mreq, slc, axis=1), 0.0)
        if exact:
            E = bits.reshape(VB, BLOCK_SIZE).astype(jnp.float32)
            S = S + (Wb @ E) * s1[None, :]
            C = C + Mb @ E
        else:
            E = bits.reshape(VB, BLOCK_SIZE).astype(jnp.bfloat16)
            S = S + jnp.dot(Wb.astype(jnp.bfloat16), E,
                            preferred_element_type=jnp.float32) * s1[None, :]
            C = C + jnp.dot(Mb.astype(jnp.bfloat16), E,
                            preferred_element_type=jnp.float32)

    del_block = jax.lax.dynamic_slice(deleted, (bid * BLOCK_SIZE,), (BLOCK_SIZE,))
    sel = _qsel_mask(qw, W.shape[0])
    matched = (S > 0) & (C >= nreq[:, None].astype(jnp.float32)) \
        & ~del_block[None, :] & sel[:, None]
    scores = jnp.where(matched, S, -jnp.inf)
    if fast:
        # bf16 rank halves the [B, 64K] top-k epilogue traffic (the
        # per-block HBM floor); extracted values restore to f32 and the
        # added rounding is the same order as the bf16 score matmuls
        scores = scores.astype(jnp.bfloat16)
    return scores, matched


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "with_counts", "n_facets", "facet_codes_max",
        "use_sort_key", "sort_desc", "fast",
    ),
)
def lexical_scan_imp(
    pl2_docid, pl2_imp, deleted,
    block_ids,     # i32[NB]        (-1 = padding step)
    c_row,         # i32[NB, NC]
    c_se,          # i32[NB, NC]    packed slot<<16 | cs<<8 | (ce-1)
    qsel_w,        # i32[NB, ceil(B/32)] per-query block-selection bits
    W, Mreq, nreq,
    facet_codes,   # i32[n_facets, NBtot*BLOCK] (dummy [1, 1] if n_facets == 0)
    sort_key,      # f32[NBtot*BLOCK]           (dummy [1] if not use_sort_key)
    bitmaps,       # u32[NBM, BLOCK // 32] ([0, BLOCK // 32] if none)
    sat1,          # f32[NBtot*BLOCK]
    bm_ids,        # i32[NB, VB]
    bm_slots,      # i32[NB, VB]
    *,
    k: int,
    with_counts: bool,
    n_facets: int,
    facet_codes_max: int,
    use_sort_key: bool,
    sort_desc: bool,
    fast: bool = False,
):
    """Impact-path lexical scan (see module docstring): score + top-k +
    (optional) facet counting and facet-field result ordering.

    Returns (rank f32[B,k], ids i32[B,k], counts i32[B],
             fcounts f32[n_facets, B, facet_codes_max])."""
    B = W.shape[0]

    def step(carry, xs):
        ts, ti, cnt, fc = carry
        bid, row_b, se_b, qw, bmi, bms = xs
        pad = bid < 0
        bid_c = jnp.maximum(bid, 0)
        # padded steps: force all chunks empty (packed low byte 255 decodes
        # to ce=0 after the +1 & 0xFF wrap in _block_step_imp)
        se_b = jnp.where(pad, jnp.int32(0xFF), se_b)
        qw = jnp.where(pad, 0, qw)
        bmi = jnp.where(pad, -1, bmi)
        scores, matched = _block_step_imp(
            pl2_docid, pl2_imp, deleted, W, Mreq, nreq,
            bid_c, row_b, se_b, qw,
            bitmaps=bitmaps, sat1=sat1, bm_ids=bmi, bm_slots=bms, fast=fast,
        )
        if with_counts:
            cnt = cnt + jnp.sum(matched, axis=1, dtype=jnp.int32)
        if n_facets:
            fc = _facet_update(fc, matched, facet_codes, bid_c,
                               n_facets, facet_codes_max)
        if use_sort_key:
            key_b = jax.lax.dynamic_slice(
                sort_key, (bid_c * BLOCK_SIZE,), (BLOCK_SIZE,)
            )
            if not sort_desc:
                key_b = -key_b
            rank = jnp.where(matched, key_b[None, :], -jnp.inf)
        else:
            rank = scores
        bs, bi = _topk_block(rank, min(k, BLOCK_SIZE))
        bi = bid_c * BLOCK_SIZE + bi
        if k > BLOCK_SIZE:
            fill = k - BLOCK_SIZE
            bs = jnp.concatenate([bs, jnp.full((B, fill), -jnp.inf)], axis=1)
            bi = jnp.concatenate([bi, jnp.zeros((B, fill), jnp.int32)], axis=1)
        cs_ = jnp.concatenate([ts, bs], axis=1)
        ci = jnp.concatenate([ti, bi], axis=1)
        ts, sel = jax.lax.top_k(cs_, k)
        ti = jnp.take_along_axis(ci, sel, axis=1)
        return (ts, ti, cnt, fc), None

    init = (
        jnp.full((B, k), -jnp.inf, jnp.float32),
        jnp.zeros((B, k), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((max(n_facets, 1), B, facet_codes_max), jnp.float32),
    )
    (ts, ti, cnt, fc), _ = jax.lax.scan(
        step, init, (block_ids, c_row, c_se, qsel_w, bm_ids, bm_slots)
    )
    return ts, ti, cnt, fc


# ---------------------------------------------------------------------------
# query-tiled pruned scan: one step = (block, <=QT selecting queries)
#
# The full-batch scan above scores every scanned block against the whole
# query batch — [B, 64K] score/presence traffic per block — even though a
# pruned plan selects only ~PRUNE_BLOCKS blocks per query.  At reference
# scale (5M docs = 77 blocks) that makes per-batch work NB x B instead of
# sum(|selected_q|): ~5x waste.  This variant restates the scan over
# (block, query-tile) pairs: each step decodes one block's chunks for a
# tile of <= QT queries that actually selected it, scores [QT, 64K], and
# merges that tile's top-k into the per-query running top-k with a
# gather/scatter on the carry (row B of the carry is a write-off dummy for
# padding).  The per-step decode/score shapes shrink with tile occupancy,
# so batch work tracks the pruned plan, not the batch size.
#
# Used for Topk-only pruned plans (counts/facets/sort force full coverage
# and ride the full-batch kernels above).

QT = 32  # queries per tile == one selection-bitmask word


@functools.partial(
    jax.jit, static_argnames=("k", "fast"),
)
def lexical_scan_qt(
    pl2_docid, pl2_imp, deleted,
    block_ids,     # i32[T]        (-1 = padding step)
    c_row,         # i32[T, NC]
    c_se,          # i32[T, NC]    packed slot<<16 | cs<<8 | (ce-1)
    qids,          # i32[T, QT]    batch rows of this tile (-1 pad)
    W, Mreq, nreq,
    bitmaps,       # u32[NBM, BLOCK // 32] ([0, BLOCK // 32] if none)
    sat1,          # f32[NBtot*BLOCK]
    bm_ids,        # i32[T, VB]
    bm_slots,      # i32[T, VB]
    *,
    k: int,
    fast: bool = False,
):
    """Query-tiled pruned lexical scan.  Returns (rank f32[B,k],
    ids i32[B,k]) — counts/facets are not produced (pruned plans never
    carry them)."""
    B = W.shape[0]
    qt = qids.shape[1]

    def step(carry, xs):
        ts, ti = carry
        bid, row_b, se_b, qid, bmi, bms = xs
        pad = bid < 0
        bid_c = jnp.maximum(bid, 0)
        se_b = jnp.where(pad, jnp.int32(0xFF), se_b)
        bmi = jnp.where(pad, -1, bmi)
        qid = jnp.where(pad, -1, qid)

        ok = qid >= 0
        qc = jnp.maximum(qid, 0)
        Wg = jnp.where(ok[:, None], jnp.take(W, qc, axis=0), 0.0)
        Mg = jnp.where(ok[:, None], jnp.take(Mreq, qc, axis=0), 0.0)
        ng = jnp.take(nreq, qc)
        # tile-local selection bitmask: pad rows masked out
        bits = jnp.where(
            ok, jnp.uint32(1) << jnp.arange(qt, dtype=jnp.uint32),
            jnp.uint32(0),
        )
        qw = jax.lax.bitcast_convert_type(
            jnp.sum(bits, dtype=jnp.uint32)[None], jnp.int32)

        scores, _ = _block_step_imp(
            pl2_docid, pl2_imp, deleted, Wg, Mg, ng,
            bid_c, row_b, se_b, qw,
            bitmaps=bitmaps, sat1=sat1, bm_ids=bmi, bm_slots=bms, fast=fast,
        )
        kk = min(k, BLOCK_SIZE)
        bs, bi = _topk_block(scores, kk)
        bi = bid_c * BLOCK_SIZE + bi
        if k > BLOCK_SIZE:
            fill = k - BLOCK_SIZE
            bs = jnp.concatenate([bs, jnp.full((qt, fill), -jnp.inf)], axis=1)
            bi = jnp.concatenate([bi, jnp.zeros((qt, fill), jnp.int32)], axis=1)
        # merge this tile's top-k into the carry rows it owns (dummy row B
        # absorbs padding writes; qids are unique within a step)
        qrow = jnp.where(ok, qid, B)
        cur_s = jnp.take(ts, qrow, axis=0)
        cur_i = jnp.take(ti, qrow, axis=0)
        cs_ = jnp.concatenate([cur_s, bs], axis=1)
        ci = jnp.concatenate([cur_i, bi], axis=1)
        ms, sel = jax.lax.top_k(cs_, k)
        mi = jnp.take_along_axis(ci, sel, axis=1)
        ts = ts.at[qrow].set(ms)
        ti = ti.at[qrow].set(mi)
        return (ts, ti), None

    init = (
        jnp.full((B + 1, k), -jnp.inf, jnp.float32),
        jnp.zeros((B + 1, k), jnp.int32),
    )
    (ts, ti), _ = jax.lax.scan(
        step, init, (block_ids, c_row, c_se, qids, bm_ids, bm_slots)
    )
    return ts[:B], ti[:B]
