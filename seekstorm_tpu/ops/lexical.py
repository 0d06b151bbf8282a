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


def fast_mode() -> bool:
    """bf16 MXU matmuls in the scoring kernel (~0.4% score error) — the
    analog of the reference's speedup flags vs its exact-result
    enable_search_quality_test mode (index.rs:117-118,1615)."""
    return bool(os.environ.get("SEEKSTORM_TPU_FAST"))


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
    matched = (S > 0) & (C >= nreq[:, None].astype(jnp.float32)) & ~del_block[None, :]
    scores = jnp.where(matched, S, -jnp.inf)
    return scores, matched


@functools.partial(
    jax.jit, static_argnames=("P_max", "k", "with_counts")
)
def score_shard(
    pl_docid,    # u16[P]
    pl_tf,       # u16[P, F]
    comp,        # f32[n_blocks*BLOCK_SIZE, F]
    deleted,     # bool[n_blocks*BLOCK_SIZE]
    block_ids,   # i32[NB]        (-1 = padding step)
    seg_off,     # i32[NB, V]
    seg_len,     # i32[NB, V]
    W,           # f32[B, V]
    Mreq,        # f32[B, V]
    nreq,        # i32[B]
    boosts,      # f32[V, F]
    *,
    P_max: int,
    k: int,
    with_counts: bool,
):
    """Score a plan of NB candidate blocks for a batch of B queries on one shard.

    Returns (topk_scores f32[B, k], topk_ids i32[B, k] shard-local doc ids,
    counts i32[B] — matched-doc count over the scanned blocks, meaningful when
    the plan covers all candidate blocks).
    """
    B = W.shape[0]

    def step(carry, xs):
        ts, ti, cnt = carry
        bid, off, ln = xs
        pad = bid < 0
        bid_c = jnp.maximum(bid, 0)
        ln = jnp.where(pad, 0, ln)
        scores, matched = _block_step(
            pl_docid, pl_tf, comp, deleted, boosts, W, Mreq, nreq,
            bid_c, off, ln, P_max,
        )
        if with_counts:
            cnt = cnt + jnp.sum(matched, axis=1, dtype=jnp.int32)
        bs, bi = jax.lax.top_k(scores, min(k, BLOCK_SIZE))
        bi = bid_c * BLOCK_SIZE + bi
        if k > BLOCK_SIZE:
            fill = k - BLOCK_SIZE
            bs = jnp.concatenate([bs, jnp.full((B, fill), -jnp.inf)], axis=1)
            bi = jnp.concatenate([bi, jnp.zeros((B, fill), jnp.int32)], axis=1)
        cs = jnp.concatenate([ts, bs], axis=1)
        ci = jnp.concatenate([ti, bi], axis=1)
        ts, sel = jax.lax.top_k(cs, k)
        ti = jnp.take_along_axis(ci, sel, axis=1)
        return (ts, ti, cnt), None

    init = (
        jnp.full((B, k), -jnp.inf, jnp.float32),
        jnp.zeros((B, k), jnp.int32),
        jnp.zeros((B,), jnp.int32),
    )
    (ts, ti, cnt), _ = jax.lax.scan(
        step, init, (block_ids, seg_off, seg_len)
    )
    return ts, ti, cnt


@functools.partial(
    jax.jit,
    static_argnames=(
        "P_max", "k", "with_counts", "n_facets", "facet_codes_max",
        "use_sort_key", "sort_desc",
    ),
)
def lexical_scan(
    pl_docid, pl_tf, comp, deleted,
    block_ids, seg_off, seg_len,
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
        bid, off, ln, did, dsl = xs
        pad = bid < 0
        bid_c = jnp.maximum(bid, 0)
        ln = jnp.where(pad, 0, ln)
        did = jnp.where(pad, -1, did)
        scores, matched = _block_step(
            pl_docid, pl_tf, comp, deleted, boosts, W, Mreq, nreq,
            bid_c, off, ln, P_max,
            dense_tf=dense_tf, dense_ids=did, dense_slots=dsl,
        )
        if with_counts:
            cnt = cnt + jnp.sum(matched, axis=1, dtype=jnp.int32)
        if n_facets:
            mf = matched.astype(jnp.float32)
            for fi in range(n_facets):
                codes_b = jax.lax.dynamic_slice(
                    facet_codes[fi], (bid_c * BLOCK_SIZE,), (BLOCK_SIZE,)
                )
                upd = jnp.zeros((B, facet_codes_max), jnp.float32).at[
                    :, jnp.clip(codes_b, 0, facet_codes_max - 1)
                ].add(mf)
                fc = fc.at[fi].add(upd)
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
        step, init, (block_ids, seg_off, seg_len, dense_ids, dense_slots)
    )
    return ts, ti, cnt, fc


@functools.partial(jax.jit, static_argnames=("P_max",))
def count_shard(
    pl_docid, pl_tf, comp, deleted,
    block_ids, seg_off, seg_len,
    W, Mreq, nreq, boosts,
    *, P_max: int,
):
    """Count-only pass (result_type Count): matched docs per query over the
    full candidate block set (reference union.rs:807 union_count analog)."""

    def step(cnt, xs):
        bid, off, ln = xs
        pad = bid < 0
        bid_c = jnp.maximum(bid, 0)
        ln = jnp.where(pad, 0, ln)
        _, matched = _block_step(
            pl_docid, pl_tf, comp, deleted, boosts, W, Mreq, nreq,
            bid_c, off, ln, P_max,
        )
        return cnt + jnp.sum(matched, axis=1, dtype=jnp.int32), None

    B = W.shape[0]
    cnt, _ = jax.lax.scan(
        step, jnp.zeros((B,), jnp.int32), (block_ids, seg_off, seg_len)
    )
    return cnt
