"""Posting-space join scoring: per-query posting windows + batched
sorted-list joins.  Work per query is O(sum of its terms' posting counts)
— the TPU-native restatement of the reference's galloping posting-list
intersection (reference intersection.rs:112-2300, union.rs:32-760,
add_result.rs:38-1484), replacing pointer-chasing with fixed-shape
vectorized binary searches.

Where the doc-space kernels (ops/lexical.py) decode postings into a dense
64K-doc block domain and score the batch with MXU matmuls — work per batch
proportional to corpus size — this path never leaves posting space:

  1. every (query, slot) gathers its term's postings as 128-wide chunk
     rows from the compacted CSR (contiguous per term, so global docids
     are already sorted);
  2. candidates are the union of all slots' postings; every candidate is
     joined against every other slot by a batched binary search over that
     slot's sorted window (lower_bound, log2(PW) gather steps);
  3. high-df "bitmap" slots (lexindex.BITMAP_MIN) test membership with a
     bitmap word gather instead (their plain postings are not in the CSR)
     and contribute the shared per-doc sat1 impact; their own candidates
     come from a commit-time top-STASH_K impact stash plus the CSR
     residual — exact for top-k <= STASH_K because any non-stash
     bitmap-only doc is dominated by >= STASH_K stash docs of its block;
  4. exact BM25 scores accumulate per candidate; AND/NOT semantics come
     from required-presence counts and negated-presence hits; duplicates
     (a doc candidate in several slots) resolve by lowest-slot ownership;
  5. one top-k over the candidate axis finishes the query — no per-block
     scan, no pruning, no escalation: the window covers the term's whole
     posting list, so results are exact by construction.

Queries ride this path only when every slot fits a window (search.py
_join_eligible); counts, facets, sorting, phrases, deletes and
multi-bitmap queries stay on the doc-space kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..schema import BLOCK_SIZE

# hard cap for window sizing (search.py enforces at plan time)
PW_MAX = 1 << 18


def _lower_bound(tw_flat, lo0, hi0, cand, PW: int):
    """Batched lower_bound of cand[B, V, PW] in per-row sorted ranges
    [lo0, hi0) of tw_flat ([B*PW] flattened target windows).

    A lax.fori_loop (not an unrolled python loop: XLA compile time on the
    ~18-step unroll x several call sites was minutes per shape) carries
    (pos, step-size); each step is one flat gather + compare.

    Returns (pos i32[B, V, PW], found bool[B, V, PW]).
    """
    B, V, _ = cand.shape
    base = (jnp.arange(B, dtype=jnp.int32) * PW)[:, None, None]
    pos0 = jnp.broadcast_to(lo0[:, None, None], cand.shape)
    hib = hi0[:, None, None]
    steps = max(PW.bit_length(), 1)

    def body(_i, st):
        pos, sz = st
        npos = pos + sz
        g = jnp.take(tw_flat, base + jnp.clip(npos - 1, 0, PW - 1),
                     axis=0)
        ok = (npos <= hib) & (g < cand)
        return jnp.where(ok, npos, pos), sz >> 1

    pos, _ = jax.lax.fori_loop(
        0, steps, body, (pos0, jnp.int32(1 << (steps - 1))))
    g = jnp.take(tw_flat, base + jnp.clip(pos, 0, PW - 1), axis=0)
    found = (pos < hib) & (g == cand)
    return pos, found


def _topk_flat(rank, k: int):
    """Exact top-k over [B, N]; 2-stage bucket reduction for large N."""
    B, N = rank.shape
    if N <= 16384 or k > 512:
        return jax.lax.top_k(rank, min(k, N))
    nb = 1024
    sub = N // nb
    xb = rank.reshape(B, sub, nb)          # idx = i * nb + j
    bmax = xb.max(axis=1)
    _, bti = jax.lax.top_k(bmax, k)
    cand = jnp.take_along_axis(xb, bti[:, None, :], axis=2)
    ts, tf_ = jax.lax.top_k(cand.reshape(B, sub * k), k)
    i = tf_ // k
    j = tf_ % k
    return ts, i * nb + jnp.take_along_axis(bti, j, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "PW", "has_bm"))
def join_scan(
    dev_docid2,    # u16[R, 128]  compacted CSR docids (+ stash rows)
    dev_imp2,      # f32[R, 128]  per-posting impacts (stash rows: sat1)
    sat1,          # f32[NBtot*BLOCK] shared plain-posting impact
    bitmaps,       # u32[NBM, BLOCK // 32] presence bitmaps
    rows,          # i32[B, V, NR] storage rows per slot window (-1 pad)
    packA,         # i32[B, V]    first_lane<<24 | len   (sorted CSR range)
    packB,         # i32[B, V]    first_lane<<13 | len   (sorted stash range)
    segp,          # i32[B, V, NS] lane<<12 | block per segment start (-1 pad)
    rowtab,        # i32[B, NBp]  bitmap row per block for the BM slot (-1)
    W,             # f32[B, V]    idf weights (0 = non-scoring/negated)
    isreq,         # bool[B, V]
    isneg,         # bool[B, V]
    nreq,          # i32[B]
    *,
    k: int,
    PW: int,       # window lanes per slot == NR * 128
    has_bm: bool,  # slot V-1 may be a bitmap slot
):
    """Returns (scores f32[B, k] (-inf pad), ids i32[B, k] local
    block*BLOCK_SIZE + docid)."""
    B, V, NR = rows.shape

    lane = jnp.arange(PW, dtype=jnp.int32)
    rc = jnp.maximum(rows, 0).reshape(-1)
    d16 = jnp.take(dev_docid2, rc, axis=0, mode="clip") \
        .reshape(B, V, PW).astype(jnp.int32)
    imp = jnp.take(dev_imp2, rc, axis=0, mode="clip").reshape(B, V, PW)

    a0 = packA >> 24
    la = packA & 0xFFFFFF
    b0 = packB >> 13
    lb = packB & 0x1FFF
    inA = (lane >= a0[..., None]) & (lane < (a0 + la)[..., None])
    inB = (lane >= b0[..., None]) & (lane < (b0 + lb)[..., None])
    valid = inA | inB

    # per-lane block id: scatter (block+1) at segment-start lanes, cummax
    pos_s = jnp.where(segp >= 0, segp >> 12, PW)
    blk_s = segp & 0xFFF
    marks = jnp.zeros((B, V, PW), jnp.int32).at[
        jnp.arange(B, dtype=jnp.int32)[:, None, None],
        jnp.arange(V, dtype=jnp.int32)[None, :, None],
        pos_s,
    ].max(blk_s + 1, mode="drop")
    blk = jax.lax.cummax(marks, axis=2) - 1
    blkc = jnp.maximum(blk, 0)
    gdoc = blkc * BLOCK_SIZE + d16                 # i32, sorted within inA

    gflat = gdoc.reshape(B * V, PW)

    score = jnp.zeros((B, V, PW), jnp.float32)
    reqcnt = jnp.zeros((B, V, PW), jnp.int32)
    neghit = jnp.zeros((B, V, PW), bool)
    owned = valid
    varange = jnp.arange(V, dtype=jnp.int32)[None, :, None]

    if has_bm:
        NBp = rowtab.shape[1]
        s1c = jnp.take(sat1, jnp.clip(gdoc, 0, sat1.shape[0] - 1), axis=0)

    for u in range(V):
        twf = gdoc[:, u, :].reshape(-1)
        tif = imp[:, u, :].reshape(-1)
        posu, fnd = _lower_bound(twf, a0[:, u], (a0 + la)[:, u], gdoc, PW)
        base = (jnp.arange(B, dtype=jnp.int32) * PW)[:, None, None]
        fimp = jnp.take(tif, base + jnp.clip(posu, 0, PW - 1), axis=0)
        present = fnd
        imp_u = jnp.where(fnd, fimp, 0.0)
        gen_u = fnd
        if has_bm and u == V - 1:
            # bitmap membership (plain postings) + stash-range ownership
            brow = jnp.take(
                rowtab.reshape(-1),
                jnp.arange(B, dtype=jnp.int32)[:, None, None] * NBp
                + jnp.minimum(blkc, NBp - 1),
                axis=0,
            )
            word = jnp.take(
                bitmaps.reshape(-1).astype(jnp.uint32),
                jnp.maximum(brow, 0) * (BLOCK_SIZE // 32)
                + ((gdoc & 0xFFFF) >> 5),
                axis=0, mode="clip",
            )
            bit = ((word >> (gdoc & 31).astype(jnp.uint32)) & 1) > 0
            bmpres = (brow >= 0) & bit
            present = present | bmpres
            imp_u = jnp.where(fnd, fimp, jnp.where(bmpres, s1c, 0.0))
            _, fndB = _lower_bound(twf, b0[:, u], (b0 + lb)[:, u], gdoc, PW)
            gen_u = fnd | fndB
        score = score + W[:, u][:, None, None] * imp_u * present
        reqcnt = reqcnt + (isreq[:, u][:, None, None] & present)
        neghit = neghit | (isneg[:, u][:, None, None] & present)
        owned = owned & ~(gen_u & (u < varange))

    ok = (
        valid & owned & ~isneg[..., None]
        & (reqcnt >= nreq[:, None, None])
        & ~neghit
        & (score > 0)
    )
    rank = jnp.where(ok, score, -jnp.inf).reshape(B, V * PW)
    ts, sel = _topk_flat(rank, k)
    ids = jnp.take_along_axis(gdoc.reshape(B, V * PW), sel, axis=1)
    if ts.shape[1] < k:
        pad = k - ts.shape[1]
        ts = jnp.concatenate(
            [ts, jnp.full((B, pad), -jnp.inf, jnp.float32)], axis=1)
        ids = jnp.concatenate([ids, jnp.zeros((B, pad), jnp.int32)], axis=1)
    return ts, ids
