"""Bucket-WAND lexical engine: packed-bitmap upper-bound scan + exact rescore.

This is the default Topk/TopkCount/Count path at reference scale.  The dense
doc-domain kernels (ops/lexical.py) score every (query, doc) pair in a 64K
block — Θ(B x N_docs) work per batch, which stops scaling past ~1M docs.
This engine restates the reference's block-max WAND early-exit
(reference intersection.rs:2224-2300, index.rs:781-789) at 32-doc *bucket*
granularity, in three phases:

  1. device UB scan (one dispatch): every (term, block) segment is cached in
     HBM as a packed 64K-bit presence bitmap (u32[2048]: word w = docs
     [32w, 32w+32)) plus C impact-band rows (one bit per *bucket* = per
     word, u32[64]) with each band's exact max impact.  Per scan step
     (block) the kernel computes, fully packed:
       * matched words  = AND(required) & OR(positive) & ~OR(negated)
                          & ~deleted           (reference boolean semantics,
                          search.rs:59-69, add_result.rs matched checks)
       * exact result counts = popcount(matched)  (Count/TopkCount,
                          reference add_result.rs count paths)
       * per-bucket score upper bound UB = sum_t idf_t * max_band(present)
         via a [B, V] x [V, 2048] matmul — the bucket-granular analog of
         max_block_score (index.rs:781-789)
  2. hierarchical exact top-(M+1) buckets per query over all blocks
     (fewer than M buckets can hold the true top-k if the (M+1)-th UB is
     below the k-th exact score — the WAND termination criterion);
  3. host exact rescore of the <= 32*M candidate docs per query from the
     full CSR (f32, oracle-identical accumulation), with an escalation
     ladder M=64 -> 256 -> 1024 and a final fallback to the dense kernel.

All per-slot device state (presence row ids, band row ids, band maxima)
lives in HBM pools uploaded once per (query term); the per-batch upload is
a single packed i32 buffer of a few KB (slot map + term table + weights) —
per-transfer latency through the TPU tunnel dominates small transfers, the
same design rule as parallel/mesh.py's one-buffer plan upload.

Scaling: device work is Θ(B * T * C * N_docs / 32) bit-ops + one thin
matmul per block — ~50x less than the dense kernels at 5M docs — and the
candidate rescore tracks the result set, not the corpus.
"""

from __future__ import annotations

import functools
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..schema import BLOCK_SIZE

NW = BLOCK_SIZE // 32          # packed words per block == buckets per block
NZW = NW // 32                 # words per band bucket-nz row
BUCKET = 32                    # docs per bucket (one u32 word)
C_BANDS = 8                    # impact bands per (term, block) segment
T_MAX = 8                      # max term slots per query on this path
M_LADDER = (64, 256, 1024)     # candidate-bucket escalation ladder
# UB inflation: phase-1 UBs are computed with a bf16 matmul; inflating the
# band maxima keeps UB >= exact under rounding, so the WAND termination
# check (kth_exact >= next_ub) stays sound.
UB_INFLATE = np.float32(1.02)
# default-on threshold: blocks per largest shard (16 blocks = 1M docs);
# below it the dense kernels win (one decode serves the whole batch)
WAND_MIN_BLOCKS = int(os.environ.get("SEEKSTORM_TPU_WAND_MIN_BLOCKS", "16"))


def wand_enabled() -> bool:
    return not os.environ.get("SEEKSTORM_TPU_NO_WAND")


def wand_forced() -> bool:
    return bool(os.environ.get("SEEKSTORM_TPU_WAND"))


def wand_auto(index) -> bool:
    """Default routing: on for TPU backends at reference scale; tests force
    with SEEKSTORM_TPU_WAND=1 on the CPU backend."""
    if not wand_enabled():
        return False
    if wand_forced():
        return True
    if max(sh.lexical.n_blocks for sh in index.shards) < WAND_MIN_BLOCKS:
        return False
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# device kernel


@functools.partial(jax.jit, static_argnames=("V", "Bq", "T", "S", "M",
                                             "with_counts"))
def wand_scan(
    ppool,      # u32[PR, NW]         presence rows
    cpool,      # u32[PC, NZW]        band bucket-nz rows
    sp_prow,    # i32[NS, NBLK]       presence row per (slot row, block), -1
    sp_crow,    # i32[NS, NBLK, C]    band row per (slot row, block, band)
    sp_bandub,  # f32[NS, NBLK, C]    band max impact (0 for empty)
    delw,       # u32[NBLK, NW]       deleted-doc words
    sid,        # i32[NBLK]           shard of each block
    qargs,      # i32[...]            packed per-batch args (see _pack_qargs)
    *,
    V: int, Bq: int, T: int, S: int,
    M: int,
    with_counts: bool,
):
    """Phase 1+2.  Returns packed f32[Bq, 2(M+1)+1]:
    [ub_s | ub_i | count] per query.  ub_i are global bucket ids
    block*NW + word (exact in f32 below 2^24); ub_s is sorted descending
    with -inf padding; entry M is the best UNSELECTED bucket's UB (the
    escalation threshold)."""
    NBLK = sp_prow.shape[1]
    slotmap, tslot, treq, tneg, wshard = _unpack_qargs(qargs, V, Bq, T, S)

    # slot-table gather: [V, NBLK...] once per dispatch (device-side join
    # of the batch's slots against the resident per-slot pools)
    sm_ok = slotmap >= 0
    sm_c = jnp.maximum(slotmap, 0)
    prow = jnp.where(sm_ok[:, None], jnp.take(sp_prow, sm_c, axis=0), -1).T
    crow = jnp.where(sm_ok[:, None, None],
                     jnp.take(sp_crow, sm_c, axis=0), -1)
    crow = jnp.swapaxes(crow, 0, 1)                   # [NBLK, V, C]
    bandub = jnp.where(sm_ok[:, None, None],
                       jnp.take(sp_bandub, sm_c, axis=0), 0.0)
    bandub = jnp.swapaxes(bandub, 0, 1)               # [NBLK, V, C]

    ts_ok = tslot >= 0
    ts_c = jnp.maximum(tslot, 0)
    bit32 = jnp.arange(32, dtype=jnp.uint32)

    # per-query slot weight matrix for the UB matmul (one-hot scatter of
    # idf weights; negated slots contribute no UB)
    oh = (ts_c[:, :, None] == jnp.arange(V, dtype=jnp.int32)) \
        & ts_ok[:, :, None] & (~tneg)[:, :, None]

    def step(cnt, xs):
        prow_b, crow_b, bandub_b, delw_b, sid_b = xs

        pres = jnp.take(ppool, jnp.maximum(prow_b, 0), axis=0)
        pres = jnp.where((prow_b >= 0)[:, None], pres, 0)        # [V, NW]

        pt = jnp.take(pres, ts_c.reshape(-1), axis=0).reshape(Bq, T, NW)
        pt = jnp.where(ts_ok[:, :, None], pt, 0)

        ones = jnp.uint32(0xFFFFFFFF)
        andw = jnp.full((Bq, NW), ones)
        posw = jnp.zeros((Bq, NW), jnp.uint32)
        negw = jnp.zeros((Bq, NW), jnp.uint32)
        for t in range(T):
            req_t = (treq[:, t] & ~tneg[:, t] & ts_ok[:, t])[:, None]
            andw = jnp.where(req_t, andw & pt[:, t], andw)
            posw = posw | jnp.where((~tneg[:, t] & ts_ok[:, t])[:, None],
                                    pt[:, t], 0)
            negw = negw | jnp.where((tneg[:, t] & ts_ok[:, t])[:, None],
                                    pt[:, t], 0)
        matched = andw & posw & ~negw & ~delw_b[None, :]          # [Bq, NW]
        if with_counts:
            cnt = cnt + jnp.sum(jax.lax.population_count(matched),
                                axis=1, dtype=jnp.int32)

        crows = jnp.take(cpool, jnp.maximum(crow_b, 0).reshape(-1), axis=0)
        crows = jnp.where((crow_b >= 0).reshape(-1)[:, None], crows, 0)
        nz = ((crows[:, :, None] >> bit32) & 1).reshape(V, C_BANDS, NW)
        ubv = jnp.max(nz.astype(jnp.float32) * bandub_b[:, :, None], axis=1)

        w_b = jnp.take(wshard, sid_b, axis=0)                     # [Bq, T]
        wv = jnp.sum(w_b[:, :, None] * oh.astype(jnp.float32), axis=1)
        ub = jnp.dot(wv.astype(jnp.bfloat16), ubv.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)          # [Bq, NW]
        ubm = jnp.where(matched != 0, ub, -jnp.inf).astype(jnp.bfloat16)
        return cnt, ubm

    cnt, ubs = jax.lax.scan(
        step, jnp.zeros((Bq,), jnp.int32),
        (prow, crow, bandub, delw, sid))

    # phase 2: exact global top-(M+1) buckets (2-stage bucket reduction —
    # lax.top_k over the full 157K-lane axis is ~100x slower on v5e)
    allub = jnp.swapaxes(ubs, 0, 1).reshape(Bq, NBLK * NW)
    G = 128
    ng = NBLK * NW // G
    K = min(M + 1, NBLK * NW)
    gmax = allub.reshape(Bq, ng, G).max(axis=2)
    kg = min(K, ng)
    _, gi = jax.lax.top_k(gmax, kg)
    oh2 = (gi[:, :, None] == jnp.arange(ng, dtype=jnp.int32)).astype(
        jnp.bfloat16)
    neg_min = jnp.finfo(jnp.bfloat16).min
    xf = jnp.maximum(allub.reshape(Bq, ng, G), neg_min)
    cand = jnp.einsum("bng,bmn->bmg", xf, oh2,
                      preferred_element_type=jnp.float32)
    ub_s, ti = jax.lax.top_k(cand.reshape(Bq, kg * G), K)
    gsel = jnp.take_along_axis(gi, ti // G, axis=1)
    ub_i = gsel * G + ti % G
    ub_s = jnp.where(ub_s <= jnp.float32(neg_min), -jnp.inf, ub_s)
    if K < M + 1:
        pad = M + 1 - K
        ub_s = jnp.concatenate(
            [ub_s, jnp.full((Bq, pad), -jnp.inf)], axis=1)
        ub_i = jnp.concatenate([ub_i, jnp.zeros((Bq, pad), jnp.int32)],
                               axis=1)
    # single-fetch packing: [Bq, 2(M+1)+1] f32 (bucket ids < 2^24 are exact)
    packed = jnp.concatenate(
        [ub_s, ub_i.astype(jnp.float32), cnt[:, None].astype(jnp.float32)],
        axis=1)
    return packed


def _pack_qargs(slotmap, tslot, treq, tneg, wshard):
    """One i32 buffer per batch: slotmap[V] | tslot[Bq*T] | treq-bits |
    tneg-bits | wshard f32 bits [S*Bq*T]."""
    return np.concatenate([
        slotmap.astype(np.int32),
        tslot.reshape(-1).astype(np.int32),
        np.packbits(treq.reshape(-1), bitorder="little").view(np.uint8)
        .astype(np.int32),
        np.packbits(tneg.reshape(-1), bitorder="little").view(np.uint8)
        .astype(np.int32),
        wshard.reshape(-1).astype(np.float32).view(np.int32),
    ])


def _unpack_qargs(buf, V, Bq, T, S):
    nbits = (Bq * T + 7) // 8
    offs = np.cumsum([0, V, Bq * T, nbits, nbits, S * Bq * T])
    slotmap = buf[offs[0]:offs[1]]
    tslot = buf[offs[1]:offs[2]].reshape(Bq, T)
    bit8 = jnp.arange(8, dtype=jnp.int32)

    def unbits(x):
        b = ((x[:, None] >> bit8) & 1) != 0
        return b.reshape(-1)[: Bq * T].reshape(Bq, T)

    treq = unbits(buf[offs[2]:offs[3]])
    tneg = unbits(buf[offs[3]:offs[4]])
    wshard = jax.lax.bitcast_convert_type(
        buf[offs[4]:offs[5]], jnp.float32).reshape(S, Bq, T)
    return slotmap, tslot, treq, tneg, wshard


# NOT donated: concurrent searchers snapshot the pools outside the state
# lock; donation would invalidate their references mid-flight.  Uploads are
# rare after warmup, so the extra copy is cold-path only.
@jax.jit
def _pool_set(pool, rows, vals):
    return pool.at[rows].set(vals)


# ---------------------------------------------------------------------------
# per-slot host rows + device pools


class _SlotRows:
    """Per-term cached structures covering all shards' blocks."""

    __slots__ = ("row", "keys", "imps", "df")

    def __init__(self):
        self.row = -1                 # row in the sp_* slot pools
        # rescore join arrays: key = global_block << 16 | docid, sorted
        self.keys = np.zeros(0, np.uint32)
        self.imps = np.zeros(0, np.float32)
        self.df = 0


def _band_assign(imp: np.ndarray):
    """Split a segment's postings into <= C_BANDS impact-quantile bands.

    Returns (band u8[n], ubs f32[C] actual per-band max, nonempty bool[C]).
    Band 0 holds the highest impacts (tight UB where it matters)."""
    n = len(imp)
    srt = np.sort(imp)                       # ascending
    cut = np.ceil(n * (C_BANDS - np.arange(C_BANDS)) / C_BANDS).astype(
        np.int64) - 1
    edges = srt[np.clip(cut, 0, n - 1)]      # edges[0] = max, descending
    band = np.searchsorted(-edges, -imp, side="left").astype(np.int64)
    band = np.clip(band, 0, C_BANDS - 1)
    # postings exactly at a duplicated edge can land one band off; the UB
    # only needs each band's true max, so recompute maxima from the actual
    # assignment
    ubs = np.zeros(C_BANDS, np.float32)
    np.maximum.at(ubs, band, imp)
    nonempty = np.zeros(C_BANDS, bool)
    nonempty[band] = True
    return band.astype(np.uint8), ubs, nonempty


class WandState:
    """Device pools + host caches for one committed index generation.

    Lifecycle: attached to the StackedIndex instance (search._get_stacked),
    so commit/delete (`index._device_dirty`) drops and rebuilds it — the
    same invalidation discipline as the dense-path device tensors.

    Memory: rows are built on first touch per query term and kept; when the
    pools hit the cap (SEEKSTORM_TPU_WAND_MB, default 1536 MB) the whole
    cache flushes and rebuilds from the live working set — crude but safe,
    and only pathological term churn triggers it.
    """

    def __init__(self, index):
        self.index = index
        self.lock = threading.Lock()
        base = []
        b = 0
        for sh in index.shards:
            base.append(b)
            b += sh.lexical.n_blocks
        self.block_base = base
        self.nblk = max(b, 1)
        from ..utils import ceil_ladder

        self.nblk_pad = ceil_ladder(self.nblk, 8)
        blk_shard = np.zeros(self.nblk_pad, np.int32)
        for s, sh in enumerate(index.shards):
            blk_shard[base[s]: base[s] + sh.lexical.n_blocks] = s
        self.blk_shard = blk_shard
        self.sid_dev = jnp.asarray(blk_shard)

        delw = np.zeros((self.nblk_pad, NW), np.uint32)
        for s, sh in enumerate(index.shards):
            if sh.deleted:
                ids = np.fromiter(sh.deleted, np.int64)
                ids = ids[ids < sh.committed_doc_count]
                if len(ids):
                    g = base[s] + (ids >> 16)
                    local = ids & 0xFFFF
                    np.bitwise_or.at(
                        delw, (g, local >> 5),
                        (np.uint32(1) << (local & 31).astype(np.uint32)))
        self.delw_dev = jnp.asarray(delw)
        # sorted deleted ids per shard for the host rescore
        self.deleted_sorted = [
            np.sort(np.fromiter(sh.deleted, np.int64)) if sh.deleted
            else np.zeros(0, np.int64)
            for sh in index.shards
        ]

        cap_mb = int(os.environ.get("SEEKSTORM_TPU_WAND_MB", "1536"))
        cap_bytes = cap_mb * 1024 * 1024
        self.cap_prows = max(cap_bytes * 3 // 4 // (NW * 4), 64)
        self.cap_crows = max(cap_bytes // 5 // (NZW * 4), 64)
        slot_bytes = self.nblk_pad * (4 + C_BANDS * 8)
        self.cap_slots = max(cap_bytes // 20 // slot_bytes, 64)
        self._reset(init=True)

    # -- row building -------------------------------------------------------

    def _reset(self, init=False):
        self.ppool = jnp.zeros((64, NW), jnp.uint32)
        self.cpool = jnp.zeros((64, NZW), jnp.uint32)
        self.sp_prow = jnp.full((16, self.nblk_pad), -1, jnp.int32)
        self.sp_crow = jnp.full((16, self.nblk_pad, C_BANDS), -1, jnp.int32)
        self.sp_bandub = jnp.zeros((16, self.nblk_pad, C_BANDS), jnp.float32)
        self.n_prows = 0
        self.n_crows = 0
        self.n_slots = 0
        self.slot_cache: dict[int, _SlotRows] = {}
        self._pend_prow: list[np.ndarray] = []     # stacked at upload
        self._pend_crow: list[np.ndarray] = []
        self._pend_slot: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []

    def _build_slot(self, h: int) -> _SlotRows:
        sr = _SlotRows()
        prow_vec = np.full(self.nblk_pad, -1, np.int32)
        crow_mat = np.full((self.nblk_pad, C_BANDS), -1, np.int32)
        bandub_mat = np.zeros((self.nblk_pad, C_BANDS), np.float32)
        keys_parts, imp_parts = [], []
        any_seg = False
        for s, sh in enumerate(self.index.shards):
            lex = sh.lexical
            d = lex.directory
            if d is None:
                continue
            ti = d.lookup(h)
            if ti < 0:
                continue
            for e in range(int(d.seg_start[ti]), int(d.seg_start[ti + 1])):
                off = int(d.seg_offset[e])
                ln = int(d.seg_len[e])
                if ln <= 0:
                    continue
                any_seg = True
                g = self.block_base[s] + int(d.seg_block[e])
                ids = lex.pl_docid[off: off + ln].astype(np.int64)
                imp = lex.pl_impact[off: off + ln]
                pw = np.zeros(NW, np.uint32)
                np.bitwise_or.at(
                    pw, ids >> 5,
                    np.uint32(1) << (ids & 31).astype(np.uint32))
                prow_vec[g] = self.n_prows
                self._pend_prow.append(pw)
                self.n_prows += 1
                band, ubs, nonempty = _band_assign(imp)
                buckets = (ids >> 5).astype(np.int64)
                for c in np.flatnonzero(nonempty):
                    nzrow = np.zeros(NZW, np.uint32)
                    bc = buckets[band == c]
                    np.bitwise_or.at(
                        nzrow, bc >> 5,
                        np.uint32(1) << (bc & 31).astype(np.uint32))
                    crow_mat[g, c] = self.n_crows
                    bandub_mat[g, c] = ubs[c] * UB_INFLATE
                    self._pend_crow.append(nzrow)
                    self.n_crows += 1
                keys_parts.append((np.uint32(g) << np.uint32(16))
                                  | ids.astype(np.uint32))
                imp_parts.append(imp)
                sr.df += ln
        if any_seg:
            sr.row = self.n_slots
            self._pend_slot.append((prow_vec, crow_mat, bandub_mat))
            self.n_slots += 1
        if keys_parts:
            sr.keys = np.concatenate(keys_parts)
            sr.imps = np.concatenate(imp_parts).astype(np.float32)
            order = np.argsort(sr.keys, kind="stable")
            if not np.all(order[:-1] < order[1:]):
                sr.keys = sr.keys[order]
                sr.imps = sr.imps[order]
        return sr

    def ensure_slots(self, hashes: list[int]) -> None:
        """Build + upload any missing slots' rows (call under self.lock)."""
        missing = [h for h in hashes if h not in self.slot_cache]
        if not missing:
            return
        for h in missing:
            self.slot_cache[h] = self._build_slot(h)
        if (self.n_prows > self.cap_prows or self.n_crows > self.cap_crows
                or self.n_slots > self.cap_slots):
            self._reset()
            for h in hashes:
                self.slot_cache[h] = self._build_slot(h)
        self._upload_pending()

    def _grow(self, pool, n_rows):
        from ..utils import ceil_pow2

        if pool.shape[0] >= n_rows:
            return pool
        grow = ceil_pow2(max(n_rows, pool.shape[0] * 2), 16)
        pad = jnp.zeros((grow - pool.shape[0],) + pool.shape[1:], pool.dtype)
        if pool.dtype == jnp.int32:
            pad = pad - 1
        return jnp.concatenate([pool, pad], axis=0)

    def _upload_pending(self):
        if self._pend_prow:
            n0 = self.n_prows - len(self._pend_prow)
            self.ppool = self._grow(self.ppool, self.n_prows)
            rows = jnp.asarray(
                np.arange(n0, self.n_prows, dtype=np.int32))
            self.ppool = _pool_set(self.ppool, rows,
                                   jnp.asarray(np.stack(self._pend_prow)))
            self._pend_prow.clear()
        if self._pend_crow:
            n0 = self.n_crows - len(self._pend_crow)
            self.cpool = self._grow(self.cpool, self.n_crows)
            rows = jnp.asarray(
                np.arange(n0, self.n_crows, dtype=np.int32))
            self.cpool = _pool_set(self.cpool, rows,
                                   jnp.asarray(np.stack(self._pend_crow)))
            self._pend_crow.clear()
        if self._pend_slot:
            n0 = self.n_slots - len(self._pend_slot)
            rows = jnp.asarray(np.arange(n0, self.n_slots, dtype=np.int32))
            self.sp_prow = _pool_set(
                self._grow(self.sp_prow, self.n_slots), rows,
                jnp.asarray(np.stack([p for p, _, _ in self._pend_slot])))
            self.sp_crow = _pool_set(
                self._grow(self.sp_crow, self.n_slots), rows,
                jnp.asarray(np.stack([c for _, c, _ in self._pend_slot])))
            self.sp_bandub = _pool_set(
                self._grow(self.sp_bandub, self.n_slots), rows,
                jnp.asarray(np.stack([b for _, _, b in self._pend_slot])))
            self._pend_slot.clear()


def get_state(index) -> WandState:
    """WandState keyed on the live StackedIndex (rebuilds on commit/delete)."""
    from ..search import _get_stacked

    st = _get_stacked(index)
    ws = getattr(st, "_wand", None)
    if ws is None:
        ws = st._wand = WandState(index)
    return ws


# ---------------------------------------------------------------------------
# batch planning + execution (called from search._lexical_search_batch)


def query_ok(spec) -> bool:
    """Eligibility: no phrase groups, bounded slot count."""
    return (not spec.phrases) and 0 < len(spec.slots) <= T_MAX


def _rescore_query(state: WandState, slots, spec, idf_per_shard,
                   buckets: np.ndarray, S: int):
    """Exact host rescore of one query's candidate buckets.

    Returns (scores f32[n], gids i64[n]) sorted by (score desc, global
    docid asc) — oracle ordering (oracle.topk_from_scores)."""
    nb = len(buckets)
    if nb == 0:
        return np.zeros(0, np.float32), np.zeros(0, np.int64)
    buckets = np.sort(buckets)
    blk = (buckets // NW).astype(np.int64)
    word = (buckets % NW).astype(np.int64)
    lo_key = ((blk.astype(np.uint32)) << np.uint32(16)) \
        | (word * 32).astype(np.uint32)
    hi_key = lo_key + np.uint32(32)

    scores = np.zeros((nb, BUCKET), np.float32)
    reqc = np.zeros((nb, BUCKET), np.int16)
    anyh = np.zeros((nb, BUCKET), bool)
    negh = np.zeros((nb, BUCKET), bool)
    nreq = 0
    for s in spec.slots:
        sr = state.slot_cache.get(slots[s].hash)
        neg = spec.negated.get(s, False)
        scoring = s in spec.weights
        req = spec.required.get(s, False) and not neg
        if req:
            nreq += 1
        if sr is None or not len(sr.keys):
            continue
        lo = np.searchsorted(sr.keys, lo_key)
        hi = np.searchsorted(sr.keys, hi_key)
        cnts = hi - lo
        tot = int(cnts.sum())
        if tot == 0:
            continue
        rows = np.repeat(np.arange(nb, dtype=np.int64), cnts)
        idxs = (np.repeat(lo, cnts)
                + np.arange(tot, dtype=np.int64)
                - np.repeat(np.cumsum(cnts) - cnts, cnts))
        local = (sr.keys[idxs] & 31).astype(np.int64)
        if neg:
            negh[rows, local] = True
            continue
        anyh[rows, local] = True
        if req:
            reqc[rows, local] += 1
        if scoring:
            g = blk[rows]
            sid = state.blk_shard[g]
            w = idf_per_shard[sid, s]
            scores[rows, local] += w.astype(np.float32) * sr.imps[idxs]

    matched = anyh & ~negh & (reqc >= nreq)
    # deleted docs inside matched buckets
    shard_of = state.blk_shard[blk]
    base_arr = np.asarray(state.block_base, np.int64)
    lvl_local0 = ((blk - base_arr[shard_of]) * BLOCK_SIZE + word * 32)
    for s_ in np.unique(shard_of):
        dels = state.deleted_sorted[s_]
        if not len(dels):
            continue
        m = shard_of == s_
        cand_ids = (lvl_local0[m][:, None]
                    + np.arange(BUCKET, dtype=np.int64)[None, :])
        isdel = np.searchsorted(dels, cand_ids.reshape(-1))
        isdel = np.clip(isdel, 0, len(dels) - 1)
        hit = dels[isdel] == cand_ids.reshape(-1)
        mm = matched[m]
        mm &= ~hit.reshape(mm.shape)
        matched[m] = mm

    if not matched.any():
        return np.zeros(0, np.float32), np.zeros(0, np.int64)
    rows, local = np.nonzero(matched)
    sc = scores[rows, local]
    gid = ((lvl_local0[rows] + local) * S + shard_of[rows]).astype(np.int64)
    order = np.lexsort((gid, -sc))
    return sc[order].astype(np.float32), gid[order]


def run_batch(index, slots, specs, idf_per_shard: np.ndarray,
              need: int, with_counts: bool):
    """Execute eligible queries on the WAND path.

    slots: batch slot list; specs: eligible _QuerySpec per row;
    idf_per_shard: f32[S, V] per-shard idf per slot (realtime-df aware).
    Returns (scores list, gids list, counts i64[B], handled bool[B]) —
    handled=False rows must fall back to the dense path."""
    from ..metrics import METRICS
    from ..utils import ceil_pow2

    state = get_state(index)
    B = len(specs)
    S = index.shard_count
    handled = np.ones(B, bool)
    out_scores: list = [np.zeros(0, np.float32)] * B
    out_gids: list = [np.zeros(0, np.int64)] * B
    counts = np.zeros(B, np.int64)

    used = sorted({s for spec in specs for s in spec.slots})
    with state.lock:
        state.ensure_slots([slots[s].hash for s in used])

        V = ceil_pow2(max(len(slots), 1), 16)
        slotmap = np.full(V, -1, np.int32)
        for s in used:
            slotmap[s] = state.slot_cache[slots[s].hash].row

        Bq = ceil_pow2(B, 16)
        T = 4 if max(len(sp.slots) for sp in specs) <= 4 else T_MAX
        tslot = np.full((Bq, T), -1, np.int32)
        treq = np.zeros((Bq, T), bool)
        tneg = np.zeros((Bq, T), bool)
        wsh = np.zeros((S, Bq, T), np.float32)
        for qi, spec in enumerate(specs):
            for j, s in enumerate(spec.slots):
                tslot[qi, j] = s
                treq[qi, j] = spec.required.get(s, False)
                tneg[qi, j] = spec.negated.get(s, False)
                if s in spec.weights:
                    wsh[:, qi, j] = idf_per_shard[:, s]

        qargs = jnp.asarray(_pack_qargs(slotmap, tslot, treq, tneg, wsh))
        pools = (state.ppool, state.cpool, state.sp_prow, state.sp_crow,
                 state.sp_bandub, state.delw_dev, state.sid_dev)

    pending = list(range(B))
    for M in M_LADDER:
        if not pending:
            break
        METRICS.inc("device_dispatch_total")
        with METRICS.timer("lex_device"):
            packed = np.asarray(wand_scan(
                *pools, qargs, V=V, Bq=Bq, T=T, S=S,
                M=M, with_counts=with_counts))
        ub_s = packed[:, : M + 1]
        ub_i = packed[:, M + 1: 2 * (M + 1)].astype(np.int64)
        cnt = packed[:, -1].astype(np.int64)
        still = []
        for qi in pending:
            spec = specs[qi]
            sel = ub_s[qi, :M] > -np.inf
            buckets = ub_i[qi, :M][sel]
            next_ub = float(ub_s[qi, M])
            sc, gid = _rescore_query(
                state, slots, spec, idf_per_shard, buckets, S)
            n_found = len(gid)
            kth = float(sc[need - 1]) if n_found >= need else -np.inf
            exact = (next_ub == -np.inf) or (n_found >= need
                                             and kth >= next_ub)
            if exact:
                out_scores[qi] = sc[: max(need * 4, 64)]
                out_gids[qi] = gid[: max(need * 4, 64)]
                counts[qi] = cnt[qi]
            else:
                still.append(qi)
        pending = still
        if pending:
            METRICS.inc("wand_escalations_total")
    for qi in pending:
        handled[qi] = False
        METRICS.inc("wand_fallbacks_total")
    return out_scores, out_gids, counts, handled
