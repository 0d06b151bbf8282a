"""Query planner + search execution.

Root search orchestration (reference seekstorm/src/search.rs:1153 Search::search):
parse/rewrite -> per-shard planning -> device dispatch -> realtime tail merge ->
phrase verification -> paging.  The reference's per-shard task fan-out
(search.rs:1637-1743) becomes batched device execution; its block-max
early-exit (intersection.rs:2224) becomes host-side candidate-block selection
with an exactness check and a single full-coverage escalation.
"""

from __future__ import annotations

import enum
import os
import threading
import time
from dataclasses import dataclass, field as dfield

import numpy as np

from .index import Index, Shard
from .lexindex import STASH_K
from .oracle import idf as idf_fn
from .oracle import score_query, topk_from_scores, verify_phrase
from .schema import BLOCK_SIZE
from .ngram import NGRAM_SEP
from .tokenizer import ParsedQuery, parse_query
from .utils import (ceil_pow2, ceil_pow4, ngram_virtual_hash,
                    term_hash)

# blocks threshold under which plans always cover all candidate blocks
FULL_PLAN_BLOCKS = 96
# per-query pruned-plan block budget (first round)
PRUNE_BLOCKS = 16

# guards the per-index adaptive-pruning counters (_prune_stats): concurrent
# searcher threads read-modify-write them (SURVEY §5 sanitizers row)
_PRUNE_LOCK = threading.Lock()
# shard size (in 64K blocks) from which Topk-only batches use the
# query-tiled kernel (ops/lexical.lexical_scan_qt) instead of the
# full-batch scan — below it the full-batch scan's fixed costs win
QT_MIN_BLOCKS = 32
# sub-windows per 64K block in the decode/score matmuls (see
# ops/lexical._block_step_imp).  Default 1: measured on v5e at both 1M
# and 5M docs, NW=8 splits each segment's ~2 chunk rows into ~8 window
# rows (4x the chunk slots) and shrinks the decode einsum instances to
# 64x128 (poor MXU shapes) — 119 -> 176 ms/batch at 5M.  The machinery
# stays for hardware where narrow deep matmuls hold their throughput.
WINDOWS = 1
WIN_MIN_BLOCKS = 4


def _plan_windows(index: Index) -> int:
    return (WINDOWS if max((sh.lexical.n_blocks for sh in index.shards),
                           default=0) >= WIN_MIN_BLOCKS else 1)


class QueryType(str, enum.Enum):
    """(reference search.rs:59-69)"""

    Union = "Union"
    Intersection = "Intersection"
    Phrase = "Phrase"
    Not = "Not"


class ResultType(str, enum.Enum):
    """(reference search.rs:168-176)"""

    Count = "Count"
    Topk = "Topk"
    TopkCount = "TopkCount"


class SearchMode(str, enum.Enum):
    Lexical = "Lexical"
    Vector = "Vector"
    Hybrid = "Hybrid"


@dataclass
class Ranges:
    """Named numeric/geo ranges for a range facet (reference search.rs:388-420
    Ranges enum + RangeType :220-228)."""

    field: str
    ranges: list                 # [(label, start)] — bucket i is [start_i, start_{i+1})
    range_type: str = "CountWithinRange"  # | CountAboveRange | CountBelowRange
    base: object = None          # Point ranges: (lat, lon) base for distance buckets
    unit: str = "Kilometers"


@dataclass
class QueryFacet:
    field: str
    length: int = 10           # top-N values returned
    ranges: Ranges | None = None


@dataclass
class FacetFilter:
    field: str
    values: list | None = None       # string/equality filter
    range: tuple | None = None       # numeric [min, max] inclusive


@dataclass
class ResultSort:
    field: str
    order: str = "Descending"        # or "Ascending"
    base: object = None              # geo base point for Point fields


@dataclass
class Highlight:
    field: str
    fragment_number: int = 1
    fragment_size: int = 160
    highlight_markup: bool = True


@dataclass
class SearchRequest:
    """(reference SearchRequestObject index.rs:137-211)"""

    query: str = ""
    offset: int = 0
    length: int = 10
    result_type: ResultType = ResultType.TopkCount
    realtime: bool = True
    query_type_default: QueryType = QueryType.Union
    field_filter: list[str] = dfield(default_factory=list)
    fields: list[str] = dfield(default_factory=list)         # doc fields to return
    highlights: list[Highlight] = dfield(default_factory=list)
    query_facets: list[QueryFacet] = dfield(default_factory=list)
    facet_filter: list[FacetFilter] = dfield(default_factory=list)
    result_sort: list[ResultSort] = dfield(default_factory=list)
    search_mode: SearchMode = SearchMode.Lexical
    query_vector: list | None = None
    top_n: int = 10                  # vector candidates per shard
    ann_mode: str = "All"            # All | Nprobe | SimilarityThreshold | NprobeSimilarityThreshold
    nprobe: int = 0                  # clusters to probe (Nprobe modes)
    similarity_threshold: float | None = None
    distance_fields: list = dfield(default_factory=list)
    # 'SearchOnly' | {'SearchSuggest'|'SearchRewrite'|'SuggestOnly': {...}}
    query_rewriting: object = "SearchOnly"


@dataclass
class ResultObject:
    doc_id: int
    score: float
    doc: dict | None = None


@dataclass
class ResultSet:
    results: list[ResultObject] = dfield(default_factory=list)
    result_count: int = 0
    result_count_total: int = 0
    count_exact: bool = True
    facets: dict = dfield(default_factory=dict)
    suggestions: list = dfield(default_factory=list)
    query_terms: list = dfield(default_factory=list)
    time_us: float = 0.0
    # vector-search work counters (reference observed_vector_count /
    # observed_cluster_count, search.rs:200-204): candidate vectors
    # scanned and clusters visited for this query, summed over shards
    observed_vector_count: int = 0
    observed_cluster_count: int = 0


# ---------------------------------------------------------------------------
# per-batch lexical planning


@dataclass
class _Slot:
    hash: int
    term: str
    dir_idx: list  # per shard: directory index or -1
    # n-gram constituent scoring (Bm25f, reference add_result.rs:868-915):
    # idf_hash redirects this slot's df/idf to a constituent term; tf_hash
    # is set on slots whose tail postings join against a constituent's tfs
    # (committed levels carry the join pre-materialized, lexindex.py).
    idf_hash: int | None = None
    tf_hash: int | None = None
    virtual: bool = False   # weight-only companion slot of an n-gram


@dataclass
class _QuerySpec:
    slots: list[int]            # slot ids used by this query (non-negated + negated)
    weights: dict               # slot -> 1.0 (scoring, non-negated) — idf applied per shard
    required: dict              # slot -> bool
    negated: dict               # slot -> bool
    phrases: list[list]         # phrase groups: [(slot_id, token_offset)], in order
    parsed: ParsedQuery


def _build_specs(
    index: Index, queries: list[str], default_types: list[QueryType]
) -> tuple[list[_Slot], list[_QuerySpec]]:
    from .ngram import segment_phrase

    flags = index.meta.ngram_indexing
    frequent = getattr(index, "_frequent_words", frozenset())
    expand = getattr(index, "_expand_ngrams", False)

    slot_of: dict[int, int] = {}
    slots: list[_Slot] = []
    specs: list[_QuerySpec] = []

    def get_slot(term: str) -> int:
        h = term_hash(term)
        if h not in slot_of:
            slot_of[h] = len(slots)
            if expand and NGRAM_SEP in term:
                parts = term.split(NGRAM_SEP)
                slots.append(_Slot(h, term, [],
                                   idf_hash=term_hash(parts[0]),
                                   tf_hash=term_hash(parts[0])))
            else:
                slots.append(_Slot(h, term, []))
        return slot_of[h]

    def get_virtual_slots(term: str, h: int) -> list[int]:
        """Weight-only companion slots for constituents 2..k of an n-gram
        (Bm25f constituent scoring; see lexindex._expand_ngram_segments)."""
        parts = term.split(NGRAM_SEP)
        out = []
        for j in range(2, len(parts) + 1):
            vh = ngram_virtual_hash(h, j)
            if vh not in slot_of:
                slot_of[vh] = len(slots)
                slots.append(_Slot(vh, term, [],
                                   idf_hash=term_hash(parts[j - 1]),
                                   tf_hash=term_hash(parts[j - 1]),
                                   virtual=True))
            out.append(slot_of[vh])
        return out

    for q, default_type in zip(queries, default_types):
        pq = parse_query(q, index.analyzer)
        weights: dict[int, float] = {}
        required: dict[int, bool] = {}
        negated: dict[int, bool] = {}
        phrase_groups: list[list] = []

        phrase_term_idx = {i for ph in pq.phrases for i in ph}
        implicit_phrase = (
            default_type == QueryType.Phrase
            and not pq.phrases
            and sum(1 for t in pq.terms if not t.negated) > 1
        )

        def add_term(term: str, req: bool, neg: bool):
            s_ = get_slot(term)
            if s_ in negated and negated[s_] and not neg:
                negated[s_] = False  # positive occurrence wins
            if s_ not in negated:
                negated[s_] = neg
            required[s_] = required.get(s_, False) or (req and not neg)
            if not negated[s_]:
                weights[s_] = 1.0
                if expand and NGRAM_SEP in term:
                    for vs in get_virtual_slots(term, slots[s_].hash):
                        weights[vs] = 1.0
                        negated.setdefault(vs, False)
            return s_

        def add_phrase(tokens: list[str], neg: bool):
            # n-gram segment rewriting (reference NGRAM_SEARCH.md:60-80)
            if flags and frequent:
                segments = segment_phrase(tokens, frequent, flags)
            else:
                segments = [(t, i, 1) for i, t in enumerate(tokens)]
            group = []
            for term, off, _ln in segments:
                s_ = add_term(term, True, neg)
                group.append((s_, off))
            if len(group) >= 1 and not neg:
                phrase_groups.append(group)

        for i, t in enumerate(pq.terms):
            if i in phrase_term_idx or implicit_phrase:
                continue
            neg = t.negated or default_type == QueryType.Not
            req = t.required or default_type in (
                QueryType.Intersection, QueryType.Phrase
            )
            add_term(t.term, req, neg)

        for ph in pq.phrases:
            tokens = [pq.terms[i].term for i in ph]
            add_phrase(tokens, pq.terms[ph[0]].negated)
        if implicit_phrase:
            tokens = [t.term for t in pq.terms if not t.negated]
            add_phrase(tokens, False)
            for t in pq.terms:
                if t.negated:
                    add_term(t.term, False, True)

        # single-segment phrases are exact by construction (the n-gram or
        # single term IS the phrase) — no position verification needed
        phrase_groups = [g for g in phrase_groups if len(g) > 1]

        specs.append(
            _QuerySpec(
                slots=sorted(
                    set(list(weights) + [s for s, n in negated.items() if n])
                ),
                weights=weights,
                required=required,
                negated=negated,
                phrases=phrase_groups,
                parsed=pq,
            )
        )
    return slots, specs


def _wand_facet_codes(index, wstate, codes_list) -> np.ndarray:
    """Facet code columns [S, nb*BLOCK] -> WAND global-block layout
    i32[NF, nblk_pad*BLOCK].  Both sides are block-aligned (facet columns
    are stored per level = per block), so this is a per-shard copy."""
    nf = len(codes_list)
    out = np.zeros((nf, wstate.nblk_pad * BLOCK_SIZE), np.int32)
    for fi, codes in enumerate(codes_list):
        for s, sh in enumerate(index.shards):
            n = sh.lexical.n_blocks * BLOCK_SIZE
            g0 = wstate.block_base[s] * BLOCK_SIZE
            out[fi, g0: g0 + n] = codes[s, :n]
    return out


def _wand_rank_key(index, wstate, skey_host, sort_desc: bool) -> np.ndarray:
    """Sort-key column [S, nb*BLOCK] -> WAND global rank array
    f32[nblk_pad*BLOCK] (rank DESC convention: ascending orders negate).
    Positions with no committed doc are -inf so per-bucket rank maxima
    stay tight (column padding is 0.0, which would dominate negative
    ranks and kill region selection)."""
    out = np.full(wstate.nblk_pad * BLOCK_SIZE, -np.inf, np.float32)
    for s, sh in enumerate(index.shards):
        g0 = wstate.block_base[s] * BLOCK_SIZE
        for li, lvl in enumerate(sh.lexical.levels):
            n = lvl.doc_count
            seg = skey_host[s, li * BLOCK_SIZE: li * BLOCK_SIZE + n]
            seg = seg.astype(np.float32)
            out[g0 + li * BLOCK_SIZE: g0 + li * BLOCK_SIZE + n] = \
                seg if sort_desc else -seg
    return out


def _wand_filter_words(index, wstate, mask) -> np.ndarray:
    """Facet-filter allowed mask bool[S, nb*BLOCK] -> packed DISALLOWED
    words u32[nblk_pad, BLOCK//32] in WAND global-block layout (ANDed into
    matching exactly like the deleted-doc words)."""
    nw = BLOCK_SIZE // 32
    out = np.zeros((wstate.nblk_pad, nw), np.uint32)
    for s, sh in enumerate(index.shards):
        n = sh.lexical.n_blocks * BLOCK_SIZE
        dis = np.ascontiguousarray(~mask[s, :n])
        # bit j of word w = doc w*32+j (little-endian, same as delw)
        words = np.packbits(dis, bitorder="little").view(np.uint32)
        out[wstate.block_base[s]:
            wstate.block_base[s] + sh.lexical.n_blocks] = \
            words.reshape(sh.lexical.n_blocks, nw)
    return out


def _shard_idf(shard: Shard, slots: list[_Slot], realtime: bool,
               hs: np.ndarray | None = None,
               found: np.ndarray | None = None,
               ti_c: np.ndarray | None = None) -> np.ndarray:
    """Per-shard per-slot BM25 idf, realtime-df aware — the single source of
    truth for the dense planner (_plan_shard) and the WAND path (ops/wand.py).

    hs/found/ti_c are _plan_shard's already-computed directory lookups for
    the slots' own hashes; recomputed when absent."""
    lex = shard.lexical
    d = lex.directory
    if d is None or len(d.hash) == 0:
        # shard with no committed terms (all docs hashed elsewhere):
        # every slot is absent, idf contribution zero
        return np.zeros(len(slots), np.float32)
    T = len(d.hash)
    if hs is None:
        hs = np.array([sl.hash for sl in slots], dtype=np.uint64)
        ti_all = np.searchsorted(d.hash, hs)
        found = ti_all < T
        ti_c = np.minimum(ti_all, max(T - 1, 0))
        found &= (d.hash[ti_c] == hs) if T else False

    # idf df: n-gram slots redirect to their constituent's df (reference
    # posting_count_ngram_N, search.rs:3235-3260)
    df = np.where(found, d.df[ti_c], 0)
    idf_hs = np.array(
        [sl.idf_hash if sl.idf_hash is not None else sl.hash
         for sl in slots], dtype=np.uint64)
    if not np.array_equal(idf_hs, hs):
        ci_all = np.searchsorted(d.hash, idf_hs)
        cfound = (ci_all < T)
        ci_c = np.minimum(ci_all, max(T - 1, 0))
        cfound &= (d.hash[ci_c] == idf_hs) if T else False
        df = np.where(cfound, d.df[ci_c], df)

    # doc counts / dfs incl. realtime tail for idf
    n_docs = lex.doc_count
    df_total = df.copy()
    if realtime:
        l0 = shard.level0
        start = shard.partial_on_disk
        tail = l0.doc_count - start
        n_docs += tail
        if tail > 0:
            acc = getattr(l0, "acc", None)
            # per-slot tail-df lookups only when an uncommitted tail
            # exists — on a fully committed index this loop is ~225
            # native calls per batch of pure overhead
            for v, sl in enumerate(slots):
                h = sl.idf_hash if sl.idf_hash is not None else sl.hash
                if acc is not None:
                    hit = acc.term_postings(h)
                    if hit is not None:
                        df_total[v] += int(np.sum(hit[0] >= start))
                else:
                    tp = l0.terms.get(h)
                    if tp is not None:
                        df_total[v] += int(np.sum(
                            np.asarray(tp.docids) >= start))
    return np.where(
        df_total > 0,
        np.log1p((n_docs - df_total + 0.5) / (df_total + 0.5)),
        0.0,
    ).astype(np.float32)


@dataclass
class _ShardPlan:
    block_ids: np.ndarray       # i32[NB]
    seg_off: np.ndarray         # i32[NB, V]   (tf mode)
    seg_len: np.ndarray         # i32[NB, V]   (tf mode)
    W: np.ndarray               # f32[B, V]
    Mreq: np.ndarray            # f32[B, V]
    nreq: np.ndarray            # i32[B]
    P_max: int
    full: bool                  # covers all candidate blocks (counts valid)
    ub_unscored: np.ndarray     # f32[B] max UB over blocks not selected per query
    idf: np.ndarray             # f32[n_slots] per-shard idf
    n_cand_blocks: np.ndarray   # i32[B]
    dense_ids: np.ndarray | None = None    # i32[NB, VD] dense rows (-1 pad)
    dense_slots: np.ndarray | None = None  # i32[NB, VD]
    mode: str = "imp"           # "imp" (chunked impact path) | "tf"
    c_row: np.ndarray | None = None  # i32[NB, NC] storage rows (imp mode)
    c_se: np.ndarray | None = None   # i32[NB, NC] slot<<16|cs<<8|(ce-1)
    # per-(plan block, query) selection mask: a block contributes to a
    # query's results only if the query selected it.  This keeps per-query
    # block pruning exact: every (query, block) pair is either fully scored
    # (all the query's slots decode there) or fully masked — partial scores
    # from slots shared with other queries can never leak into results.
    qsel: np.ndarray | None = None   # bool[NB, B]
    # query-tiled plans (mode="qt"): batch rows per tile; block_ids/c_row/
    # c_se/dense_* are then per TILE, not per block
    t_qid: np.ndarray | None = None  # i32[T, QT]


def _plan_shard(
    index: Index,
    shard: Shard,
    slots: list[_Slot],
    specs: list[_QuerySpec],
    realtime: bool,
    need_full: bool,
    prune_budget: int,
    mode: str = "imp",
    nwin: int = 1,
) -> _ShardPlan | None:
    lex = shard.lexical
    d = lex.directory
    B = len(specs)
    V = len(slots)
    if V == 0 or lex.doc_count == 0:
        return None

    # per-slot segment ranges, fully vectorized (this was a V-iteration
    # python loop and a measurable share of per-batch host planning)
    hs = np.array([sl.hash for sl in slots], dtype=np.uint64)
    T = len(d.hash)
    ti_all = np.searchsorted(d.hash, hs)
    found = (ti_all < T)
    ti_c = np.minimum(ti_all, max(T - 1, 0))
    found &= (d.hash[ti_c] == hs) if T else False
    seg_a = np.where(found, d.seg_start[ti_c], 0).astype(np.int64)
    seg_b = np.where(found, d.seg_start[np.minimum(ti_c + 1, T)], 0).astype(
        np.int64)
    seg_n = seg_b - seg_a

    # flat (slot, segment) view: ragged ranges -> one index vector
    total_segs = int(seg_n.sum())
    rows = np.repeat(np.arange(V, dtype=np.int32), seg_n)       # slot per seg
    shift = np.repeat(np.cumsum(seg_n) - seg_n - seg_a, seg_n)
    flat = np.arange(total_segs, dtype=np.int64) - shift        # dir indices
    fb = d.seg_block[flat]          # block id per (slot, segment)
    fo = d.seg_offset[flat]
    fl = d.seg_len[flat]
    fm = d.seg_max_impact[flat]
    fd = (d.seg_dense[flat] if d.seg_dense is not None
          else np.full(total_segs, -1, np.int32))
    # impact path: bitmap row + CSR-remainder length per segment
    fbm = (d.seg_bitmap[flat] if d.seg_bitmap is not None
           else np.full(total_segs, -1, np.int32))
    fdl = (d.seg_dev_len[flat] if d.seg_dev_len is not None else fl)

    idf = _shard_idf(shard, slots, realtime,
                     hs=hs, found=found, ti_c=ti_c)

    # per-query masks over slots, built once (the per-query python loops
    # here were the serving bottleneck: host planning ran ~16 ms per
    # 128-query batch, longer than the warm device scan)
    n_blocks = lex.n_blocks
    POS = np.zeros((B, V), dtype=np.float32)      # weighted (scoring) slots
    REQ = np.zeros((B, V), dtype=np.float32)      # required slots
    NEG = np.zeros((B, V), dtype=bool)
    for qi, spec in enumerate(specs):
        ws = list(spec.weights)
        POS[qi, ws] = 1.0
        REQ[qi, [s for s in ws if spec.required.get(s)]] = 1.0
        NEG[qi, [s for s, n_ in spec.negated.items() if n_]] = True

    # slot -> block matrices (presence + max-impact upper bound); one
    # segment per (term, block), so direct assignment is collision-free
    present = np.zeros((V, n_blocks), dtype=np.float32)
    slot_ub = np.zeros((V, n_blocks), dtype=np.float32)
    present[rows, fb] = 1.0
    slot_ub[rows, fb] = fm * idf[rows]

    # candidate blocks: AND of required presences when any, else OR of
    # positives; ub = sum of per-slot block UBs over scoring slots
    has_req = REQ.sum(axis=1) > 0
    miss_req = REQ @ (1.0 - present)              # [B, n_blocks]
    any_pos = (POS @ present) > 0
    cand = np.where(has_req[:, None], miss_req == 0, any_pos)
    cand &= POS.sum(axis=1)[:, None] > 0
    ub = POS @ slot_ub
    ub = np.where(cand, ub, 0.0)
    n_cand = cand.sum(axis=1).astype(np.int32)

    total_cand_blocks = int(np.any(cand, axis=0).sum())
    # qt mode prunes as soon as candidates exceed the per-query budget —
    # its per-tile cost model makes pruning pay at any scale; the
    # full-batch kernel keeps the conservative threshold (escalations
    # re-run the whole batch, so pruning must be near-certain to hold)
    full_limit = PRUNE_BLOCKS if mode == "qt" else FULL_PLAN_BLOCKS
    full = need_full or total_cand_blocks <= full_limit
    if full:
        selq = cand
    else:
        # per-query block selection: each query keeps its top-`budget`
        # candidate blocks by upper bound (the batched analog of the
        # reference's block-max early exit, intersection.rs:2224-2300)
        selq = np.zeros((B, n_blocks), dtype=bool)
        budget = min(prune_budget, n_blocks)
        for qi in range(B):
            order = np.argsort(-ub[qi])[:budget]
            take = order[cand[qi][order]]
            selq[qi, take] = True
        # negated-term presence only matters inside selected blocks
    selected = np.any(selq, axis=0)

    block_list = np.flatnonzero(selected).astype(np.int32)
    NB = len(block_list)
    if NB == 0:
        return None

    ub_unscored = np.where(selq, 0.0, ub).max(axis=1).astype(np.float32)

    seg_off_arr = np.zeros((NB, V), dtype=np.int32)
    seg_len_arr = np.zeros((NB, V), dtype=np.int32)
    dense_lists: list[list] = [[] for _ in range(NB)]
    # any slot that appears in ANY query using a block gets decoded for that
    # block; extra decode only adds exactness.  Dense segments leave the
    # window entirely and ride the dense row-gather path in the kernel.
    pos = np.searchsorted(block_list, fb)
    hit = (pos < NB) & (block_list[np.minimum(pos, max(NB - 1, 0))] == fb)
    # segment-level pruning: decode segment (slot, block) only if some query
    # that uses the slot SELECTED the block — a block selected for other
    # queries must not pay this slot's postings (fine-grained analog of the
    # reference's per-term blocked skipping, intersection.rs:2058-2222).
    # Exactness holds because the kernel masks each query's results to its
    # own selected blocks (qsel below).
    USE = (POS > 0) | (REQ > 0) | NEG                  # [B, V]
    needed = (USE.astype(np.float32).T @ selq) > 0     # [V, n_blocks]
    hit &= needed[rows, fb]
    c_row = c_se = None
    ent_sorted = None  # (bstart, rowi_s, se_s) per-block chunk entries (qt)
    if mode in ("imp", "qt"):
        # chunk table: every (segment x 128-wide storage row) overlap is one
        # chunk (ops/lexical.py CHUNK); chunks pack per plan-block row.
        # The impact path decodes each segment's CSR REMAINDER only —
        # bitmap segments' plain postings ride the presence-bitmap matmul.
        from .ops.lexical import CHUNK

        # per-slot chunk templates (commit-cached, lexindex
        # .term_chunk_template) assembled per batch: filter each used
        # slot's template to the blocks some selecting query needs, OR the
        # slot id into the packed cse, and counting-sort by (plan block,
        # window).  The expansion work (window splits, row spans) is paid
        # once per term per commit, not per batch.
        from .lexindex import term_chunk_template

        parts: list = []
        for v in range(V):
            if seg_b[v] <= seg_a[v] or not needed[v].any():
                continue
            tb, tw, tr, tse = term_chunk_template(
                lex, int(seg_a[v]), int(seg_b[v]), nwin)
            if not len(tb):
                continue
            pb = np.searchsorted(block_list, tb)
            pbc = np.minimum(pb, max(NB - 1, 0))
            m = (pb < NB) & (block_list[pbc] == tb) & needed[v][tb]
            if not m.any():
                continue
            parts.append((pbc[m], tw[m], tr[m], tse[m] | (v << 16)))
        total = sum(len(x[0]) for x in parts)
        if total:
            posb = np.concatenate([x[0] for x in parts]).astype(np.int64)
            widc = np.concatenate([x[1] for x in parts]).astype(np.int64)
            rowc = np.concatenate([x[2] for x in parts])
            sec = np.concatenate([x[3] for x in parts])
            key = posb * nwin + widc
            order_c = np.argsort(key, kind="stable")
            cnt_bw = np.bincount(key, minlength=NB * nwin)
            bwstart = np.zeros(NB * nwin + 1, np.int64)
            np.cumsum(cnt_bw, out=bwstart[1:])
            if mode == "qt":
                ent_sorted = (bwstart, rowc[order_c], sec[order_c],
                              (sec[order_c] >> 16).astype(np.int64),
                              widc[order_c])
            else:
                # denser-than-pow2 bucket: NC padding is pure matmul waste
                from .utils import ceil_ladder

                NC = ceil_ladder(max(int(cnt_bw.max()), 1), 16)
                key_s = key[order_c]
                colpos = np.arange(total, dtype=np.int64) - bwstart[key_s]
                c_row = np.zeros((NB, nwin, NC), np.int32)
                c_se = np.full((NB, nwin, NC), 0xFF, np.int32)  # empty
                c_row[key_s // nwin, key_s % nwin, colpos] = rowc[order_c]
                c_se[key_s // nwin, key_s % nwin, colpos] = sec[order_c]
        elif mode == "qt":
            ent_sorted = (np.zeros(NB * nwin + 1, np.int64),
                          np.zeros(0, np.int32), np.zeros(0, np.int32),
                          np.zeros(0, np.int64), np.zeros(0, np.int64))
        else:
            c_row = np.zeros((NB, nwin, 16), np.int32)
            c_se = np.full((NB, nwin, 16), 0xFF, np.int32)
    else:
        sparse = hit & (fd < 0) & (fl > 0)
        seg_off_arr[pos[sparse], rows[sparse]] = fo[sparse].astype(np.int32)
        seg_len_arr[pos[sparse], rows[sparse]] = fl[sparse]
    # auxiliary slot lists per plan block: bitmap rows (impact path) or
    # dense tf rows (tf fallback path)
    if mode in ("imp", "qt"):
        for e in np.flatnonzero(hit & (fbm >= 0)):
            dense_lists[int(pos[e])].append((int(fbm[e]), int(rows[e])))
    else:
        for e in np.flatnonzero(hit & (fd >= 0)):
            dense_lists[int(pos[e])].append((int(fd[e]), int(rows[e])))

    if mode == "qt":
        return _build_qt_plan(
            slots, specs, selq, block_list, ent_sorted, dense_lists,
            POS, REQ, NEG, idf, ub_unscored, n_cand, full, nwin,
        )

    VD = max((len(x) for x in dense_lists), default=0)
    dense_ids = dense_slots = None
    if VD:
        VD = ceil_pow2(VD, 4)
        dense_ids = np.full((NB, VD), -1, np.int32)
        dense_slots = np.zeros((NB, VD), np.int32)
        for bi_, lst in enumerate(dense_lists):
            for j, (r, v) in enumerate(lst):
                dense_ids[bi_, j] = r
                dense_slots[bi_, j] = v

    W = POS * idf[None, :]
    Mreq = np.where(NEG, np.float32(-1e4), REQ * ~NEG)
    nreq = (REQ * ~NEG).sum(axis=1).astype(np.int32)

    if mode == "imp":
        P_max = 0
    else:
        P_max = int(seg_len_arr.sum(axis=1).max()) if NB else 0
        # bucket to a 4096*2^i ladder: coarse buckets keep the number of
        # compiled kernel shapes small (each new shape = one TPU compile;
        # precompile_scan warms exactly this ladder)
        P_max = ceil_pow2(max(P_max, 1), 4096)
    return _ShardPlan(
        block_ids=block_list,
        seg_off=seg_off_arr,
        seg_len=seg_len_arr,
        W=W,
        Mreq=Mreq,
        nreq=nreq,
        P_max=P_max,
        full=full,
        ub_unscored=ub_unscored,
        idf=idf,
        n_cand_blocks=n_cand,
        dense_ids=dense_ids,
        dense_slots=dense_slots,
        mode=mode,
        c_row=c_row,
        c_se=c_se,
        qsel=np.ascontiguousarray(selq[:, block_list].T),  # [NB, B]
    )


def _build_qt_plan(slots, specs, selq, block_list, ent_sorted, dense_lists,
                   POS, REQ, NEG, idf, ub_unscored, n_cand, full, nwin=1):
    """Assemble a query-tiled plan: one tile per (block, <=QT selecting
    queries), each carrying only the chunk/dense entries the tile's queries
    actually use (see ops/lexical.lexical_scan_qt)."""
    from .ops.lexical import QT

    NB = len(block_list)
    bwstart, rowi_s, se_s, slot_s, wid_s = ent_sorted
    USE = (POS > 0) | (REQ > 0) | NEG

    t_bid, t_qids, t_rows, t_ses, t_wids, t_dense = [], [], [], [], [], []
    for b in range(NB):
        blk = int(block_list[b])
        qs = np.flatnonzero(selq[:, blk])
        if len(qs) == 0:
            continue
        a, e = int(bwstart[b * nwin]), int(bwstart[(b + 1) * nwin])
        er, es, esl, ew = rowi_s[a:e], se_s[a:e], slot_s[a:e], wid_s[a:e]
        dl = dense_lists[b]
        for i in range(0, len(qs), QT):
            tq = qs[i : i + QT]
            use_mask = USE[tq].any(axis=0)          # bool[V]
            m = use_mask[esl]
            t_bid.append(blk)
            t_qids.append(tq)
            t_rows.append(er[m])
            t_ses.append(es[m])
            t_wids.append(ew[m])
            t_dense.append([(r, v) for (r, v) in dl if use_mask[v]])
    T = len(t_bid)
    if T == 0:
        return None
    ncw = 1
    for w_arr in t_wids:
        if len(w_arr):
            ncw = max(ncw, int(np.bincount(w_arr, minlength=nwin).max()))
    NC = ceil_pow2(ncw, 16)
    VD = max((len(x) for x in t_dense), default=0)
    if VD:
        VD = ceil_pow2(VD, 4)
    bid = np.array(t_bid, np.int32)
    qid = np.full((T, QT), -1, np.int32)
    c_row = np.zeros((T, nwin, NC), np.int32)
    c_se = np.full((T, nwin, NC), 0xFF, np.int32)
    dense_ids = np.full((T, VD), -1, np.int32) if VD else None
    dense_slots = np.zeros((T, VD), np.int32) if VD else None
    for t in range(T):
        qid[t, : len(t_qids[t])] = t_qids[t]
        wt = t_wids[t]
        for w in range(nwin):
            mw = wt == w
            n = int(mw.sum())
            if n:
                c_row[t, w, :n] = t_rows[t][mw]
                c_se[t, w, :n] = t_ses[t][mw]
        if VD:
            for j, (r, v) in enumerate(t_dense[t]):
                dense_ids[t, j] = r
                dense_slots[t, j] = v
    W = POS * idf[None, :]
    Mreq = np.where(NEG, np.float32(-1e4), REQ * ~NEG)
    nreq = (REQ * ~NEG).sum(axis=1).astype(np.int32)
    dummy = np.zeros((1, 1), np.int32)
    return _ShardPlan(
        block_ids=bid, seg_off=dummy, seg_len=dummy,
        W=W, Mreq=Mreq, nreq=nreq, P_max=0, full=full,
        ub_unscored=ub_unscored, idf=idf, n_cand_blocks=n_cand,
        dense_ids=dense_ids, dense_slots=dense_slots, mode="qt",
        c_row=c_row, c_se=c_se, t_qid=qid,
    )


# ---------------------------------------------------------------------------
# posting-space join path (ops/join.py): work per query tracks its terms'
# posting counts — the batched analog of the reference's galloping
# posting-list walks (intersection.rs/union.rs) — instead of corpus size.

JOIN_V_MAX = 4          # slots per query on the join path
JOIN_PW_CAP = 1 << 17   # max window lanes per slot


def _join_backend_ok() -> bool:
    """The join path runs only on gather-friendly backends (CPU).

    Measured on TPU v5e: XLA dynamic gathers run ~10-100 ns/element, so
    the binary-search joins (log2(PW) gather passes over [B, V, PW]) cost
    seconds per batch — 10x slower than the dense doc-space scan they
    replace.  TPU batches take the windowed dense kernels instead; this
    formulation is kept for CPU serving where per-element access is cheap
    and posting-proportional work wins.  Override: SEEKSTORM_TPU_JOIN=1/0.
    """
    import os

    ov = os.environ.get("SEEKSTORM_TPU_JOIN")
    if ov is not None:
        return ov not in ("0", "false")
    import jax

    return jax.default_backend() == "cpu"


def _join_shard_infos(index: Index, slots: list[_Slot], realtime: bool):
    """Per-shard join-path planning state: slot posting-window layouts
    (cached on the shard between commits) + per-shard idf.  Returns None
    when any shard disqualifies the path (deletes, stale format, too many
    blocks)."""
    hs = np.array([sl.hash for sl in slots], dtype=np.uint64)
    idf_hs = np.array(
        [sl.idf_hash if sl.idf_hash is not None else sl.hash
         for sl in slots], dtype=np.uint64)
    V = len(slots)
    out = []
    for shard in index.shards:
        lex = shard.lexical
        d = lex.directory
        if (d is None or getattr(d, "seg_stash_off", None) is None
                or lex.n_blocks > 4095 or shard.deleted):
            return None
        T = len(d.hash)
        ti = np.searchsorted(d.hash, hs)
        found = ti < T
        tc = np.minimum(ti, max(T - 1, 0))
        found &= (d.hash[tc] == hs) if T else False
        df = np.where(found, d.df[tc], 0).astype(np.int64)
        if not np.array_equal(idf_hs, hs):
            ci = np.searchsorted(d.hash, idf_hs)
            cf = ci < T
            cc = np.minimum(ci, max(T - 1, 0))
            cf &= (d.hash[cc] == idf_hs) if T else False
            df = np.where(cf, d.df[cc], df)
        n_docs = lex.doc_count
        df_total = df.copy()
        if realtime:
            l0 = shard.level0
            start = shard.partial_on_disk
            n_docs += l0.doc_count - start
            acc = getattr(l0, "acc", None)
            for v, sl in enumerate(slots):
                h = sl.idf_hash if sl.idf_hash is not None else sl.hash
                if acc is not None:
                    hit = acc.term_postings(h)
                    if hit is not None:
                        df_total[v] += int(np.sum(hit[0] >= start))
                else:
                    tp = l0.terms.get(h)
                    if tp is not None:
                        df_total[v] += int(
                            np.sum(np.asarray(tp.docids) >= start))
        idf = np.where(
            df_total > 0,
            np.log1p((n_docs - df_total + 0.5) / (df_total + 0.5)),
            0.0,
        ).astype(np.float32)

        cache = getattr(lex, "_join_cache", None)
        if cache is None:
            cache = lex._join_cache = {}
        wins = []
        sa = np.where(found, d.seg_start[tc], 0)
        sb = np.where(found, d.seg_start[np.minimum(tc + 1, T)], 0)
        for v in range(V):
            h = int(hs[v])
            w = cache.get(h)
            if w is None:
                w = _join_slot_window(d, int(sa[v]), int(sb[v]))
                cache[h] = w
            wins.append(w)
        out.append({"wins": wins, "idf": idf, "n_blocks": lex.n_blocks})
    return out


_JOIN_EMPTY = {
    "rows": np.zeros(0, np.int32), "a0": 0, "la": 0, "b0": 0, "lb": 0,
    "mk_lane": np.zeros(0, np.int64), "mk_blk": np.zeros(0, np.int32),
    "bm_blk": np.zeros(0, np.int32), "bm_row": np.zeros(0, np.int32),
    "has_bm": False, "nr": 0,
}


def _join_slot_window(d: TermDirectory, a: int, b: int):
    """Posting-window layout of one term on one shard: storage rows
    spanning the compacted-CSR range [dev_off, dev_off+len) plus the
    bitmap-segment stash range, segment-start lane markers, and bitmap
    rows per block.  None when the term exceeds the join-path caps."""
    if b <= a:
        return _JOIN_EMPTY
    devl = np.asarray(d.seg_dev_len[a:b], np.int64)
    devo = np.asarray(d.seg_dev_offset[a:b], np.int64)
    blks = np.asarray(d.seg_block[a:b], np.int32)
    so = np.asarray(d.seg_stash_off[a:b], np.int64)
    sl_ = np.asarray(d.seg_stash_len[a:b], np.int64)
    bmr = np.asarray(d.seg_bitmap[a:b], np.int32)
    ln = int(devl.sum())
    off = int(devo[0])
    st_total = int(sl_.sum())
    sm = sl_ > 0
    st_off = int(so[sm][0]) if st_total else 0
    NRa = 0 if ln == 0 else (off + ln - 1) // 128 - off // 128 + 1
    NRb = (0 if st_total == 0
           else (st_off + st_total - 1) // 128 - st_off // 128 + 1)
    if (NRa + NRb) * 128 > JOIN_PW_CAP or st_total >= (1 << 13):
        return None
    a0 = off % 128 if ln else 0
    b0 = NRa * 128 + (st_off % 128) if st_total else 0
    rows = np.concatenate([
        np.arange(off // 128, off // 128 + NRa, dtype=np.int32),
        np.arange(st_off // 128, st_off // 128 + NRb, dtype=np.int32),
    ])
    am = devl > 0
    mk_lane = np.concatenate([a0 + (devo[am] - off), b0 + (so[sm] - st_off)])
    mk_blk = np.concatenate([blks[am], blks[sm]]).astype(np.int32)
    has_bm = bool((bmr >= 0).any())
    return {
        "rows": rows, "a0": a0, "la": ln, "b0": int(b0), "lb": st_total,
        "mk_lane": mk_lane.astype(np.int64), "mk_blk": mk_blk,
        "bm_blk": blks[bmr >= 0], "bm_row": bmr[bmr >= 0],
        "has_bm": has_bm, "nr": int(NRa + NRb),
    }


def _join_query_ok(spec: _QuerySpec, infos) -> bool:
    """A query rides the join path iff every slot fits a posting window in
    every shard and at most one slot is bitmap-backed anywhere."""
    if len(spec.slots) > JOIN_V_MAX or not spec.weights:
        return False
    n_bm = 0
    for s in spec.slots:
        bm = False
        for sh_info in infos:
            w = sh_info["wins"][s]
            if w is None:
                return False
            bm |= w["has_bm"]
        n_bm += bm
    return n_bm <= 1


def _build_join_plans(index: Index, slots, jspecs, infos, k: int):
    """Pack per-shard join plans into single i32 buffers.  Returns
    (plan_bufs list[np.ndarray], statics dict)."""
    B = len(jspecs)
    S = len(infos)
    # global slot classification: bitmap-backed in ANY shard -> last slot
    bm_global = {
        s: any(info["wins"][s]["has_bm"] for info in infos)
        for spec in jspecs for s in spec.slots
    }
    order = []
    for spec in jspecs:
        csr = [s for s in spec.slots if not bm_global[s]]
        bms = [s for s in spec.slots if bm_global[s]]
        row = csr + [-1] * (JOIN_V_MAX - len(csr) - len(bms)) + bms
        order.append(row)
    has_bm = any(bm_global.values())
    V = JOIN_V_MAX

    NR = 1
    NS = 1
    for info in infos:
        for spec, row in zip(jspecs, order):
            for s in row:
                if s < 0:
                    continue
                w = info["wins"][s]
                NR = max(NR, w["nr"])
                NS = max(NS, len(w["mk_lane"]))
    NR = ceil_pow2(NR, 2)
    NS = ceil_pow2(NS, 2)
    PW = NR * 128
    NBp = ceil_pow2(max(i["n_blocks"] for i in infos), 16)
    Bp = ceil_pow2(B, 16)  # batch-dim bucketing bounds compiled shapes

    bufs = []
    for info in infos:
        wins = info["wins"]
        idf = info["idf"]
        rows = np.full((Bp, V, NR), -1, np.int32)
        packA = np.zeros((Bp, V), np.int32)
        packB = np.zeros((Bp, V), np.int32)
        segp = np.full((Bp, V, NS), -1, np.int32)
        rowtab = np.full((Bp, NBp), -1, np.int32)
        W = np.zeros((Bp, V), np.float32)
        flags = np.zeros((Bp, V), np.int32)  # bit0 required, bit1 negated
        nreq = np.zeros(Bp, np.int32)
        for qi, (spec, row) in enumerate(zip(jspecs, order)):
            nr_q = 0
            for vi, s in enumerate(row):
                if s < 0:
                    continue
                w = wins[s]
                n = len(w["rows"])
                rows[qi, vi, :n] = w["rows"]
                packA[qi, vi] = (w["a0"] << 24) | w["la"]
                packB[qi, vi] = (w["b0"] << 13) | w["lb"]
                m = len(w["mk_lane"])
                if m:
                    segp[qi, vi, :m] = (
                        (w["mk_lane"] << 12) | w["mk_blk"]
                    ).astype(np.int32)
                neg = spec.negated.get(s, False)
                req = spec.required.get(s, False) and not neg
                flags[qi, vi] = (1 if req else 0) | (2 if neg else 0)
                if not neg and s in spec.weights:
                    W[qi, vi] = idf[s]
                if req:
                    nr_q += 1
                if vi == V - 1 and len(w["bm_blk"]):
                    rowtab[qi, w["bm_blk"]] = w["bm_row"]
            nreq[qi] = nr_q
        bufs.append(np.concatenate([
            rows.reshape(-1), packA.reshape(-1), packB.reshape(-1),
            segp.reshape(-1), rowtab.reshape(-1),
            W.reshape(-1).view(np.int32), flags.reshape(-1), nreq,
        ]))
    statics = dict(B=Bp, V=V, NR=NR, NS=NS, NBp=NBp, PW=PW,
                   has_bm=has_bm, k=k)
    return bufs, statics


# ---------------------------------------------------------------------------
# device dispatch


def _device_arrays(index: Index, shard: Shard):
    """Per-shard deleted-mask HBM tensor, cached on the shard object (the
    lexical posting tensors live in the stacked executor; only the vector
    path needs the standalone deleted mask)."""
    import jax.numpy as jnp

    cache = getattr(shard, "_dev", None)
    if cache is not None:
        return cache
    lex = shard.lexical
    n = max(lex.n_blocks, 1) * BLOCK_SIZE
    deleted = np.zeros(n, dtype=bool)
    if shard.deleted:
        ids = np.fromiter(shard.deleted, dtype=np.int64)
        ids = ids[ids < n]
        deleted[ids] = True
    cache = {"deleted": jnp.asarray(deleted)}
    shard._dev = cache
    return cache


# ---------------------------------------------------------------------------
# public entry points


def search(index: Index, request: SearchRequest) -> ResultSet:
    return search_batch(index, [request])[0]


def _req_signature(r: SearchRequest) -> tuple:
    """Batch-compatibility key: everything except the query text/vector
    and paging (one device launch per distinct signature)."""
    return (
        r.result_type, r.realtime,
        tuple(r.field_filter), tuple(r.fields),
        tuple((h.field, h.fragment_number, h.fragment_size,
               h.highlight_markup) for h in r.highlights),
        tuple((qf.field, qf.length, repr(qf.ranges))
              for qf in r.query_facets),
        tuple((f.field, tuple(f.values) if f.values else None,
               tuple(f.range) if f.range else None)
              for f in r.facet_filter),
        tuple((s.field, s.order, repr(s.base)) for s in r.result_sort),
        r.search_mode, r.ann_mode, r.nprobe, r.similarity_threshold,
        r.top_n, tuple(map(repr, r.distance_fields)),
        repr(r.query_rewriting),
    )


def search_batch(index: Index, requests: list[SearchRequest]) -> list[ResultSet]:
    """Execute a batch of lexical/vector/hybrid searches.

    Heterogeneous batches are grouped by compatible settings internally
    (one device launch per group); queries, paging, and query vectors may
    differ freely within a group."""
    from .metrics import METRICS

    if len(requests) > 1:
        sig0 = _req_signature(requests[0])
        if any(_req_signature(r) != sig0 for r in requests[1:]):
            groups: dict[tuple, list[int]] = {}
            for i, r in enumerate(requests):
                groups.setdefault(_req_signature(r), []).append(i)
            out: list[ResultSet | None] = [None] * len(requests)
            for idxs in groups.values():
                sub = search_batch(index, [requests[i] for i in idxs])
                for i, rs in zip(idxs, sub):
                    out[i] = rs
            return out  # type: ignore[return-value]

    METRICS.inc("queries_total", len(requests))
    index.ensure_loaded()
    t0 = time.perf_counter()
    req0 = requests[0]
    out: list[ResultSet] = []

    # query rewriting (QAC / spelling, reference search.rs:1200-1390)
    outcomes = None
    if any(
        r.query_rewriting not in (None, "SearchOnly") for r in requests
    ) and req0.search_mode != SearchMode.Vector:
        import dataclasses

        from .rewrite import rewrite_query

        outcomes = [
            rewrite_query(index, r.query, r.query_rewriting, index.analyzer)
            for r in requests
        ]
        suggest_only = [
            isinstance(r.query_rewriting, dict)
            and next(iter(r.query_rewriting)) == "SuggestOnly"
            for r in requests
        ]
        if all(suggest_only):
            res = []
            for r, oc in zip(requests, outcomes):
                rs = ResultSet(suggestions=oc.suggestions)
                rs.time_us = (time.perf_counter() - t0) * 1e6
                res.append(rs)
            return res
        requests = [
            dataclasses.replace(r, query=oc.query)
            for r, oc in zip(requests, outcomes)
        ]
        req0 = requests[0]

    if req0.search_mode == SearchMode.Vector:
        from .vector_search import vector_search_batch

        out = vector_search_batch(index, requests)
    elif req0.search_mode == SearchMode.Hybrid:
        from .vector_search import hybrid_search_batch

        out = hybrid_search_batch(index, requests)
    else:
        out = _lexical_search_batch(index, requests)

    dt = (time.perf_counter() - t0) * 1e6 / max(len(requests), 1)
    METRICS.observe("search_batch", dt * 1e-6 * max(len(requests), 1))
    for i, r in enumerate(out):
        r.time_us = dt
        if outcomes is not None:
            r.suggestions = outcomes[i].suggestions
    return out


def _empty_query_results(index: Index, req: SearchRequest) -> ResultSet:
    """Empty-query browse path (reference search.rs:1413 -> iterator.rs):
    supports facet_filter, query_facets and result_sort over all docs
    (reference enable_empty_query semantics)."""
    rs = ResultSet()
    index.ensure_loaded()

    # match-all mask over all docs (committed + tail), host columnar
    from . import facets as facets_mod

    rt = facets_mod.get_runtime(index) if (
        req.facet_filter or req.query_facets or req.result_sort
    ) else None

    gids = []
    keep = []
    for shard in index.shards:
        n = shard.doc_count
        local = np.arange(n, dtype=np.int64)
        mask = np.ones(n, dtype=bool)
        if shard.deleted:
            dl = np.fromiter(shard.deleted, dtype=np.int64)
            dl = dl[dl < n]
            mask[dl] = False
        if rt is not None and req.facet_filter:
            allowed = rt.filter_mask(req.facet_filter)
            if allowed is not None:
                am = allowed[shard.shard_id]
                committed = min(n, shard.committed_doc_count, am.shape[0])
                mask[:committed] &= am[local[:committed]]
                # tail docs: evaluate from level-0 values
                for li in range(committed, n):
                    ok = True
                    for f in req.facet_filter:
                        sf = index.schema_map[f.field]
                        vals = shard.level0.facet_values.get(sf.facet_id, [])
                        ti = li - shard.full_levels * BLOCK_SIZE
                        v = vals[ti] if 0 <= ti < len(vals) else None
                        if f.values is not None:
                            if sf.field_type.is_string_facet:
                                tab = getattr(index, "_facet_tables", {}).get(
                                    sf.facet_id, {"": 0})
                                want = {tab.get(str(x), -1) for x in f.values}
                                sets = getattr(index, "_facet_set_tables",
                                               {}).get(sf.facet_id)
                                if sets is not None:
                                    members = next(
                                        (m for m, so in sets.items()
                                         if so == v), ())
                                    ok &= bool(want & set(members))
                                else:
                                    ok &= v in want
                            else:
                                ok &= v in [float(x) for x in f.values]
                        elif f.range is not None and v is not None:
                            lo, hi = f.range
                            ok &= lo <= v <= hi
                        else:
                            ok &= v is not None
                    if not ok:
                        mask[li] = False
        sel = local[mask]
        gids.append(sel * index.shard_count + shard.shard_id)
        keep.append((shard, sel))
    all_gids = np.concatenate(gids) if gids else np.zeros(0, np.int64)
    rs.result_count_total = int(len(all_gids))

    # ordering: docid asc by default, or result_sort keys
    if rt is not None and req.result_sort:
        rs0 = req.result_sort[0]
        key = rt.sort_key(rs0)  # [S, N]
        kvals = np.zeros(len(all_gids), np.float32)
        pos = 0
        for shard, sel in keep:
            committed_cols = key.shape[1]
            kv = np.zeros(len(sel), np.float32)
            inb = sel < committed_cols
            kv[inb] = key[shard.shard_id, sel[inb]]
            kvals[pos : pos + len(sel)] = kv
            pos += len(sel)
        order = np.lexsort((all_gids, -kvals if rs0.order != "Ascending"
                            else kvals))
        all_gids = all_gids[order]
        kvals = kvals[order]
    else:
        order = np.argsort(all_gids, kind="stable")
        all_gids = all_gids[order]
        kvals = None

    page = all_gids[req.offset : req.offset + req.length]
    if kvals is not None:
        pk = kvals[req.offset : req.offset + req.length]
        rs.results = [ResultObject(doc_id=int(g), score=float(v))
                      for g, v in zip(page, pk)]
    else:
        rs.results = [ResultObject(doc_id=int(g), score=0.0) for g in page]
    rs.result_count = len(rs.results)

    # facet counting over all matching docs
    if rt is not None and req.query_facets:
        rs.facets = {}
        for qf in req.query_facets:
            codes, labels, nc = rt.codes_for(qf)
            sf = index.schema_map[qf.field]
            vec = np.zeros(max(nc, 1), np.float64)
            for shard, sel in keep:
                committed = shard.committed_doc_count
                inb = sel[sel < committed]
                c = codes[shard.shard_id, inb]
                np.add.at(vec, np.clip(c, 0, nc - 1), 1)
                # tail docs: codes from level-0 facet values
                tail_sel = sel[sel >= committed]
                if len(tail_sel):
                    vals = shard.level0.facet_values.get(sf.facet_id, [])
                    base2 = shard.full_levels * BLOCK_SIZE
                    raw = [vals[g - base2] if 0 <= g - base2 < len(vals)
                           else None for g in tail_sel]
                    if qf.ranges is not None:
                        from .schema import FieldType as FT3

                        if sf.field_type == FT3.Point:
                            from . import geo as geo_mod

                            lat = np.array([v[0] if v else 0.0 for v in raw])
                            lon = np.array([v[1] if v else 0.0 for v in raw])
                            code_col = geo_mod.point_distance(
                                geo_mod.encode_morton_2_d(lat, lon),
                                float(qf.ranges.base[0]),
                                float(qf.ranges.base[1]))
                            if qf.ranges.unit == "Miles":
                                code_col = code_col * 0.621371192
                        else:
                            code_col = np.array(
                                [0 if v is None else v for v in raw],
                                np.float64)
                        bounds = np.array([float(r[1])
                                           for r in qf.ranges.ranges])
                        cc = np.searchsorted(bounds, code_col, side="right")
                    else:
                        cc = np.array([0 if v is None else int(v)
                                       for v in raw], np.int64)
                    np.add.at(vec, np.clip(cc, 0, nc - 1), 1)
            if qf.ranges is not None and qf.ranges.range_type != \
                    "CountWithinRange":
                if qf.ranges.range_type == "CountAboveRange":
                    vec = np.cumsum(vec[::-1])[::-1]
                else:
                    vec = np.cumsum(vec)
            if isinstance(labels, tuple) and labels and labels[0] == "__SETS__":
                set_members = labels[1]
                vcounts = {}
                for so in np.flatnonzero(vec):
                    if so < len(set_members):
                        for v in set_members[so]:
                            vcounts[v] = vcounts.get(v, 0) + int(vec[so])
                pairs = sorted(vcounts.items(),
                               key=lambda kv2: (-kv2[1], str(kv2[0])))
            else:
                nz = np.flatnonzero(vec)
                pairs = sorted(
                    ((labels[c2] if labels else int(c2), int(vec[c2]))
                     for c2 in nz),
                    key=lambda kv2: (-kv2[1], str(kv2[0])),
                )
            rs.facets[qf.field] = pairs[: qf.length]

    _attach_docs(index, req, rs)
    return rs


def _lexical_search_batch(
    index: Index, requests: list[SearchRequest]
) -> list[ResultSet]:
    from .metrics import METRICS

    req0 = requests[0]
    queries = [r.query for r in requests]
    slots, specs = _build_specs(
        index, queries, [r.query_type_default for r in requests])

    results: list[ResultSet | None] = [None] * len(requests)
    live: list[int] = []
    def _warm_facets_ok(r, entry, warm_k):
        """Cached facets serve the request iff every requested facet is a
        plain (no ranges) histogram the warmup computed, shallow enough
        that the cached depth is exact."""
        if not r.query_facets:
            return True
        if len(entry) < 4:
            return False
        wfacets = entry[3]
        return all(
            qf.ranges is None and qf.field in wfacets
            and qf.length <= warm_k
            for qf in r.query_facets
        )

    warm = getattr(index, "_warmup_cache", None) or {}
    warm_k = getattr(index, "_warmup_k", 0)
    for i, (r, spec) in enumerate(zip(requests, specs)):
        if not r.query.strip():
            results[i] = _empty_query_results(index, r)
        elif not spec.weights:
            results[i] = ResultSet()
        elif (
            warm
            and len(spec.weights) == 1
            and not spec.phrases
            and not any(spec.negated.values())
            and not r.facet_filter
            and not r.result_sort
            and r.offset + r.length <= warm_k
            and (not r.realtime
                 or all(sh.tail_len() == 0 for sh in index.shards))
            and slots[next(iter(spec.weights))].hash in warm
            and _warm_facets_ok(r, warm[slots[next(iter(spec.weights))]
                                        .hash], warm_k)
        ):
            # frequent-word cached result (reference warmup index.rs:4006;
            # facet histograms served from the same cache, :4035-4050)
            entry = warm[slots[next(iter(spec.weights))].hash]
            scores, gids, total = entry[:3]
            wfacets = entry[3] if len(entry) > 3 else {}
            rs = ResultSet()
            rs.result_count_total = int(total)
            pg = slice(r.offset, r.offset + r.length)
            rs.results = [
                ResultObject(doc_id=int(g), score=float(sc))
                for sc, g in zip(scores[pg], gids[pg])
            ]
            rs.result_count = len(rs.results)
            rs.query_terms = [slots[s2].term for s2 in spec.weights
                              if not slots[s2].virtual]
            if r.query_facets:
                rs.facets = {
                    qf.field: wfacets[qf.field][: qf.length]
                    for qf in r.query_facets
                }
            _attach_docs(index, r, rs)
            results[i] = rs
        else:
            live.append(i)
    if not live:
        return [r or ResultSet() for r in results]

    live_specs = [specs[i] for i in live]
    with_counts = req0.result_type in (ResultType.Count, ResultType.TopkCount)
    has_phrase = any(s.phrases for s in live_specs)
    # paging may differ within a batch group; size k by the deepest page
    need = max(r.offset + r.length for r in requests)
    k = ceil_pow2(max(need, 10), 16)
    if has_phrase:
        k = ceil_pow2(max(4 * need + 64, 128))

    # boost profile (field_filter zeroes non-selected fields).  Queries on
    # the schema's default profile ride the impact fast path (commit-time
    # precomputed per-posting impacts); custom profiles (field_filter) fall
    # back to the tf kernel, which recombines fields at query time.
    boosts = index.boosts_or_default().copy()
    mode = "imp"
    if req0.field_filter:
        keep = {f for f in req0.field_filter}
        for sf in index.indexed_fields:
            if sf.field not in keep:
                boosts[sf.indexed_field_id] = 0.0
        if not np.array_equal(boosts, index.boosts_or_default()):
            mode = "tf"

    B = len(live)
    merged_scores = [np.zeros(0, np.float32) for _ in range(B)]
    merged_ids = [np.zeros(0, np.int64) for _ in range(B)]
    counts = np.zeros(B, dtype=np.int64)
    tail_phrase_counts = np.zeros(B, dtype=np.int64)
    counts_exact = np.ones(B, dtype=bool)

    need_full = with_counts or has_phrase

    stacked = _get_stacked(index)

    # ---- facet counting / filtering / sorting wiring ----
    from . import facets as facets_mod

    rt = None
    allowed_dev = None
    if req0.facet_filter:
        rt = facets_mod.get_runtime(index)
        fsig = tuple(
            (f.field, tuple(f.values) if f.values else None,
             tuple(f.range) if f.range else None)
            for f in req0.facet_filter
        )
        mask = rt.filter_mask(req0.facet_filter)
        if mask is not None:
            allowed_dev = stacked.aux_device(("filter", fsig), bool,
                                             lambda: mask)

    facet_specs = []
    fcod_dev = None
    fcm = 1
    if req0.query_facets:
        rt = rt or facets_mod.get_runtime(index)
        arrs = []
        for qf in req0.query_facets:
            codes, labels, nc = rt.codes_for(qf)
            arrs.append(codes)
            facet_specs.append((qf, labels, nc))
        # bucket to >=16 so facet configs share compiled kernels
        fcm = ceil_pow2(max(nc for _, _, nc in facet_specs), 16)
        fkey = ("facets", tuple(
            (qf.field,
             tuple((r[0], float(r[1])) for r in qf.ranges.ranges)
             if qf.ranges else None)
            for qf, _, _ in facet_specs
        ))
        def _build_fcod():
            a = np.stack(arrs, axis=1)  # [S, NF, N]
            nf_pad = ceil_pow2(a.shape[1], 1)
            if nf_pad != a.shape[1]:
                a = np.concatenate(
                    [a, np.zeros((a.shape[0], nf_pad - a.shape[1],
                                  a.shape[2]), a.dtype)], axis=1)
            return a
        fcod_dev = stacked.aux_device(fkey, np.int32, _build_fcod)
        need_full = True  # facet counting covers all matched docs

    sorting = bool(req0.result_sort)
    sort_desc = True
    skey_dev = None
    if sorting:
        rt = rt or facets_mod.get_runtime(index)
        rs0 = req0.result_sort[0]
        sort_desc = rs0.order != "Ascending"
        skey_host = rt.sort_key(rs0)
        skey = ("sort", rs0.field,
                tuple(rs0.base) if rs0.base is not None else None)
        skey_dev = stacked.aux_device(skey, np.float32, lambda: skey_host)
        need_full = True  # score pruning is invalid under facet ordering
        k = ceil_pow2(max(4 * need, 64))

    fc_total = np.zeros(
        (ceil_pow2(max(len(facet_specs), 1), 1), B, fcm), np.float64)

    # adaptive pruning: per-query block pruning only pays when the block-max
    # upper bounds actually discriminate (skewed corpora).  On flat corpora
    # every batch fails the exactness check and re-runs full — worse than
    # planning full coverage directly — so pruning disables itself once the
    # observed escalation rate crosses 1/2 (reference analog: block-max
    # early-exit degrades to a full scan when max_block_score is flat,
    # intersection.rs:2224-2300).
    with _PRUNE_LOCK:
        stats = getattr(index, "_prune_stats", None)
        if stats is None:
            stats = index._prune_stats = [0, 0]  # [escalated, attempted]
        prune_ok = stats[1] < 8 or stats[0] * 2 < stats[1]
    cover_full = need_full or not prune_ok

    # bucket-WAND path (ops/wand.py): Topk/TopkCount/Count batches at
    # reference scale ride a packed-bitmap upper-bound scan + exact host
    # rescore — per-batch device work is ~1/50th of the dense kernels and
    # counts stay exact (phase-1 popcount).  Faceted/filtered batches ride
    # it too: facet histograms accumulate exactly in the same scan (MXU
    # one-hot matmul over the unpacked match bits) and the batch-shared
    # facet filter ANDs in as a packed disallowed bitmap, like deletes.
    # Phrase specs ride it too (verification + exact counting happen in
    # _finalize_lexical, identically to the dense path).  Ineligible rows
    # (> T_MAX slots) fall through to the join/dense paths below.
    # Sort-ordered batches ride WAND only on request: rank-by-key bounds
    # are per-bucket BEST keys, and with sort keys uncorrelated to doc
    # order (uniform geo) the 65th bucket's bound beats the k-th actual
    # matched key essentially always — measured 64/64 exact-fallbacks on
    # a 500K bursty corpus vs 0/64 for score mode — so the dense sort
    # kernel stays the default.  SEEKSTORM_TPU_WAND_SORT=1 enables it for
    # corpora whose sort keys cluster with insertion order (price/time).
    wand_sort_ok = (not req0.result_sort
                    or bool(os.environ.get("SEEKSTORM_TPU_WAND_SORT")))
    wanded = np.zeros(B, bool)
    if (
        mode == "imp"
        and need <= 1024
        and not (req0.facet_filter and allowed_dev is None)
        and len(req0.result_sort) <= 1
        and wand_sort_ok
    ):
        from .ops import wand as wand_mod

        if wand_mod.wand_auto(index):
            wrows = [i for i in range(B)
                     if wand_mod.query_ok(live_specs[i])]
            if wrows:
                wstate = wand_mod.get_state(index)
                wfcod_dev = None
                if facet_specs:
                    _, wfcod_dev = wstate.aux(
                        ("facets", fkey),
                        lambda: _wand_facet_codes(
                            index, wstate, [rt.codes_for(qf)[0]
                                            for qf, _, _ in facet_specs]),
                        axis=1)
                wfilt_dev = wfilt_host = None
                if req0.facet_filter:
                    wfilt_host, wfilt_dev = wstate.aux(
                        ("filter", fsig),
                        lambda: _wand_filter_words(index, wstate, mask))
                wskeyb_dev = wrank_host = None
                if sorting:
                    sk = ("sort", rs0.field,
                          tuple(rs0.base) if rs0.base is not None
                          else None, sort_desc)
                    wrank_host, _ = wstate.aux(
                        sk + ("flat",),
                        lambda: _wand_rank_key(
                            index, wstate, skey_host, sort_desc),
                        device=False)
                    _, wskeyb_dev = wstate.aux(
                        sk + ("bmax",),
                        lambda: wrank_host.reshape(-1, 32).max(axis=1)
                        .reshape(wstate.nblk_pad, BLOCK_SIZE // 32))
                idf_ps = np.stack([
                    _shard_idf(sh, slots, req0.realtime)
                    for sh in index.shards])          # [S, V]
                wsc, wgid, wcnt, wfc, whandled = wand_mod.run_batch(
                    index, slots, [live_specs[i] for i in wrows],
                    idf_ps, max(need, 1), with_counts,
                    fcod_dev=wfcod_dev, n_facets=len(facet_specs),
                    fcm=fcm, filtw_dev=wfilt_dev, filt_host=wfilt_host,
                    skeyb_dev=wskeyb_dev, rank_key_host=wrank_host,
                    count_only=(req0.result_type == ResultType.Count))
                for r, qi in enumerate(wrows):
                    if not whandled[r]:
                        # UB-saturated straggler: falls through to the
                        # join/dense device paths below (exact, already
                        # overlapped dispatches) instead of a host-serial
                        # exact evaluation
                        continue
                    merged_scores[qi] = wsc[r]
                    merged_ids[qi] = wgid[r]
                    counts[qi] = wcnt[r]
                    wanded[qi] = True
                    if wfc is not None:
                        fc_total[:len(facet_specs), qi] += wfc[:, r, :fcm]

    # posting-space join path: Topk-only batches whose queries fit posting
    # windows ride ops/join.py — per-query work tracks its terms' posting
    # counts (the reference's galloping-intersection cost model), results
    # exact with no pruning or escalation.  Queries that don't fit (huge
    # windows, >= 2 bitmap terms, deep paging) stay on the doc-space scan.
    joined = np.zeros(B, bool)
    if (
        mode == "imp"
        and not with_counts and not has_phrase
        and not req0.query_facets and not req0.facet_filter
        and not req0.result_sort
        and k <= STASH_K
        and _join_backend_ok()
    ):
        infos = _join_shard_infos(index, slots, req0.realtime)
        if infos is not None:
            with METRICS.timer("lex_plan"):
                jrows = [i for i, sp in enumerate(live_specs)
                         if not wanded[i] and _join_query_ok(sp, infos)]
                if jrows:
                    jspecs = [live_specs[i] for i in jrows]
                    bufs, statics = _build_join_plans(
                        index, slots, jspecs, infos, k)
            if jrows:
                METRICS.inc("device_dispatch_total")
                ts_j, gid_j = stacked.run_join(bufs, statics)
                for r, qi in enumerate(jrows):
                    valid = np.isfinite(ts_j[r])
                    merged_scores[qi] = ts_j[r][valid].astype(np.float32)
                    merged_ids[qi] = gid_j[r][valid].astype(np.int64)
                    joined[qi] = True

    rest_rows = [i for i in range(B) if not joined[i] and not wanded[i]]
    live_specs_rest = [live_specs[i] for i in rest_rows]

    # Topk-only PRUNED batches on large shards ride the query-tiled kernel:
    # per scan step work tracks the pruned plan (block x selecting-query
    # tile) instead of block x whole-batch (ops/lexical.lexical_scan_qt).
    # Full-coverage plans keep the full-batch kernel, which decodes each
    # (slot, block) segment exactly once.
    if (
        mode == "imp"
        and not cover_full
        and not req0.facet_filter
        and max(sh.lexical.n_blocks for sh in index.shards) >= QT_MIN_BLOCKS
    ):
        mode = "qt"

    k_eff = k
    nwin = _plan_windows(index) if mode in ("imp", "qt") else 1
    slots_rest = slots
    if rest_rows:
        # compact the slot table to the rest queries' terms: _plan_shard's
        # vectorized segment planning scales with the slot-table width,
        # and at mega-batch the full table holds thousands of slots while
        # the handful of deferred WAND stragglers use a dozen (~95 ms of
        # per-batch planning measured at batch 2048)
        used = sorted({s for sp in live_specs_rest for s in sp.slots})
        if len(used) < len(slots) // 4:
            remap = {s: j for j, s in enumerate(used)}
            slots_rest = [slots[s] for s in used]
            live_specs_rest = [
                _QuerySpec(
                    slots=[remap[s] for s in sp.slots],
                    weights={remap[s]: w for s, w in sp.weights.items()},
                    required={remap[s]: v
                              for s, v in sp.required.items()},
                    negated={remap[s]: v for s, v in sp.negated.items()},
                    phrases=[[(remap[s], off) for s, off in grp]
                             for grp in sp.phrases],
                    parsed=sp.parsed,
                )
                for sp in live_specs_rest
            ]
        with METRICS.timer("lex_plan"):
            plans = [
                _plan_shard(index, sh, slots_rest, live_specs_rest,
                            req0.realtime, cover_full, PRUNE_BLOCKS,
                            mode=mode, nwin=nwin)
                for sh in index.shards
            ]
    else:
        plans = []
    if any(p is not None for p in plans):
        from .metrics import METRICS

        METRICS.inc("device_dispatch_total")
        all_full = all(p is None or p.full for p in plans)
        ts, gid, cnt, fcounts = stacked.run(
            plans, boosts, k_eff, with_counts and all_full,
            fcod_dev=fcod_dev, facet_codes_max=fcm,
            skey_dev=skey_dev, sort_desc=sort_desc,
            allowed_dev=allowed_dev,
        )
        if not all_full:
            with _PRUNE_LOCK:
                stats[1] += 1
            ub = np.zeros(len(rest_rows), np.float32)
            for p in plans:
                if p is not None:
                    ub = np.maximum(ub, p.ub_unscored)
            kth = ts[:, min(need, k_eff) - 1]
            if ((kth < ub) | ~np.isfinite(kth)).any():
                with _PRUNE_LOCK:
                    stats[0] += 1
                METRICS.inc("plan_escalations_total")
                METRICS.inc("device_dispatch_total")
                # escalation covers each query's full candidate set; the
                # qt kernel handles full coverage fine (tiles per block)
                plans = [
                    _plan_shard(index, sh, slots_rest, live_specs_rest,
                                req0.realtime, True, PRUNE_BLOCKS,
                                mode=mode, nwin=nwin)
                    for sh in index.shards
                ]
                ts, gid, cnt, fcounts = stacked.run(
                    plans, boosts, k_eff, with_counts,
                    fcod_dev=fcod_dev, facet_codes_max=fcm,
                    skey_dev=skey_dev, sort_desc=sort_desc,
                    allowed_dev=allowed_dev,
                )
                all_full = True
        for r, qi in enumerate(rest_rows):
            valid = np.isfinite(ts[r])
            merged_scores[qi] = np.concatenate(
                [merged_scores[qi], ts[r][valid]]
            )
            merged_ids[qi] = np.concatenate(
                [merged_ids[qi], gid[r][valid]]
            )
        if with_counts and all_full:
            counts[rest_rows] += cnt
        elif with_counts:
            counts_exact[:] = False
        if facet_specs and all_full:
            # fcounts rows cover the rest (non-wanded) queries only
            fc_total[:, rest_rows] += fcounts[:, :len(rest_rows)]

    # rows whose pages are already canonical — deduped and (score desc,
    # gid asc) sorted by the WAND ladder/rescore — skip the defensive
    # re-sort in _finalize_lexical (~40 us/query of numpy overhead on the
    # hot serving path); any tail merge below concatenates and voids it
    canonical = wanded.copy()
    for shard in index.shards:
        if req0.realtime and shard.tail_len() > 0:
            _merge_tail(index, shard, slots, live_specs, boosts,
                        merged_scores, merged_ids, counts, with_counts,
                        req0, facet_specs, fc_total, fcm, sorting, sort_desc,
                        tail_phrase_counts=tail_phrase_counts)
            canonical[:] = False
    return _finalize_lexical(index, requests, results, live, live_specs,
                             slots, merged_scores, merged_ids, counts,
                             counts_exact, with_counts, facet_specs,
                             fc_total, sorting, sort_desc,
                             tail_phrase_counts=tail_phrase_counts,
                             phrase_escalate_ok=(mode in ("imp", "qt")),
                             canonical=canonical)


def precompile_scan(
    index: Index,
    batch_sizes=(128,),
    nc_buckets=None,
    v_buckets=(32, 128),
    ks=(16, 64),
    facet_shapes=(),          # (n_facets_padded, facet_codes_max) pairs
    sort_modes=(False,),
) -> int:
    """Precompile the device scan for a grid of plan shapes.

    Every distinct (NB, NC, V, B, k, facets, sort) tuple is one XLA
    compilation; on a cold server the first query of each shape pays it
    (3-40 s on TPU, persisted in the on-disk compile cache afterwards).
    Call this once at deploy time — or set SEEKSTORM_TPU_PRECOMPILE=1 on
    the server — to take those compiles up front.  Returns the number of
    shapes compiled."""
    from .ops.lexical import CHUNK

    index.ensure_loaded()
    stacked = _get_stacked(index)
    boosts = index.boosts_or_default()
    nb = max(max(sh.lexical.n_blocks for sh in index.shards), 1)
    nb = ceil_pow2(nb, 1)
    max_rows = max(
        ((len(sh.lexical.dev_docid) + CHUNK - 1) // CHUNK
         for sh in index.shards if sh.lexical.dev_docid is not None),
        default=1,
    )
    if nc_buckets is None:
        nc_buckets, nc = [], 16
        while nc < max_rows:
            nc_buckets.append(nc)
            nc *= 2
        nc_buckets.append(nc)
    n = 0
    for B in batch_sizes:
        for v in v_buckets:
            for NC in nc_buckets:
                for k in ks:
                    for fshape in ((0, 1), *facet_shapes):
                        for use_sort in sort_modes:
                            plan = _ShardPlan(
                                block_ids=np.zeros(nb, np.int32),
                                seg_off=np.zeros((nb, v), np.int32),
                                seg_len=np.zeros((nb, v), np.int32),
                                W=np.zeros((B, v), np.float32),
                                Mreq=np.zeros((B, v), np.float32),
                                nreq=np.zeros(B, np.int32),
                                P_max=0,
                                full=True,
                                ub_unscored=np.zeros(B, np.float32),
                                idf=np.zeros(v, np.float32),
                                n_cand_blocks=np.zeros(B, np.int32),
                                mode="imp",
                                c_row=np.zeros(
                                    (nb, _plan_windows(index), NC),
                                    np.int32),
                                c_se=np.full(
                                    (nb, _plan_windows(index), NC),
                                    0xFF, np.int32),
                            )
                            nf, fcm = fshape
                            fcod = None
                            if nf:
                                fcod = stacked.aux_device(
                                    ("precompile_fcod", nf), np.int32,
                                    lambda: np.zeros(
                                        (index.shard_count, nf,
                                         stacked.NB_pad * BLOCK_SIZE),
                                        np.int32),
                                )
                            skey = None
                            if use_sort:
                                skey = stacked.aux_device(
                                    ("precompile_skey",), np.float32,
                                    lambda: np.zeros(
                                        (index.shard_count,
                                         stacked.NB_pad * BLOCK_SIZE),
                                        np.float32),
                                )
                            stacked.run(
                                [plan] * index.shard_count, boosts, k,
                                True, fcod_dev=fcod, facet_codes_max=fcm,
                                skey_dev=skey, sort_desc=True,
                            )
                            n += 1
    from .ops import wand as wand_mod

    if wand_mod.wand_auto(index):
        n += wand_mod.precompile(index, batch_sizes=batch_sizes)
    return n


def _get_stacked(index: Index):
    """Stacked executor over all shards (single code path for 1..N shards,
    mesh-sharded when a mesh is attached)."""
    mesh = getattr(index, "_mesh", None)
    st = getattr(index, "_stacked", None)
    if st is None or index._device_dirty:
        from .parallel.mesh import StackedIndex

        st = StackedIndex(index, mesh)
        index._stacked = st
        index._device_dirty = False
        index._facet_runtime_dirty = True
    return st


def _slot_global_docids(index, slots, s) -> np.ndarray:
    """All committed global doc ids holding slot s (host posting lists)."""
    h = slots[s].hash
    out = []
    for shard in index.shards:
        lex = shard.lexical
        d = lex.directory
        ti = d.lookup(h)
        if ti < 0 or lex.pl_docid is None:
            continue
        for e in range(int(d.seg_start[ti]), int(d.seg_start[ti + 1])):
            a = int(d.seg_offset[e])
            ln = int(d.seg_len[e])
            ids = (lex.pl_docid[a : a + ln].astype(np.int64)
                   + int(d.seg_block[e]) * BLOCK_SIZE)
            out.append(ids * index.shard_count + shard.shard_id)
    return np.concatenate(out) if out else np.zeros(0, np.int64)


def _phrase_exact_committed(index, slots, spec, request) -> np.ndarray:
    """Sorted global ids of committed docs matching the WHOLE query's
    phrase + required/negated/deleted (+ facet filter) constraints —
    exact phrase counting with no candidate cliff (reference gets this
    from per-doc position streams, add_result.rs:38-92)."""
    from .phrase import phrase_docs_global

    cand = phrase_docs_global(index, slots, spec)
    cand = np.sort(cand)
    phrase_slots = {s for ph in spec.phrases for s, _ in ph}
    for s, r in spec.required.items():
        if not r or spec.negated.get(s) or s in phrase_slots:
            continue
        if len(cand) == 0:
            break
        cand = cand[np.isin(cand, _slot_global_docids(index, slots, s))]
    for s, n_ in spec.negated.items():
        if not n_ or len(cand) == 0:
            continue
        cand = cand[~np.isin(cand, _slot_global_docids(index, slots, s))]
    S = index.shard_count
    for shard in index.shards:
        if shard.deleted and len(cand):
            dl = np.fromiter(shard.deleted, dtype=np.int64)
            cand = cand[~np.isin(cand, dl * S + shard.shard_id)]
    if request is not None and request.facet_filter and len(cand):
        from . import facets as facets_mod

        rt = facets_mod.get_runtime(index)
        allowed = rt.filter_mask(request.facet_filter)
        if allowed is not None:
            sid = (cand % S).astype(np.int64)
            loc = (cand // S).astype(np.int64)
            okm = np.ones(len(cand), bool)
            for shard in index.shards:
                m = sid == shard.shard_id
                am = allowed[shard.shard_id]
                inb = loc[m] < am.shape[0]
                ok_part = np.zeros(int(m.sum()), bool)
                ok_part[inb] = am[loc[m][inb]]
                okm[m] = ok_part
            cand = cand[okm]
    return cand


def _score_gids(index, slots, spec, gids, realtime) -> np.ndarray:
    """Exact imp-mode BM25F scores of arbitrary committed global ids from
    the host CSR (idf x stored impact, accumulated in ascending slot id,
    the same arithmetic as the device scorer)."""
    S = index.shard_count
    out = np.zeros(len(gids), np.float32)
    if not len(gids):
        return out
    sid = (gids % S).astype(np.int64)
    loc = (gids // S).astype(np.int64)
    idf_by_shard = [_shard_idf(sh, slots, realtime) for sh in index.shards]
    for t in sorted(spec.weights):
        if spec.negated.get(t):
            continue
        h = slots[t].hash
        for shard in index.shards:
            rows = np.flatnonzero(sid == shard.shard_id)
            if not len(rows):
                continue
            idf_t = np.float32(idf_by_shard[shard.shard_id][t])
            lex = shard.lexical
            d = lex.directory
            if d is None or lex.pl_docid is None:
                continue
            ti = d.lookup(h)
            if ti < 0:
                continue
            blocks = loc[rows] >> 16
            docids = (loc[rows] & 0xFFFF).astype(lex.pl_docid.dtype)
            for e in range(int(d.seg_start[ti]), int(d.seg_start[ti + 1])):
                bl = int(d.seg_block[e])
                a = int(d.seg_offset[e])
                ln = int(d.seg_len[e])
                if ln <= 0:
                    continue
                m = np.flatnonzero(blocks == bl)
                if not len(m):
                    continue
                pl = lex.pl_docid[a: a + ln]
                pos = np.searchsorted(pl, docids[m])
                pos = np.clip(pos, 0, ln - 1)
                hit = pl[pos] == docids[m]
                out[rows[m[hit]]] += idf_t * \
                    lex.pl_impact[a: a + ln][pos[hit]].astype(np.float32)
    return out


def _finalize_lexical(index, requests, results, live, live_specs, slots,
                      merged_scores, merged_ids, counts, counts_exact,
                      with_counts, facet_specs=(), fc_total=None,
                      sorting=False, sort_desc=True,
                      tail_phrase_counts=None, phrase_escalate_ok=True,
                      canonical=None):
    # phrase verification + final assembly
    for bi, qi in enumerate(live):
        spec = live_specs[bi]
        scores, gids = merged_scores[bi], merged_ids[bi]
        if canonical is None or not canonical[bi]:
            # dedupe defensively (re-runs can concatenate duplicates)
            _, first = np.unique(gids, return_index=True)
            keepmask = np.zeros(len(gids), dtype=bool)
            keepmask[first] = True
            scores, gids = scores[keepmask], gids[keepmask]
            order = np.lexsort((gids, -scores))
            scores, gids = scores[order], gids[order]
        if spec.phrases:
            pd = None
            if with_counts:
                # exact committed phrase-match set (host posting
                # intersection + vectorized position join, phrase.py);
                # retrieved results check membership, tail docs verify
                # per doc
                pd = _phrase_exact_committed(index, slots, spec,
                                             requests[qi])
                if len(gids):
                    S_ = index.shard_count
                    sid = (gids % S_).astype(np.int64)
                    loc = (gids // S_).astype(np.int64)
                    committed = np.array(
                        [index.shards[x].committed_doc_count for x in sid])
                    is_tail = loc >= committed
                    keep = np.isin(gids, pd)
                    for row in np.flatnonzero(is_tail):
                        keep[row] = _phrase_ok(index, slots, spec,
                                               int(gids[row]))
                    scores, gids = scores[keep], gids[keep]
                counts[bi] = len(pd) + (
                    int(tail_phrase_counts[bi])
                    if tail_phrase_counts is not None else 0)
                counts_exact[bi] = True
            elif len(gids):
                # Topk-only: the device candidates already satisfy the
                # boolean/filter constraints — verify positional
                # adjacency per retrieved candidate, in score order,
                # stopping once the requested page is filled (instead of
                # walking the full posting intersection)
                want = requests[qi].offset + requests[qi].length
                kept: list[int] = []
                for row in range(len(gids)):
                    if _phrase_ok(index, slots, spec, int(gids[row])):
                        kept.append(row)
                        if len(kept) >= want:
                            break
                scores, gids = scores[kept], gids[kept]
            # candidate-cliff escalation (reference parity: phrase checks
            # run on EVERY intersected doc, add_result.rs:38-92, so a
            # phrase match can never silently drop off a page): when the
            # verified page is short, rebuild it from the exact committed
            # phrase set, scored from the host CSR; verified realtime
            # tail rows keep their oracle scores.
            want = requests[qi].offset + requests[qi].length
            if (phrase_escalate_ok
                    and len(gids) < want
                    and not sorting
                    and not any(slots[s].virtual for s in spec.slots)):
                if pd is None:
                    pd = _phrase_exact_committed(index, slots, spec,
                                                 requests[qi])
                S_ = index.shard_count
                if len(gids):
                    committed = np.array(
                        [index.shards[int(g % S_)].committed_doc_count
                         for g in gids])
                    is_tail = (gids // S_) >= committed
                    t_sc, t_g = scores[is_tail], gids[is_tail]
                else:
                    t_sc = np.zeros(0, np.float32)
                    t_g = np.zeros(0, np.int64)
                if len(pd) + len(t_g) > len(gids):
                    sc_pd = _score_gids(index, slots, spec, pd,
                                        requests[qi].realtime)
                    allsc = np.concatenate([sc_pd, t_sc])
                    allg = np.concatenate([pd, t_g])
                    order3 = np.lexsort((allg, -allsc))
                    scores, gids = (allsc[order3].astype(np.float32),
                                    allg[order3])
        rs = ResultSet()
        rs.query_terms = [slots[s].term for s in spec.weights
                          if not slots[s].virtual]
        rs.result_count_total = int(counts[bi]) if with_counts else 0
        rs.count_exact = bool(counts_exact[bi])
        page = slice(requests[qi].offset, requests[qi].offset + requests[qi].length)
        if sorting:
            # device rank = key (desc) or -key (asc); report the real key
            vals = scores if sort_desc else -scores
            # multi-key tie-breaking over the candidate window (reference
            # result_ordering_root min_heap.rs:56-545): sub-sort ties of the
            # primary key by the remaining sort fields using host columns
            sort_fields = requests[qi].result_sort
            if len(sort_fields) > 1 and len(gids):
                from . import facets as facets_mod

                rt2 = facets_mod.get_runtime(index)
                keys = [(-vals if sort_fields[0].order != "Ascending"
                         else vals)]
                for rs_f in sort_fields[1:]:
                    col = np.zeros(len(gids), np.float32)
                    for row, g in enumerate(gids):
                        v = rt2.raw_value(rs_f.field, int(g))
                        col[row] = 0.0 if v is None else float(v)
                    keys.append(-col if rs_f.order != "Ascending" else col)
                keys.append(gids)
                order2 = np.lexsort(tuple(reversed(keys)))
                vals, gids = vals[order2], gids[order2]
            rs.results = [
                ResultObject(doc_id=int(g), score=float(v))
                for v, g in zip(vals[page], gids[page])
            ]
        else:
            # .tolist() yields native Python scalars in one C pass —
            # per-element int()/float() numpy-scalar unwrap was ~30% of
            # the assembly cost at large batch
            rs.results = [
                ResultObject(doc_id=g, score=s)
                for s, g in zip(scores[page].tolist(), gids[page].tolist())
            ]
        rs.result_count = len(rs.results)
        if facet_specs and fc_total is not None:
            rs.facets = {}
            for fi, (qf, labels, nc) in enumerate(facet_specs):
                vec = fc_total[fi, bi, :nc].copy()
                if qf.ranges is not None and qf.ranges.range_type != \
                        "CountWithinRange":
                    # cumulative range counts (reference RangeType
                    # search.rs:220-228, cumulation search.rs:3660-3764)
                    if qf.ranges.range_type == "CountAboveRange":
                        vec = np.cumsum(vec[::-1])[::-1]
                    elif qf.ranges.range_type == "CountBelowRange":
                        vec = np.cumsum(vec)
                if isinstance(labels, tuple) and labels and \
                        labels[0] == "__SETS__":
                    # StringSet: expand set-ordinal histogram to value counts
                    set_members = labels[1]
                    vcounts: dict[str, int] = {}
                    for so in np.flatnonzero(vec):
                        if so < len(set_members):
                            for v in set_members[so]:
                                vcounts[v] = vcounts.get(v, 0) + int(vec[so])
                    pairs = sorted(
                        vcounts.items(), key=lambda kv: (-kv[1], str(kv[0]))
                    )[: qf.length]
                else:
                    nz = np.flatnonzero(vec)
                    pairs = sorted(
                        ((labels[c] if labels else int(c), int(vec[c]))
                         for c in nz),
                        key=lambda kv: (-kv[1], str(kv[0])),
                    )[: qf.length]
                rs.facets[qf.field] = pairs
        _attach_docs(index, requests[qi], rs)
        results[qi] = rs

    return [r or ResultSet() for r in results]


def _merge_tail(
    index: Index, shard: Shard, slots, specs, boosts,
    merged_scores, merged_ids, counts, with_counts,
    req0=None, facet_specs=(), fc_total=None, fcm=1,
    sorting=False, sort_desc=True, tail_phrase_counts=None,
) -> None:
    """Score the uncommitted level-0 tail with the numpy oracle and merge
    (including tail facet counting / filtering / sort keys)."""
    hashes = [
        (term_hash(sl.term), sl.tf_hash) if sl.tf_hash is not None
        else sl.hash
        for sl in slots
    ]
    postings, tail_dfs, n_tail = index.tail_postings(shard, hashes, boosts)
    if n_tail <= 0:
        return
    lex = shard.lexical
    d = lex.directory
    tail_deleted = np.zeros(n_tail, dtype=bool)
    base = shard.tail_start
    for sid in shard.deleted:
        if base <= sid < base + n_tail:
            tail_deleted[sid - base] = True

    # facet filter / codes / sort keys over the tail (host values)
    tail_vals = {}

    def _tail_col(field):
        sf = index.schema_map[field]
        if sf.facet_id in tail_vals:
            return tail_vals[sf.facet_id]
        vals = shard.level0.facet_values.get(sf.facet_id, [])
        start = shard.partial_on_disk
        vv = vals[start : start + n_tail]
        from .schema import FieldType as FT

        if sf.field_type == FT.Point:
            lat = np.array([v[0] if v else 0.0 for v in vv])
            lon = np.array([v[1] if v else 0.0 for v in vv])
            from . import geo as geo_mod

            col = geo_mod.encode_morton_2_d(lat, lon)
        else:
            col = np.array(
                [0 if v is None else v for v in vv], dtype=np.float64
            )
        tail_vals[sf.facet_id] = col
        return col

    if req0 is not None and req0.facet_filter:
        for f in req0.facet_filter:
            sf = index.schema_map[f.field]
            col = _tail_col(f.field)
            if f.values is not None:
                if sf.field_type.is_string_facet:
                    tab = getattr(index, "_facet_tables", {}).get(
                        sf.facet_id, {"": 0}
                    )
                    vals = [tab.get(str(v), -1) for v in f.values]
                else:
                    vals = [float(v) for v in f.values]
                tail_deleted |= ~np.isin(col, vals)
            elif f.range is not None:
                lo, hi = f.range
                tail_deleted |= ~((col >= lo) & (col <= hi))

    tail_key = None
    if sorting and req0 is not None and req0.result_sort:
        rs0 = req0.result_sort[0]
        sf = index.schema_map[rs0.field]
        col = _tail_col(rs0.field)
        from .schema import FieldType as FT

        if sf.field_type == FT.Point:
            from . import geo as geo_mod

            tail_key = geo_mod.point_distance(
                col, float(rs0.base[0]), float(rs0.base[1])
            ).astype(np.float32)
        else:
            tail_key = col.astype(np.float32)

    n_docs = lex.doc_count + n_tail
    for qi, spec in enumerate(specs):
        term_ps, dfs, reqs, negs = [], [], [], []
        for s in spec.slots:
            sl = slots[s]
            ti = d.lookup(sl.idf_hash if sl.idf_hash is not None else sl.hash)
            df_c = int(d.df[ti]) if ti >= 0 else 0
            term_ps.append(postings[s])
            dfs.append(df_c + tail_dfs[s])
            reqs.append(bool(spec.required.get(s)) and not spec.negated.get(s))
            negs.append(bool(spec.negated.get(s)))
        sc, matched = score_query(
            n_docs, n_tail, term_ps, dfs, reqs, negs, tail_deleted
        )
        if with_counts:
            if spec.phrases and tail_phrase_counts is not None:
                # exact: phrase-verify every AND-matched tail doc (the
                # tail is <= 64K docs; its phrase candidates are few)
                for li in np.flatnonzero(matched):
                    g = (int(li) + base) * index.shard_count + shard.shard_id
                    if _phrase_ok(index, slots, spec, g):
                        tail_phrase_counts[qi] += 1
            else:
                counts[qi] += int(matched.sum())
        if facet_specs and fc_total is not None:
            from .schema import FieldType as FT2

            for fi, (qf, labels, nc) in enumerate(facet_specs):
                sf = index.schema_map[qf.field]
                col = _tail_col(qf.field)
                if qf.ranges is not None:
                    if sf.field_type == FT2.Point:
                        from . import geo as geo_mod

                        col = geo_mod.point_distance(
                            col, float(qf.ranges.base[0]),
                            float(qf.ranges.base[1]),
                        )
                        if qf.ranges.unit == "Miles":
                            col = col * 0.621371192
                    bounds = np.array([float(r[1]) for r in qf.ranges.ranges])
                    codes = np.searchsorted(bounds, col, side="right")
                else:
                    codes = col.astype(np.int64)
                codes = np.clip(codes, 0, fcm - 1)
                np.add.at(fc_total[fi, qi], codes[matched], 1)
        if sorting and tail_key is not None:
            rank = np.where(
                matched, tail_key if sort_desc else -tail_key,
                np.float32(-np.inf),
            ).astype(np.float32)
            s2, ids = topk_from_scores(rank, min(n_tail, 1024))
        else:
            s2, ids = topk_from_scores(sc, min(n_tail, 1024))
        gids = (ids + base) * index.shard_count + shard.shard_id
        merged_scores[qi] = np.concatenate([merged_scores[qi], s2])
        merged_ids[qi] = np.concatenate([merged_ids[qi], gids])


def _phrase_ok(index: Index, slots, spec: _QuerySpec, global_id: int) -> bool:
    shard = index.shards[global_id % index.shard_count]
    local = global_id // index.shard_count
    for ph in spec.phrases:
        pos_by_term = []
        offsets = []
        for s, off in ph:
            h = slots[s].hash
            if local < shard.committed_doc_count:
                p = shard.lexical.get_positions(h, local)
            else:
                p = index.tail_positions(shard, h, local - shard.tail_start)
            if p is None:
                return False
            pos_by_term.append(p)
            offsets.append(off)
        if not verify_phrase(pos_by_term, offsets):
            return False
    return True


def _attach_docs(index: Index, req: SearchRequest, rs: ResultSet) -> None:
    if not req.fields and not req.highlights:
        return
    from .highlighter import highlight_doc

    for r in rs.results:
        doc = index.get_document(r.doc_id)
        if doc is None:
            continue
        if req.fields:
            doc = {k: v for k, v in doc.items() if k in req.fields}
        if req.highlights:
            doc = highlight_doc(index, req, doc)
        r.doc = doc


# bind as Index methods
Index.search = lambda self, request: search(self, request)
Index.search_batch = lambda self, requests: search_batch(self, requests)
