"""Bucket-WAND engine (ops/wand.py): end-to-end parity vs the dense kernels.

The WAND path is an upper-bound scan + exact host rescore.  Scores may
differ from the dense kernels by ~1 f32 ulp (XLA contracts mul+add to fma;
numpy rounds twice), so pages are compared canonically: counts and the
rounded score sequence must match exactly, and doc-id membership must match
for every score group except the page-boundary tie group (membership inside
a tie class split by 1-ulp noise is arithmetic-path-dependent — the
reference has the same property across its SIMD/scalar paths).
"""

import importlib

import numpy as np
import pytest

import seekstorm_tpu as st
from seekstorm_tpu.schema import BLOCK_SIZE

sm = importlib.import_module("seekstorm_tpu.search")
wand_mod = importlib.import_module("seekstorm_tpu.ops.wand")


@pytest.fixture(scope="module")
def wand_index(tmp_path_factory):
    rng = np.random.default_rng(7)
    vocab = [f"w{i:03d}" for i in range(250)]
    docs = [{"title": " ".join(rng.choice(vocab, 3)),
             "body": " ".join(rng.choice(vocab, 18))}
            for _ in range(BLOCK_SIZE + 6_000)]
    tmp = tmp_path_factory.mktemp("wand")
    schema = [
        st.SchemaField("title", st.FieldType.Text, indexed=True, boost=10.0),
        st.SchemaField("body", st.FieldType.Text, indexed=True),
    ]
    idx = st.create_index(tmp / "ix", schema, shard_count=2)
    idx.index_documents(docs)
    idx.commit()
    return idx


class _Page:
    """Order-robust page summary with ULP-tolerant equality.

    Scores may differ by 1-3 f32 ulp between paths (XLA contracts mul+add
    to fma; the host rescore rounds twice), so fixed-decimal rounding can
    flip on a boundary.  Equality compares positional scores with a
    relative tolerance and doc membership per tolerance-cluster of the
    score sequence, excluding the page-boundary cluster (membership
    inside a tie class split by ulp noise is arithmetic-path-dependent —
    the reference has the same property across its SIMD/scalar paths)."""

    RTOL = 3e-5

    def __init__(self, rs):
        self.scores = [float(r.score) for r in rs.results]
        self.ids = [r.doc_id for r in rs.results]
        self.count = rs.result_count_total

    def _clusters(self):
        out = []
        for s, d in zip(self.scores, self.ids):
            if out and abs(s - out[-1][0]) <= self.RTOL * max(
                    abs(s), abs(out[-1][0]), 1e-9):
                out[-1][1].add(d)
            else:
                out.append((s, {d}))
        return out

    def __eq__(self, other):
        if self.count != other.count or len(self.scores) != len(other.scores):
            return False
        for a, b in zip(self.scores, other.scores):
            if abs(a - b) > self.RTOL * max(abs(a), abs(b), 1e-9):
                return False
        ca, cb = self._clusters(), other._clusters()
        if len(ca) != len(cb):
            return False
        for (sa, da), (sb, db) in zip(ca[:-1], cb[:-1]):
            if da != db:
                return False
        return True

    def __repr__(self):
        return (f"_Page(scores={[round(s, 3) for s in self.scores]}, "
                f"ids={self.ids}, count={self.count})")


def _canon(rs):
    return _Page(rs)


def _run(idx, queries, qtype, result_type=None, realtime=False):
    result_type = result_type or st.ResultType.Topk
    reqs = [st.SearchRequest(query=q, length=10,
                             result_type=result_type,
                             realtime=realtime, query_type_default=qtype)
            for q in queries]
    return [_canon(rs) for rs in st.search_batch(idx, reqs)]


def _queries(n=24, seed=5):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i:03d}" for i in range(250)]
    qs = [f"{rng.choice(vocab)} {rng.choice(vocab)}" for _ in range(n)]
    qs += [f"{rng.choice(vocab)}",                      # single term
           f"+{rng.choice(vocab)} {rng.choice(vocab)}",  # required
           f"-{rng.choice(vocab)} w001 w002",            # negated
           "w004 w005 w006",                             # 3 terms (class UB)
           f"+w007 {rng.choice(vocab)} w008",            # 3 terms + required
           "w000 w001 w002 w003"]                        # 4 terms
    return qs


@pytest.mark.parametrize("qtype", [st.QueryType.Union,
                                   st.QueryType.Intersection])
@pytest.mark.parametrize("rtype", [st.ResultType.Topk,
                                   st.ResultType.TopkCount])
def test_wand_matches_dense(wand_index, qtype, rtype, monkeypatch):
    idx = wand_index
    queries = _queries()
    monkeypatch.setenv("SEEKSTORM_TPU_NO_WAND", "1")
    base = _run(idx, queries, qtype, rtype)
    monkeypatch.delenv("SEEKSTORM_TPU_NO_WAND")
    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    wand = _run(idx, queries, qtype, rtype)
    assert base == wand


def test_wand_with_deletes(wand_index, monkeypatch):
    idx = wand_index
    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    pre = st.search_batch(idx, [st.SearchRequest(
        query="w001 w002", length=10)])[0]
    victims = [r.doc_id for r in pre.results[:3]]
    victims += list(range(0, 3000, 617))
    idx.delete_documents(victims)
    queries = _queries(12, seed=9)
    monkeypatch.setenv("SEEKSTORM_TPU_NO_WAND", "1")
    base = _run(idx, queries, st.QueryType.Union, st.ResultType.TopkCount)
    monkeypatch.delenv("SEEKSTORM_TPU_NO_WAND")
    wand = _run(idx, queries, st.QueryType.Union, st.ResultType.TopkCount)
    assert base == wand
    post = st.search_batch(idx, [st.SearchRequest(
        query="w001 w002", length=10)])[0]
    for r in post.results:
        assert r.doc_id not in victims


def test_rescore_native_parity(wand_index, monkeypatch):
    """st_rescore (C++) and the numpy rescore must yield identical pages —
    bit-identical scores (the WAND termination test depends on it), same
    doc membership, same counts.  Runs after the delete test in module
    order, so the deleted-doc filter path is exercised too."""
    from seekstorm_tpu import native as native_mod
    if native_mod.load() is None:
        pytest.skip("native library not built")
    idx = wand_index
    queries = _queries(24, seed=11)
    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    monkeypatch.setenv("SEEKSTORM_TPU_NO_NATIVE_RESCORE", "1")
    base = _run(idx, queries, st.QueryType.Union, st.ResultType.TopkCount)
    basei = _run(idx, queries, st.QueryType.Intersection,
                 st.ResultType.TopkCount)
    monkeypatch.delenv("SEEKSTORM_TPU_NO_NATIVE_RESCORE")
    nat = _run(idx, queries, st.QueryType.Union, st.ResultType.TopkCount)
    nati = _run(idx, queries, st.QueryType.Intersection,
                st.ResultType.TopkCount)
    assert base == nat
    assert basei == nati


@pytest.fixture(scope="module")
def wand_facet_index(tmp_path_factory):
    rng = np.random.default_rng(17)
    vocab = [f"w{i:03d}" for i in range(250)]
    brands = [f"brand{j}" for j in range(12)]
    docs = [{"title": " ".join(rng.choice(vocab, 3)),
             "body": " ".join(rng.choice(vocab, 18)),
             "brand": str(rng.choice(brands)),
             "price": int(rng.integers(0, 500))}
            for _ in range(BLOCK_SIZE + 6_000)]
    tmp = tmp_path_factory.mktemp("wandf")
    schema = [
        st.SchemaField("title", st.FieldType.Text, indexed=True, boost=10.0),
        st.SchemaField("body", st.FieldType.Text, indexed=True),
        st.SchemaField("brand", st.FieldType.String16, facet=True),
        st.SchemaField("price", st.FieldType.U16, facet=True),
    ]
    idx = st.create_index(tmp / "ix", schema, shard_count=2)
    idx.index_documents(docs)
    idx.commit()
    return idx


def _run_facet(idx, queries, filtered: bool):
    ranges = st.Ranges(field="price", ranges=[
        ("cheap", 0), ("mid", 100), ("lux", 300)])
    reqs = []
    for q in queries:
        kw = dict(query=q, length=10,
                  result_type=st.ResultType.TopkCount,
                  query_facets=[st.QueryFacet(field="brand"),
                                st.QueryFacet(field="price", ranges=ranges)])
        if filtered:
            kw["facet_filter"] = [st.FacetFilter(
                field="brand", values=[f"brand{j}" for j in range(6)])]
        reqs.append(st.SearchRequest(**kw))
    out = []
    for rs in st.search_batch(idx, reqs):
        canon = _canon(rs)
        fac = tuple(sorted(
            (field, tuple(sorted(pairs)))
            for field, pairs in (rs.facets or {}).items()))
        out.append((canon, fac))
    return out


@pytest.fixture(scope="module")
def wand_geo_index(tmp_path_factory):
    rng = np.random.default_rng(23)
    vocab = [f"w{i:03d}" for i in range(250)]
    docs = [{"title": " ".join(rng.choice(vocab, 3)),
             "body": " ".join(rng.choice(vocab, 18)),
             "loc": [float(rng.uniform(35, 40)),
                     float(rng.uniform(-125, -120))],
             "price": int(rng.integers(0, 500))}
            for _ in range(BLOCK_SIZE + 6_000)]
    tmp = tmp_path_factory.mktemp("wandg")
    schema = [
        st.SchemaField("title", st.FieldType.Text, indexed=True, boost=10.0),
        st.SchemaField("body", st.FieldType.Text, indexed=True),
        st.SchemaField("loc", st.FieldType.Point, facet=True),
        st.SchemaField("price", st.FieldType.U16, facet=True),
    ]
    idx = st.create_index(tmp / "ix", schema, shard_count=2)
    idx.index_documents(docs)
    idx.commit()
    return idx


@pytest.mark.parametrize("field,order", [("loc", "Ascending"),
                                         ("price", "Descending")])
def test_wand_sorted_matches_dense(wand_geo_index, field, order,
                                   monkeypatch):
    """Sort-ordered pages (geo distance asc / numeric desc) through the
    WAND rank-by-key mode must match the dense sort kernel.  Rank mode is
    opt-in (SEEKSTORM_TPU_WAND_SORT=1): on sort keys uncorrelated with
    doc order its bucket bounds almost never terminate, so the dense
    kernel is the default for sorted batches."""
    idx = wand_geo_index
    base_pt = [37.7, -122.4] if field == "loc" else None
    queries = _queries(16, seed=33)
    reqs = [st.SearchRequest(
        query=q, length=10, result_type=st.ResultType.Topk,
        result_sort=[st.ResultSort(field=field, order=order,
                                   base=base_pt)])
        for q in queries]
    monkeypatch.setenv("SEEKSTORM_TPU_NO_WAND", "1")
    base = [_canon(rs) for rs in st.search_batch(idx, reqs)]
    monkeypatch.delenv("SEEKSTORM_TPU_NO_WAND")
    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    monkeypatch.setenv("SEEKSTORM_TPU_WAND_SORT", "1")
    wand = [_canon(rs) for rs in st.search_batch(idx, reqs)]
    assert base == wand


@pytest.mark.parametrize("filtered", [False, True])
def test_wand_faceted_matches_dense(wand_facet_index, filtered, monkeypatch):
    """Faceted (and facet-filtered) TopkCount through the WAND path must
    match the dense kernels: pages, exact counts, and exact per-value
    facet histograms (device one-hot matmul vs dense scatter-add)."""
    idx = wand_facet_index
    queries = _queries(16, seed=21)
    monkeypatch.setenv("SEEKSTORM_TPU_NO_WAND", "1")
    base = _run_facet(idx, queries, filtered)
    monkeypatch.delenv("SEEKSTORM_TPU_NO_WAND")
    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    wand = _run_facet(idx, queries, filtered)
    assert base == wand


@pytest.mark.parametrize("rtype", [st.ResultType.Topk,
                                   st.ResultType.TopkCount])
def test_wand_phrase_matches_dense(wand_index, rtype, monkeypatch):
    """Phrase queries ride the WAND path (AND-candidates by BM25 UB scan)
    with downstream positional verification — pages and exact phrase
    counts must match the dense path."""
    idx = wand_index
    rng = np.random.default_rng(41)
    vocab = [f"w{i:03d}" for i in range(250)]
    queries = [f'"{rng.choice(vocab)} {rng.choice(vocab)}"'
               for _ in range(12)]
    queries += ['"w001 w002"', '"w010 w010"']
    monkeypatch.setenv("SEEKSTORM_TPU_NO_WAND", "1")
    base = _run(idx, queries, st.QueryType.Union, rtype)
    monkeypatch.delenv("SEEKSTORM_TPU_NO_WAND")
    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    wand = _run(idx, queries, st.QueryType.Union, rtype)
    assert base == wand


def test_exact_fallback_matches_dense(wand_index, monkeypatch):
    """The host exact-fallback path (saturated-UB queries) must match the
    dense kernels on every eligible query shape."""
    idx = wand_index
    queries = _queries(16, seed=3)
    monkeypatch.setenv("SEEKSTORM_TPU_NO_WAND", "1")
    base = _run(idx, queries, st.QueryType.Union, st.ResultType.TopkCount)
    basei = _run(idx, queries, st.QueryType.Intersection,
                 st.ResultType.TopkCount)
    monkeypatch.delenv("SEEKSTORM_TPU_NO_WAND")
    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    monkeypatch.setenv("SEEKSTORM_TPU_WAND_FORCE_FALLBACK", "1")
    fb = _run(idx, queries, st.QueryType.Union, st.ResultType.TopkCount)
    fbi = _run(idx, queries, st.QueryType.Intersection,
               st.ResultType.TopkCount)
    assert base == fb
    assert basei == fbi


def test_wand_empty_shard(tmp_path, monkeypatch):
    """A shard with no committed level must not crash the WAND path
    (_shard_idf is called for EVERY shard; empty ones have no term
    directory)."""
    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    schema = [st.SchemaField("t", st.FieldType.Text, indexed=True)]
    idx = st.create_index(tmp_path / "ix", schema, shard_count=4)
    # hash routing: a single doc lands in exactly one shard
    idx.index_document({"t": "solitary document text"})
    idx.commit()
    assert sum(1 for sh in idx.shards if sh.committed_doc_count == 0) >= 1
    rs = idx.search(st.SearchRequest(query="solitary text", length=10,
                                     result_type=st.ResultType.TopkCount))
    assert rs.result_count_total == 1


def test_wand_count_only(wand_index, monkeypatch):
    """ResultType.Count rides WAND phase-1 popcount alone (no rescore
    ladder) and must match the dense path's exact counts."""
    idx = wand_index
    queries = _queries(12, seed=13)
    reqs = [st.SearchRequest(query=q, length=0,
                             result_type=st.ResultType.Count)
            for q in queries]
    monkeypatch.setenv("SEEKSTORM_TPU_NO_WAND", "1")
    base = [(rs.result_count_total, len(rs.results))
            for rs in st.search_batch(idx, reqs)]
    monkeypatch.delenv("SEEKSTORM_TPU_NO_WAND")
    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    wand = [(rs.result_count_total, len(rs.results))
            for rs in st.search_batch(idx, reqs)]
    assert base == wand


def test_wand_adaptive_gate(wand_index, monkeypatch):
    """Fallback-heavy serving (flat impact maxima) flips the auto router
    back to the dense kernels; forced mode ignores the gate."""
    import jax as _jax

    idx = wand_index
    monkeypatch.delenv("SEEKSTORM_TPU_WAND", raising=False)
    monkeypatch.delenv("SEEKSTORM_TPU_NO_WAND", raising=False)
    monkeypatch.setattr(wand_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(wand_mod, "WAND_MIN_BLOCKS", 1)
    idx._wand_stats = [10, 1000]          # 1% fallbacks: stay on
    assert wand_mod.wand_auto(idx)
    idx._wand_stats = [600, 1000]         # 60% fallbacks: dense wins
    assert not wand_mod.wand_auto(idx)
    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    assert wand_mod.wand_auto(idx)        # forced overrides
    del idx._wand_stats


def test_wand_faceted_realtime_tail(wand_facet_index, monkeypatch):
    """Uncommitted tail docs must contribute to counts and facet
    histograms identically on the WAND and dense paths (the host tail
    merge is path-agnostic)."""
    idx = wand_facet_index
    rng = np.random.default_rng(3)
    vocab = [f"w{i:03d}" for i in range(250)]
    for _ in range(40):
        idx.index_document({
            "title": " ".join(rng.choice(vocab, 3)),
            "body": " ".join(rng.choice(vocab, 18)),
            "brand": "brandtail", "price": 123})
    queries = _queries(8, seed=29)
    ranges = st.Ranges(field="price", ranges=[
        ("cheap", 0), ("mid", 100), ("lux", 300)])
    reqs = [st.SearchRequest(
        query=q, length=10, realtime=True,
        result_type=st.ResultType.TopkCount,
        query_facets=[st.QueryFacet(field="brand"),
                      st.QueryFacet(field="price", ranges=ranges)])
        for q in queries]

    def run():
        out = []
        for rs in st.search_batch(idx, reqs):
            fac = tuple(sorted(
                (field, tuple(sorted(pairs)))
                for field, pairs in (rs.facets or {}).items()))
            out.append((_canon(rs), fac))
        return out

    monkeypatch.setenv("SEEKSTORM_TPU_NO_WAND", "1")
    base = run()
    monkeypatch.delenv("SEEKSTORM_TPU_NO_WAND")
    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    wand = run()
    assert base == wand


def test_device_rescore_parity_and_engagement(wand_index, monkeypatch):
    """The phase-3 device rescore page must match the host rescore page
    for every query, and it must actually serve (not silently fall back
    to the host ladder).  The wand_index has 2 shards on 1 device, so the
    multi-shard tie-cut guard path is exercised too."""
    from seekstorm_tpu.metrics import METRICS

    idx = wand_index
    queries = _queries(24, seed=23)
    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    monkeypatch.setenv("SEEKSTORM_TPU_NO_DEVICE_RESCORE", "1")
    base = _run(idx, queries, st.QueryType.Union, st.ResultType.TopkCount)
    basei = _run(idx, queries, st.QueryType.Intersection,
                 st.ResultType.TopkCount)
    monkeypatch.delenv("SEEKSTORM_TPU_NO_DEVICE_RESCORE")
    before = METRICS.snapshot().get("wand_dev_pages_total", 0)
    dev = _run(idx, queries, st.QueryType.Union, st.ResultType.TopkCount)
    devi = _run(idx, queries, st.QueryType.Intersection,
                st.ResultType.TopkCount)
    served = METRICS.snapshot().get("wand_dev_pages_total", 0) - before
    assert base == dev
    assert basei == devi
    assert served > 0, "device rescore never engaged"


def test_defer_dense_matches_dense(wand_index, monkeypatch):
    """Deferred stragglers (handled=False) must come back exact through
    the dense rest path — including the compacted slot table the rest
    planner now uses.  SEEKSTORM_TPU_WAND_DEFER_DENSE=1 forces every
    pending query to defer regardless of batch size."""
    idx = wand_index
    queries = _queries(20, seed=11)
    monkeypatch.setenv("SEEKSTORM_TPU_NO_WAND", "1")
    base = _run(idx, queries, st.QueryType.Union, st.ResultType.TopkCount)
    basei = _run(idx, queries, st.QueryType.Intersection,
                 st.ResultType.TopkCount)
    monkeypatch.delenv("SEEKSTORM_TPU_NO_WAND")
    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    monkeypatch.setenv("SEEKSTORM_TPU_WAND_DEFER_DENSE", "1")
    # route every query through the pending path so they all defer
    monkeypatch.setattr(wand_mod, "_apply_slim",
                        lambda state, buf, specs, S, osc, ogid, cnts:
                        list(range(len(specs))))
    df = _run(idx, queries, st.QueryType.Union, st.ResultType.TopkCount)
    dfi = _run(idx, queries, st.QueryType.Intersection,
               st.ResultType.TopkCount)
    assert base == df
    assert basei == dfi


def test_defer_dense_compacted_slots(wand_index, monkeypatch):
    """Partial deferral (a few stragglers in a larger batch) exercises
    the compacted rest-path slot table: the deferred rows' pages must
    match the dense baseline while the rest terminate on the WAND path."""
    idx = wand_index
    queries = _queries(20, seed=13)
    monkeypatch.setenv("SEEKSTORM_TPU_NO_WAND", "1")
    base = _run(idx, queries, st.QueryType.Union, st.ResultType.TopkCount)
    monkeypatch.delenv("SEEKSTORM_TPU_NO_WAND")
    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    monkeypatch.setenv("SEEKSTORM_TPU_WAND_DEFER_DENSE", "1")
    orig = wand_mod._apply_slim

    def few_pending(state, buf, specs, S, osc, ogid, cnts):
        done = orig(state, buf, specs, S, osc, ogid, cnts)
        return sorted(set(done) | {0, 1})   # force rows 0-1 to defer

    monkeypatch.setattr(wand_mod, "_apply_slim", few_pending)
    df = _run(idx, queries, st.QueryType.Union, st.ResultType.TopkCount)
    assert base == df
