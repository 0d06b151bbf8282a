"""Facets: counting (string/numeric/ranges), filters, result sorting, geo,
index-level aggregations — verified against brute-force recomputation,
including the realtime tail."""

import numpy as np

import seekstorm_tpu as st
from seekstorm_tpu import facets as facets_mod


def schema():
    return [
        st.SchemaField("text", st.FieldType.Text, stored=True, indexed=True),
        st.SchemaField("brand", st.FieldType.String16, stored=True, facet=True),
        st.SchemaField("price", st.FieldType.U16, stored=True, facet=True),
        st.SchemaField("loc", st.FieldType.Point, stored=True, facet=True),
    ]


BRANDS = ["acme", "globex", "initech", "umbrella"]


def make_docs(rng, n):
    docs = []
    for i in range(n):
        docs.append(
            {
                "text": f"item common t{i % 5}",
                "brand": BRANDS[int(rng.integers(0, len(BRANDS)))],
                "price": int(rng.integers(1, 500)),
                "loc": [float(rng.uniform(40, 60)), float(rng.uniform(-10, 10))],
            }
        )
    return docs


def build(tmp, rng, n=200, shards=2, committed=True):
    idx = st.create_index(tmp, schema(), shard_count=shards)
    docs = make_docs(rng, n)
    idx.index_documents(docs)
    if committed:
        idx.commit()
    return idx, docs


def test_string_facet_counts(tmp_index_dir, rng):
    idx, docs = build(tmp_index_dir, rng)
    rs = idx.search(st.SearchRequest(
        query="common", query_facets=[st.QueryFacet(field="brand")]))
    assert rs.result_count_total == len(docs)
    expected = {}
    for d in docs:
        expected[d["brand"]] = expected.get(d["brand"], 0) + 1
    got = dict(rs.facets["brand"])
    assert got == expected


def test_facet_counts_with_tail(tmp_index_dir, rng):
    idx, docs = build(tmp_index_dir, rng, n=120)
    extra = make_docs(rng, 30)
    idx.index_documents(extra)  # uncommitted tail
    rs = idx.search(st.SearchRequest(
        query="common", query_facets=[st.QueryFacet(field="brand")]))
    expected = {}
    for d in docs + extra:
        expected[d["brand"]] = expected.get(d["brand"], 0) + 1
    assert dict(rs.facets["brand"]) == expected
    assert rs.result_count_total == 150


def test_range_facet_counts(tmp_index_dir, rng):
    idx, docs = build(tmp_index_dir, rng)
    ranges = st.Ranges(field="price", ranges=[("cheap", 0), ("mid", 100), ("lux", 300)])
    rs = idx.search(st.SearchRequest(
        query="common",
        query_facets=[st.QueryFacet(field="price", ranges=ranges)]))
    got = dict(rs.facets["price"])
    exp = {"cheap": 0, "mid": 0, "lux": 0}
    for d in docs:
        p = d["price"]
        exp["cheap" if p < 100 else "mid" if p < 300 else "lux"] += 1
    exp = {k: v for k, v in exp.items() if v}
    assert got == exp


def test_facet_filter_values_and_range(tmp_index_dir, rng):
    idx, docs = build(tmp_index_dir, rng)
    rs = idx.search(st.SearchRequest(
        query="common",
        facet_filter=[st.FacetFilter(field="brand", values=["acme"])]))
    exp = sum(1 for d in docs if d["brand"] == "acme")
    assert rs.result_count_total == exp

    rs = idx.search(st.SearchRequest(
        query="common",
        facet_filter=[st.FacetFilter(field="price", range=(100, 200))]))
    exp = sum(1 for d in docs if 100 <= d["price"] <= 200)
    assert rs.result_count_total == exp

    # combined filters AND together
    rs = idx.search(st.SearchRequest(
        query="common",
        facet_filter=[
            st.FacetFilter(field="brand", values=["acme", "globex"]),
            st.FacetFilter(field="price", range=(0, 250)),
        ]))
    exp = sum(1 for d in docs
              if d["brand"] in ("acme", "globex") and d["price"] <= 250)
    assert rs.result_count_total == exp


def test_facet_filter_with_tail(tmp_index_dir, rng):
    idx, docs = build(tmp_index_dir, rng, n=80)
    extra = make_docs(rng, 20)
    idx.index_documents(extra)
    rs = idx.search(st.SearchRequest(
        query="common",
        facet_filter=[st.FacetFilter(field="brand", values=["umbrella"])]))
    exp = sum(1 for d in docs + extra if d["brand"] == "umbrella")
    assert rs.result_count_total == exp


def test_result_sort_numeric(tmp_index_dir, rng):
    idx, docs = build(tmp_index_dir, rng, n=60, shards=2)
    rs = idx.search(st.SearchRequest(
        query="common", length=60,
        result_sort=[st.ResultSort(field="price", order="Descending")]))
    prices = [r.score for r in rs.results]
    assert prices == sorted(prices, reverse=True)
    assert len(rs.results) == 60
    top_doc = rs.results[0].doc_id
    assert docs[top_doc]["price"] == max(d["price"] for d in docs)

    rs = idx.search(st.SearchRequest(
        query="common", length=10,
        result_sort=[st.ResultSort(field="price", order="Ascending")]))
    prices = [r.score for r in rs.results]
    assert prices == sorted(prices)
    assert docs[rs.results[0].doc_id]["price"] == min(d["price"] for d in docs)


def test_result_sort_with_tail(tmp_index_dir, rng):
    idx, docs = build(tmp_index_dir, rng, n=40)
    extra = [{"text": "common", "brand": "acme", "price": 9999, "loc": [50, 0]}]
    idx.index_documents(extra)  # tail doc with max price
    rs = idx.search(st.SearchRequest(
        query="common", length=5,
        result_sort=[st.ResultSort(field="price", order="Descending")]))
    assert rs.results[0].doc_id == 40
    assert rs.results[0].score == 9999


def test_geo_sort(tmp_index_dir, rng):
    idx, docs = build(tmp_index_dir, rng, n=50)
    base = [50.0, 0.0]
    rs = idx.search(st.SearchRequest(
        query="common", length=50,
        result_sort=[st.ResultSort(field="loc", order="Ascending", base=base)]))
    dists = [r.score for r in rs.results]
    assert dists == sorted(dists)
    # nearest doc matches brute force (within morton quantization noise)
    from seekstorm_tpu.geo import euclidian_distance

    bf = [euclidian_distance(d["loc"][0], d["loc"][1], *base) for d in docs]
    assert abs(dists[0] - min(bf)) < 0.1


def test_index_level_facets(tmp_index_dir, rng):
    idx, docs = build(tmp_index_dir, rng, n=100)
    idx.index_documents(make_docs(rng, 10))  # tail counts too
    top = facets_mod.index_string_facets(idx, "brand")
    total = sum(c for _, c in top)
    assert total == 110
    lo, hi = facets_mod.index_facets_minmax(idx, "price")
    committed_prices = [d["price"] for d in docs]
    assert lo <= min(committed_prices) and hi >= max(committed_prices)


def test_facets_after_delete(tmp_index_dir, rng):
    idx, docs = build(tmp_index_dir, rng, n=60)
    victim = 0
    idx.delete_document(victim)
    rs = idx.search(st.SearchRequest(
        query="common", query_facets=[st.QueryFacet(field="brand")]))
    expected = {}
    for g, d in enumerate(docs):
        if g != victim:
            expected[d["brand"]] = expected.get(d["brand"], 0) + 1
    assert dict(rs.facets["brand"]) == expected


def test_stringset_facet(tmp_index_dir, rng):
    schema2 = [
        st.SchemaField("text", st.FieldType.Text, stored=True, indexed=True),
        st.SchemaField("tags", st.FieldType.StringSet16, stored=True, facet=True),
    ]
    idx = st.create_index(tmp_index_dir, schema2, shard_count=2)
    docs = [
        {"text": "common a", "tags": ["red", "blue"]},
        {"text": "common b", "tags": ["red"]},
        {"text": "common c", "tags": ["green", "blue"]},
        {"text": "common d", "tags": ["green"]},
        {"text": "common e", "tags": ["red", "green", "blue"]},
    ]
    idx.index_documents(docs)
    idx.commit()
    rs = idx.search(st.SearchRequest(
        query="common", query_facets=[st.QueryFacet(field="tags")]))
    got = dict(rs.facets["tags"])
    assert got == {"red": 3, "blue": 3, "green": 3}
    # set-membership filter
    rs = idx.search(st.SearchRequest(
        query="common",
        facet_filter=[st.FacetFilter(field="tags", values=["blue"])]))
    assert rs.result_count_total == 3
    assert {r.doc_id for r in rs.results} == {0, 2, 4}
    # tail doc counts too
    idx.index_documents([{"text": "common f", "tags": ["blue"]}])
    rs = idx.search(st.SearchRequest(
        query="common", query_facets=[st.QueryFacet(field="tags")]))
    assert dict(rs.facets["tags"])["blue"] == 4


def test_range_count_modes(tmp_index_dir, rng):
    idx, docs = build(tmp_index_dir, rng, n=100)
    within = st.Ranges(field="price",
                       ranges=[("low", 0), ("mid", 100), ("high", 300)])
    above = st.Ranges(field="price",
                      ranges=[("low", 0), ("mid", 100), ("high", 300)],
                      range_type="CountAboveRange")
    below = st.Ranges(field="price",
                      ranges=[("low", 0), ("mid", 100), ("high", 300)],
                      range_type="CountBelowRange")
    rw = idx.search(st.SearchRequest(
        query="common", query_facets=[st.QueryFacet(field="price", ranges=within)]))
    ra = idx.search(st.SearchRequest(
        query="common", query_facets=[st.QueryFacet(field="price", ranges=above)]))
    rb = idx.search(st.SearchRequest(
        query="common", query_facets=[st.QueryFacet(field="price", ranges=below)]))
    w = dict(rw.facets["price"])
    a = dict(ra.facets["price"])
    b = dict(rb.facets["price"])
    assert a["low"] == w.get("low", 0) + w.get("mid", 0) + w.get("high", 0)
    assert a["high"] == w.get("high", 0)
    assert b["high"] == w.get("low", 0) + w.get("mid", 0) + w.get("high", 0)
    assert b["low"] == w.get("low", 0)


def test_geo_distance_ranges(tmp_index_dir, rng):
    idx, docs = build(tmp_index_dir, rng, n=80)
    base = [50.0, 0.0]
    ranges = st.Ranges(field="loc", base=base,
                       ranges=[("near", 0), ("far", 300)])
    rs = idx.search(st.SearchRequest(
        query="common",
        query_facets=[st.QueryFacet(field="loc", ranges=ranges)]))
    got = dict(rs.facets["loc"])
    from seekstorm_tpu.geo import euclidian_distance

    exp = {"near": 0, "far": 0}
    for d in docs:
        dist = euclidian_distance(d["loc"][0], d["loc"][1], *base)
        exp["near" if dist < 300 else "far"] += 1
    exp = {k: v for k, v in exp.items() if v}
    assert got == exp


def test_empty_query_browse_with_facets(tmp_index_dir, rng):
    idx, docs = build(tmp_index_dir, rng, n=60)
    extra = make_docs(rng, 10)
    idx.index_documents(extra)  # tail
    rs = idx.search(st.SearchRequest(
        query="", query_facets=[st.QueryFacet(field="brand")],
        result_sort=[st.ResultSort(field="price", order="Descending")],
        length=70))
    assert rs.result_count_total == 70
    prices = [r.score for r in rs.results[:60]]  # committed docs have keys
    # committed portion sorted desc (tail keys default 0 sort last)
    assert all(prices[i] >= prices[i+1] for i in range(len(prices)-1))
    expected = {}
    for d in docs + extra:
        expected[d["brand"]] = expected.get(d["brand"], 0) + 1
    assert dict(rs.facets["brand"]) == expected

    # filtered browse (committed + tail evaluated)
    rs = idx.search(st.SearchRequest(
        query="",
        facet_filter=[st.FacetFilter(field="price", range=(0, 250))],
        length=100))
    exp = sum(1 for d in docs + extra if d["price"] <= 250)
    assert rs.result_count_total == exp


def test_multikey_sort(tmp_index_dir, rng):
    idx = st.create_index(tmp_index_dir, schema(), shard_count=1)
    docs = [
        {"text": "common", "brand": "b", "price": 100, "loc": [50, 0]},
        {"text": "common", "brand": "a", "price": 100, "loc": [50, 0]},
        {"text": "common", "brand": "c", "price": 200, "loc": [50, 0]},
        {"text": "common", "brand": "d", "price": 100, "loc": [50, 0]},
    ]
    idx.index_documents(docs)
    idx.commit()
    rs = idx.search(st.SearchRequest(
        query="common", length=4,
        result_sort=[st.ResultSort(field="price", order="Descending"),
                     st.ResultSort(field="brand", order="Ascending")]))
    ids = [r.doc_id for r in rs.results]
    assert ids[0] == 2          # price 200 first
    # ties at price 100 sub-sorted by brand ordinal ascending (insert order:
    # b=1, a=2, d=3 -> brand asc by ordinal = b, a, d... ordinals assigned
    # in insertion order, so expect docs [0, 1, 3]
    assert set(ids[1:]) == {0, 1, 3}


def test_warmup_caches_facets(tmp_path, rng):
    """Frequent-word warmup caches string-facet histograms alongside the
    result page (reference warmup index.rs:4006-4058): a faceted
    single-frequent-term query is served from the cache with exact
    counts, and range facets correctly bypass it."""
    import seekstorm_tpu.metrics as M

    meta = st.IndexMeta(frequent_words=st.FrequentwordType.Custom,
                        custom_frequent_words=("common",))
    idx = st.create_index(tmp_path / "ix", schema(), meta=meta,
                          shard_count=2)
    docs = make_docs(rng, 200)
    idx.index_documents(docs)
    idx.commit()
    h = next(iter(idx._warmup_cache))
    assert len(idx._warmup_cache[h]) == 4
    assert "brand" in idx._warmup_cache[h][3]

    qf = st.QueryFacet(field="brand", length=10)
    before = M.METRICS._counters.get("device_dispatch_total", 0)
    rs = idx.search(st.SearchRequest(
        query="common", length=10, query_facets=[qf], realtime=False,
        result_type=st.ResultType.TopkCount))
    after = M.METRICS._counters.get("device_dispatch_total", 0)
    assert after == before, "faceted frequent-word query missed the cache"

    # exact counts vs brute force
    exp = {}
    for d in docs:
        exp[d["brand"]] = exp.get(d["brand"], 0) + 1
    got = dict(rs.facets["brand"])
    assert got == exp, (got, exp)
    assert rs.result_count_total == len(docs)

    # range facets are NOT cacheable -> normal path, still correct
    qf2 = st.QueryFacet(field="price", length=10,
                        ranges=st.Ranges(field="price",
                                         ranges=[("lo", 0), ("hi", 250)]))
    rs2 = idx.search(st.SearchRequest(
        query="common", length=10, query_facets=[qf2], realtime=False))
    assert sum(c for _, c in rs2.facets["price"]) >= 1
