"""Coverage for access types, doc-store codecs, delete-by-query,
distance fields, and iterator edge cases."""

import numpy as np
import pytest

import seekstorm_tpu as st


def test_mmap_access_type(tmp_index_dir, rng):
    from tests.test_lexical import BruteForce, assert_parity, make_docs, std_schema

    docs = make_docs(rng, 80)
    meta = st.IndexMeta(access_type=st.AccessType.Mmap)
    idx = st.create_index(tmp_index_dir, std_schema(), meta=meta)
    idx.index_documents(docs)
    idx.commit()
    idx2 = st.open_index(tmp_index_dir)
    assert idx2.meta.access_type == st.AccessType.Mmap
    bf = BruteForce(idx2, docs)
    assert_parity(idx2, bf, "w001 w003", "Union")
    assert idx2.get_document(5)["title"] == docs[5]["title"]


@pytest.mark.parametrize("codec", [
    st.DocumentCompression.Null,
    st.DocumentCompression.Zlib,
    st.DocumentCompression.Zstd,   # falls back to Zlib if lib missing
])
def test_doc_compression_codecs(tmp_path, codec):
    meta = st.IndexMeta(doc_compression=codec)
    idx = st.create_index(
        tmp_path / "ix",
        [st.SchemaField("t", st.FieldType.Text, stored=True, indexed=True)],
        meta=meta,
    )
    idx.index_document({"t": "hello compressed world " * 20})
    idx.commit()
    idx2 = st.open_index(tmp_path / "ix")
    assert "hello compressed" in idx2.get_document(0)["t"]


def test_delete_by_query_semantics(tmp_index_dir, rng):
    from tests.test_lexical import make_docs, std_schema

    docs = make_docs(rng, 60)
    idx = st.create_index(tmp_index_dir, std_schema())
    idx.index_documents(docs)
    idx.commit()
    rs = idx.search(st.SearchRequest(query="w001", length=1000))
    victims = [r.doc_id for r in rs.results]
    idx.delete_documents(victims)
    rs2 = idx.search(st.SearchRequest(query="w001"))
    assert rs2.result_count_total == 0
    # other queries unaffected except removed docs
    rs3 = idx.search(st.SearchRequest(query="w002", length=1000))
    assert all(r.doc_id not in set(victims) for r in rs3.results)


def test_distance_fields_api(tmp_index_dir):
    from seekstorm_tpu.api_types import (
        DistanceField,
        apply_distance_fields,
    )

    idx = st.create_index(
        tmp_index_dir,
        [st.SchemaField("t", st.FieldType.Text, stored=True, indexed=True),
         st.SchemaField("loc", st.FieldType.Point, stored=True, facet=True)],
    )
    idx.index_documents([
        {"t": "place one", "loc": [48.8566, 2.3522]},   # Paris
        {"t": "place two", "loc": [51.5074, -0.1278]},  # London
    ])
    idx.commit()
    df = DistanceField(field="loc", distance="dist_km",
                       base=[48.8566, 2.3522], unit="Kilometers")
    doc = apply_distance_fields(idx, [df], 1, {"t": "place two"})
    assert 300 < doc["dist_km"] < 400   # Paris-London ~344 km
    doc0 = apply_distance_fields(idx, [df], 0, {})
    assert doc0["dist_km"] < 1.0
    dfm = DistanceField(field="loc", distance="dist_mi",
                        base=[48.8566, 2.3522], unit="Miles")
    docm = apply_distance_fields(idx, [dfm], 1, {})
    assert 190 < docm["dist_mi"] < 250


def test_iterator_edges(tmp_index_dir, rng):
    from tests.test_lexical import make_docs, std_schema

    docs = make_docs(rng, 20)
    idx = st.create_index(tmp_index_dir, std_schema(), shard_count=3)
    idx.index_documents(docs)
    idx.commit()
    idx.delete_document(5)
    assert idx.get_iterator(take=5) == [0, 1, 2, 3, 4]
    assert idx.get_iterator(take=5, skip=4) == [4, 6, 7, 8, 9]
    assert idx.get_iterator(take=5, include_deleted=True, skip=4) == [4, 5, 6, 7, 8]
    assert idx.get_iterator(take=-3) == [19, 18, 17]
    assert idx.get_iterator(document_id=10, take=3) == [10, 11, 12]
    got = idx.get_iterator(take=2, include_document=True)
    assert got[0][0] == 0 and got[0][1]["title"] == docs[0]["title"]
    assert idx.get_iterator(document_id=1000, take=3) == []


def test_mixed_batch_grouping(tmp_path):
    """search_batch accepts heterogeneous requests: settings group
    internally, results come back in request order."""
    import seekstorm_tpu as st

    schema = [st.SchemaField("body", st.FieldType.Text, stored=True,
                             indexed=True)]
    idx = st.create_index(tmp_path / "ix", schema, shard_count=1)
    idx.index_documents(
        [{"body": f"alpha beta doc{i} " + ("gamma" if i % 2 else "")}
         for i in range(40)])
    idx.commit()

    reqs = [
        st.SearchRequest(query="alpha", result_type=st.ResultType.TopkCount),
        st.SearchRequest(query="alpha gamma",
                         query_type_default=st.QueryType.Intersection,
                         result_type=st.ResultType.TopkCount),
        st.SearchRequest(query="beta", result_type=st.ResultType.Topk,
                         length=5),
        st.SearchRequest(query="alpha", offset=10, length=7,
                         result_type=st.ResultType.TopkCount),
        st.SearchRequest(query="gamma", fields=["body"]),
    ]
    out = idx.search_batch(reqs)
    assert out[0].result_count_total == 40
    assert out[1].result_count_total == 20
    assert len(out[2].results) == 5
    assert len(out[3].results) == 7 and out[3].results[0].doc_id not in [
        r.doc_id for r in out[0].results]
    assert out[4].results[0].doc is not None
    # singles must agree with the mixed batch
    for i, r in enumerate(reqs):
        single = idx.search(r)
        assert [x.doc_id for x in single.results] == [
            x.doc_id for x in out[i].results], i


def test_metrics_busy_seconds():
    """Timer sums double-count queue waits under concurrency; the busy
    counter (union of open intervals) is the honest utilization figure
    exposed at /metrics."""
    import threading
    import time as _t

    from seekstorm_tpu.metrics import Metrics

    m = Metrics()

    def worker():
        with m.timer("dev"):
            _t.sleep(0.1)

    ts = [threading.Thread(target=worker) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    s = m.snapshot()
    assert s["dev_seconds_total"] >= 0.35          # 4 overlapping opens
    assert s["dev_busy_seconds_total"] <= 0.2      # union ~ 0.1s
    assert "seekstorm_dev_busy_seconds" in m.render_prometheus()
