"""Regression tests for round-1 advisor findings (ADVICE.md)."""

import threading

import numpy as np
import pytest

import seekstorm_tpu as st


def _schema():
    return [
        st.SchemaField("title", st.FieldType.Text, stored=True, indexed=True,
                       boost=10.0),
        st.SchemaField("body", st.FieldType.Text, stored=True, indexed=True),
    ]


def test_get_document_after_deferred_reload(tmp_path):
    """Bulk ingest past a 64K level boundary defers the shard reload;
    get_document/get_iterator must still serve docs from the packed level
    (advisor: IndexError via stale shard.docstores)."""
    idx = st.create_index(tmp_path / "ix", _schema(), shard_count=1)
    docs = [{"title": f"t{i}", "body": f"word{i % 37} filler"}
            for i in range(65_536 + 10)]
    ids = idx.index_documents(docs)
    # no commit, no search: fetch straight after the auto-commit
    d0 = idx.get_document(ids[0])
    assert d0 is not None and d0["title"] == "t0"
    dl = idx.get_document(ids[-1])
    assert dl is not None and dl["title"] == f"t{len(docs) - 1}"
    it = idx.get_iterator(take=3, include_document=True)
    assert len(it) == 3 and it[0][1] is not None


def test_concurrent_index_document_id_mapping(tmp_path):
    """Concurrent index_document calls must keep the
    local == global_id // shard_count invariant (advisor: global id
    allocated under one lock, append under another)."""
    idx = st.create_index(tmp_path / "ix", _schema(), shard_count=2)
    n_threads, per_thread = 8, 50
    results: list[list[tuple[int, str]]] = [[] for _ in range(n_threads)]

    def worker(t):
        for i in range(per_thread):
            title = f"doc-{t}-{i}"
            g = idx.index_document({"title": title, "body": "x"})
            results[t].append((g, title))

    threads = [threading.Thread(target=worker, args=(t,))
               for t in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    all_pairs = [p for r in results for p in r]
    gids = [g for g, _ in all_pairs]
    assert len(set(gids)) == len(gids), "duplicate global ids"
    for g, title in all_pairs:
        doc = idx.get_document(g)
        assert doc is not None and doc["title"] == title


def test_reference_ranges_wire_format():
    """The reference's externally-tagged Ranges enum must parse
    (advisor: KeyError -> HTTP 400 on reference-style requests)."""
    from seekstorm_tpu.api_types import search_request_from_json

    req, _, _ = search_request_from_json({
        "query": "q",
        "query_facets": [{
            "field": "price", "length": 5,
            "ranges": {"F64": ["CountAboveRange",
                               [["cheap", 0.0], ["mid", 10.0],
                                ["high", 100.0]]]},
        }],
    })
    qf = req.query_facets[0]
    assert qf.ranges is not None
    assert qf.ranges.range_type == "CountAboveRange"
    assert qf.ranges.ranges[1] == ("mid", 10.0)

    req2, _, _ = search_request_from_json({
        "query": "q",
        "query_facets": [{
            "field": "loc",
            "ranges": {"Point": ["CountWithinRange",
                                 [["near", 0.0], ["far", 50.0]],
                                 [48.1, 11.5], "Miles"]},
        }],
    })
    qf2 = req2.query_facets[0]
    assert qf2.ranges.base == (48.1, 11.5)
    assert qf2.ranges.unit == "Miles"


def test_truncated_terms_blob_is_bounded(tmp_path):
    """A terms.txt with fewer newlines than terms must not crash the
    native partial-level reload (advisor: unbounded scan)."""
    idx = st.create_index(tmp_path / "ix", _schema(), shard_count=1)
    for i in range(20):
        idx.index_document({"title": f"alpha{i}", "body": "beta gamma"})
    idx.commit()
    # corrupt the packed partial level's terms blob
    tpath = tmp_path / "ix" / "shard_0" / "level_0" / "terms.txt"
    if tpath.exists():
        blob = tpath.read_bytes()
        tpath.write_bytes(blob.replace(b"\n", b" ", max(blob.count(b"\n") - 1,
                                                        0)))
    # reopen replays the partial level through st_accum_load
    idx2 = st.open_index(tmp_path / "ix")
    rs = idx2.search(st.SearchRequest(query="beta"))
    assert rs.results  # still serves queries, no OOB crash
