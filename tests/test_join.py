"""Posting-space join path (ops/join.py): per-query posting windows +
batched sorted-list joins.  Parity is asserted against the doc-space scan
kernels on the same index — scores and ids must match exactly, across
sparse CSR terms, bitmap-backed heavy terms (stash candidates + bitmap
membership), intersections, unions, negation, and multi-shard merges.
"""

import importlib

import numpy as np
import pytest

import seekstorm_tpu as st
from seekstorm_tpu import lexindex

sm = importlib.import_module("seekstorm_tpu.search")


def _results(idx, queries, qtype=st.QueryType.Union, length=10):
    reqs = [st.SearchRequest(query=q, length=length,
                             result_type=st.ResultType.Topk,
                             realtime=False, query_type_default=qtype)
            for q in queries]
    return [
        [(r.doc_id, round(float(r.score), 4)) for r in rs.results]
        for rs in st.search_batch(idx, reqs)
    ]


def _assert_equivalent(got, want):
    """Both must be valid top-k pages: identical score lists, identical id
    sets per score-tie group — except the boundary group truncated by k,
    where any subset of the tied docs is a correct answer."""
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert [s for _, s in g] == [s for _, s in w]
        groups_g: dict = {}
        groups_w: dict = {}
        for d, s in g:
            groups_g.setdefault(s, set()).add(d)
        for d, s in w:
            groups_w.setdefault(s, set()).add(d)
        last_score = g[-1][1] if g else None
        for s, ids in groups_g.items():
            if s == last_score:
                assert len(ids) == len(groups_w[s])
            else:
                assert ids == groups_w[s], s


def _docspace_results(idx, queries, monkeypatch, qtype, length=10):
    """Force the doc-space path by making every query join-ineligible."""
    monkeypatch.setattr(sm, "JOIN_V_MAX", 0)
    try:
        return _results(idx, queries, qtype, length)
    finally:
        monkeypatch.undo()


@pytest.fixture()
def mixed_index(tmp_path, monkeypatch):
    """600 docs, one heavy bitmap term ('common'), mid and rare terms."""
    monkeypatch.setattr(lexindex, "BITMAP_MIN", 8)
    rng = np.random.default_rng(11)
    vocab = [f"w{i:02d}" for i in range(40)]
    schema = [
        st.SchemaField("title", st.FieldType.Text, stored=True, indexed=True,
                       boost=10.0),
        st.SchemaField("body", st.FieldType.Text, stored=True, indexed=True),
    ]
    idx = st.create_index(tmp_path / "ix", schema, shard_count=1)
    docs = []
    for i in range(600):
        body = ["common", "filler"] + list(rng.choice(vocab, 15))
        if i % 7 == 0:
            body += ["common"]          # tf=2 -> CSR residual
        title = list(rng.choice(vocab, 3))
        docs.append({"title": " ".join(title), "body": " ".join(body)})
    idx.index_documents(docs)
    idx.commit()
    d = idx.shards[0].lexical.directory
    assert int(d.seg_stash_len.sum()) > 0, "no join stash built"
    return idx


QUERIES = [
    "w01 w02", "w03", "w04 w05 w06", "w07 -w08", "w09 +w10",
    "common w01", "common", "w02 -common",
]


@pytest.mark.parametrize("qtype", [st.QueryType.Union,
                                   st.QueryType.Intersection])
def test_join_matches_docspace(mixed_index, monkeypatch, qtype):
    from seekstorm_tpu.metrics import METRICS

    METRICS.reset()
    got = _results(mixed_index, QUERIES, qtype)
    snap = METRICS.snapshot()
    assert snap.get("join_dispatch_total", 0) >= 1, "join path not taken"
    want = _docspace_results(mixed_index, QUERIES, monkeypatch, qtype)
    _assert_equivalent(got, want)


def test_join_multi_bitmap_fallback(mixed_index, monkeypatch):
    """Queries with >= 2 bitmap terms are join-ineligible and still split
    correctly from an otherwise-eligible batch."""
    queries = ["common filler", "w01 common", "w02 w03"]
    got = _results(mixed_index, queries, st.QueryType.Union)
    want = _docspace_results(mixed_index, queries, monkeypatch,
                             st.QueryType.Union)
    _assert_equivalent(got, want)


def test_join_multishard(tmp_path, monkeypatch):
    monkeypatch.setattr(lexindex, "BITMAP_MIN", 8)
    rng = np.random.default_rng(3)
    vocab = [f"v{i:02d}" for i in range(30)]
    schema = [st.SchemaField("body", st.FieldType.Text, stored=True,
                             indexed=True)]
    idx = st.create_index(tmp_path / "ix", schema, shard_count=3)
    docs = [{"body": " ".join(["hot"] + list(rng.choice(vocab, 12)))}
            for _ in range(900)]
    idx.index_documents(docs)
    idx.commit()
    queries = ["v01 v02", "hot v03", "v04", "v05 -v06"]
    for qtype in (st.QueryType.Union, st.QueryType.Intersection):
        got = _results(idx, queries, qtype)
        want = _docspace_results(idx, queries, monkeypatch, qtype)
        _assert_equivalent(got, want)


def test_join_deep_paging_fallback(mixed_index, monkeypatch):
    """offset+length beyond STASH_K falls back to the doc-space path and
    still returns correct pages."""
    req = st.SearchRequest(query="common w01", length=10, offset=80,
                           result_type=st.ResultType.Topk, realtime=False)
    got = st.search_batch(mixed_index, [req])[0]
    monkeypatch.setattr(sm, "JOIN_V_MAX", 0)
    want = st.search_batch(mixed_index, [req])[0]
    assert [(r.doc_id, round(r.score, 4)) for r in got.results] == \
        [(r.doc_id, round(r.score, 4)) for r in want.results]


def test_join_realtime_tail(tmp_path, monkeypatch):
    """Join path merges with the realtime level-0 tail."""
    schema = [st.SchemaField("body", st.FieldType.Text, stored=True,
                             indexed=True)]
    idx = st.create_index(tmp_path / "ix", schema, shard_count=1)
    idx.index_documents([{"body": f"alpha beta doc{i}"} for i in range(50)])
    idx.commit()
    idx.index_documents([{"body": "alpha beta fresh"} for _ in range(3)])
    rs = idx.search(st.SearchRequest(
        query="alpha beta", length=60, realtime=True,
        result_type=st.ResultType.Topk,
        query_type_default=st.QueryType.Intersection))
    assert len(rs.results) == 53
