"""Bucket-WAND engine (ops/wand.py): end-to-end parity vs the dense kernels.

The WAND path is an upper-bound scan + exact host rescore, so results must be
bit-identical to the dense path (same scores, same ordering, same counts) on
every eligible query shape: union/intersection, required (+) and negated (-)
terms, single-term, TopkCount exact counts, deleted docs, multi-shard.
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


def _run(idx, queries, qtype, result_type=None, realtime=False):
    result_type = result_type or st.ResultType.Topk
    reqs = [st.SearchRequest(query=q, length=10,
                             result_type=result_type,
                             realtime=realtime, query_type_default=qtype)
            for q in queries]
    out = st.search_batch(idx, reqs)
    return [([(r.doc_id, round(float(r.score), 3)) for r in rs.results],
             rs.result_count) for rs in out]


def _queries(n=24, seed=5):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i:03d}" for i in range(250)]
    qs = [f"{rng.choice(vocab)} {rng.choice(vocab)}" for _ in range(n)]
    qs += [f"{rng.choice(vocab)}",                      # single term
           f"+{rng.choice(vocab)} {rng.choice(vocab)}",  # required
           f"-{rng.choice(vocab)} w001 w002",            # negated
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
    # delete a spread of docs, including some likely top hits
    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    pre = _run(idx, ["w001 w002"], st.QueryType.Union)
    victims = [d for d, _ in pre[0][0][:3]]
    victims += list(range(0, 3000, 617))
    idx.delete_documents(victims)
    try:
        queries = _queries(12, seed=9)
        monkeypatch.setenv("SEEKSTORM_TPU_NO_WAND", "1")
        base = _run(idx, queries, st.QueryType.Union, st.ResultType.TopkCount)
        monkeypatch.delenv("SEEKSTORM_TPU_NO_WAND")
        wand = _run(idx, queries, st.QueryType.Union, st.ResultType.TopkCount)
        assert base == wand
        for d, _ in wand[0][0]:
            assert d not in victims
    finally:
        # restore index state for other tests (module-scoped fixture)
        idx.delete_documents([])  # no-op flush
