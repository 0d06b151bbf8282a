"""Query-tiled pruned scan (ops/lexical.lexical_scan_qt): exactness vs the
full-batch kernel, both at the kernel level and end-to-end through
search_batch with pruning forced on.
"""

import numpy as np
import pytest

import importlib

import seekstorm_tpu as st
from seekstorm_tpu.schema import BLOCK_SIZE

# the package re-exports search() the function; we need the module
sm = importlib.import_module("seekstorm_tpu.search")


@pytest.fixture(scope="module")
def two_block_index(tmp_path_factory):
    rng = np.random.default_rng(3)
    vocab = [f"w{i:03d}" for i in range(300)]
    docs = [{"title": " ".join(rng.choice(vocab, 4)),
             "body": " ".join(rng.choice(vocab, 20))}
            for _ in range(BLOCK_SIZE + 4_000)]
    tmp = tmp_path_factory.mktemp("qt")
    schema = [
        st.SchemaField("title", st.FieldType.Text, indexed=True, boost=10.0),
        st.SchemaField("body", st.FieldType.Text, indexed=True),
    ]
    idx = st.create_index(tmp / "ix", schema, shard_count=1)
    idx.index_documents(docs)
    idx.commit()
    assert idx.shards[0].lexical.n_blocks == 2
    return idx


def _run(idx, queries, qtype, realtime=False):
    reqs = [st.SearchRequest(query=q, length=10,
                             result_type=st.ResultType.Topk,
                             realtime=realtime, query_type_default=qtype)
            for q in queries]
    out = st.search_batch(idx, reqs)
    return [[(r.doc_id, round(float(r.score), 4)) for r in rs.results]
            for rs in out]


@pytest.mark.parametrize("qtype", [st.QueryType.Union,
                                   st.QueryType.Intersection])
def test_qt_matches_full_batch_kernel(two_block_index, qtype, monkeypatch):
    idx = two_block_index
    rng = np.random.default_rng(11)
    vocab = [f"w{i:03d}" for i in range(300)]
    queries = [f"{rng.choice(vocab)} {rng.choice(vocab)}" for _ in range(24)]
    queries += [f"{rng.choice(vocab)}", f"-{rng.choice(vocab)} w001"]

    monkeypatch.setattr(sm, "QT_MIN_BLOCKS", 10_000)
    base = _run(idx, queries, qtype)
    monkeypatch.setattr(sm, "QT_MIN_BLOCKS", 1)
    qt = _run(idx, queries, qtype)
    assert base == qt


def test_qt_with_realtime_tail(two_block_index, monkeypatch):
    idx = two_block_index
    idx.index_document({"title": "zebra unique", "body": "tail doc qtpath"})
    try:
        monkeypatch.setattr(sm, "QT_MIN_BLOCKS", 1)
        rs = idx.search(st.SearchRequest(query="qtpath", realtime=True,
                                         result_type=st.ResultType.Topk))
        assert rs.result_count == 1
    finally:
        idx.commit()  # leave the module-scoped index committed


def test_qt_escalation_exactness(two_block_index, monkeypatch):
    """With a starvation-level budget, the escalation pass (full-coverage
    re-run) must still produce exact results."""
    idx = two_block_index
    monkeypatch.setattr(sm, "QT_MIN_BLOCKS", 1)
    monkeypatch.setattr(sm, "PRUNE_BLOCKS", 1)
    rng = np.random.default_rng(5)
    vocab = [f"w{i:03d}" for i in range(300)]
    queries = [f"{rng.choice(vocab)} {rng.choice(vocab)}" for _ in range(8)]
    qt = _run(idx, queries, st.QueryType.Union)
    monkeypatch.setattr(sm, "QT_MIN_BLOCKS", 10_000)
    monkeypatch.setattr(sm, "PRUNE_BLOCKS", 16)
    base = _run(idx, queries, st.QueryType.Union)
    assert base == qt


def test_qt_sharded_mesh(tmp_path, monkeypatch):
    """qt path through the shard_map executor on a virtual 8-device mesh."""
    from seekstorm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(9)
    vocab = [f"w{i:02d}" for i in range(50)]
    schema = [st.SchemaField("body", st.FieldType.Text, indexed=True)]
    idx = st.create_index(tmp_path / "ix", schema, shard_count=8)
    docs = [{"body": " ".join(rng.choice(vocab, 12))} for _ in range(400)]
    idx.index_documents(docs)
    idx.commit()

    queries = [f"{rng.choice(vocab)} {rng.choice(vocab)}" for _ in range(16)]
    base = _run(idx, queries, st.QueryType.Union)

    idx.attach_mesh(make_mesh(8))
    monkeypatch.setattr(sm, "QT_MIN_BLOCKS", 1)
    qt = _run(idx, queries, st.QueryType.Union)
    assert base == qt
