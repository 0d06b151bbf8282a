"""Windowed decode (ops/lexical._block_step_imp NW sub-windows): results
must be identical to the unwindowed scan — same kernel semantics, chunks
split per 64K/NW-doc sub-window by the planner from the commit-cached
window-split tables (lexindex.term_window_splits)."""

import importlib

import numpy as np

import seekstorm_tpu as st

sm = importlib.import_module("seekstorm_tpu.search")


def _mk(tmp_path):
    rng = np.random.default_rng(9)
    vocab = [f"w{i:02d}" for i in range(50)]
    schema = [
        st.SchemaField("title", st.FieldType.Text, stored=True, indexed=True,
                       boost=10.0),
        st.SchemaField("body", st.FieldType.Text, stored=True, indexed=True),
    ]
    idx = st.create_index(tmp_path / "ix", schema, shard_count=1)
    docs = [{"title": " ".join(rng.choice(vocab, 3)),
             "body": " ".join(rng.choice(vocab, 14))} for _ in range(800)]
    idx.index_documents(docs)
    idx.commit()
    return idx


def _run(idx, queries, rt=st.ResultType.Topk):
    reqs = [st.SearchRequest(query=q, length=10, result_type=rt,
                             realtime=False,
                             query_type_default=st.QueryType.Union)
            for q in queries]
    out = []
    for rs in st.search_batch(idx, reqs):
        out.append([(r.doc_id, round(float(r.score), 4)) for r in rs.results]
                   + [rs.result_count_total])
    return out


def test_windowed_matches_unwindowed(tmp_path, monkeypatch):
    idx = _mk(tmp_path)
    queries = ["w01 w02", "w03", "w04 +w05", "w06 -w07", "w08 w09 w10"]
    # join path would bypass the doc-space kernels entirely — disable
    monkeypatch.setattr(sm, "JOIN_V_MAX", 0)
    base = _run(idx, queries) + _run(idx, queries, st.ResultType.TopkCount)
    monkeypatch.setattr(sm, "WIN_MIN_BLOCKS", 1)  # force NW=8 on 1 block
    idx._stacked = None if hasattr(idx, "_stacked") else None
    win = _run(idx, queries) + _run(idx, queries, st.ResultType.TopkCount)
    assert base == win


def test_windowed_qt_path(tmp_path, monkeypatch):
    idx = _mk(tmp_path)
    queries = [f"w{i:02d} w{(i * 7) % 50:02d}" for i in range(12)]
    monkeypatch.setattr(sm, "JOIN_V_MAX", 0)
    base = _run(idx, queries)
    monkeypatch.setattr(sm, "WIN_MIN_BLOCKS", 1)
    monkeypatch.setattr(sm, "QT_MIN_BLOCKS", 1)
    monkeypatch.setattr(sm, "FULL_PLAN_BLOCKS", 0)
    win = _run(idx, queries)
    assert base == win


def test_window_split_tables(tmp_path):
    from seekstorm_tpu.lexindex import term_window_splits

    idx = _mk(tmp_path)
    lex = idx.shards[0].lexical
    d = lex.directory
    # every term's split table partitions its dev postings by docid window
    for t in range(min(len(d.hash), 20)):
        a, b = int(d.seg_start[t]), int(d.seg_start[t + 1])
        tab = term_window_splits(lex, a, b, 8)
        lens = np.asarray(d.seg_dev_len[a:b], np.int64)
        assert (tab[:, -1] == lens).all()
        offs = np.asarray(d.seg_dev_offset[a:b], np.int64)
        for i in range(b - a):
            seg = lex.dev_docid[offs[i]:offs[i] + lens[i]].astype(np.int64)
            for w in range(8):
                n = int(((seg >> 13) == w).sum())
                assert n == tab[i, w + 1] - tab[i, w]


def test_fast_mode_parity(tmp_path, monkeypatch):
    """bf16 fast mode (the TPU serving default) stays within ~1% of the
    exact f32 scores and preserves top-k membership on non-tied data."""
    import os

    idx = _mk(tmp_path)
    queries = ["w01 w02", "w03", "w04 +w05", "w06 -w07"]
    monkeypatch.setattr(sm, "JOIN_V_MAX", 0)
    exact = _run(idx, queries)
    monkeypatch.setenv("SEEKSTORM_TPU_FAST", "1")
    fast = _run(idx, queries)
    for e, f in zip(exact, fast):
        ids_e = {d for d, _ in e[:-1]}
        ids_f = {d for d, _ in f[:-1]}
        # allow boundary swaps among near-ties, bulk must agree
        assert len(ids_e & ids_f) >= len(ids_e) - 2, (ids_e, ids_f)
        se = {d: s for d, s in e[:-1]}
        for d, s in f[:-1]:
            if d in se:
                assert abs(s - se[d]) <= max(0.02 * abs(se[d]), 1e-3)
