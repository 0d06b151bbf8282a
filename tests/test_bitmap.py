"""Presence-bitmap impact path (lexindex.BITMAP_MIN): plain postings of
heavy (term, block) segments live in 64K-bit bitmaps scored via rank-1
sat1 matmuls; irregular postings (secondary-field hits, tf >= 2) stay in
the decoded CSR.  Mirrors the reference's roaring Bitmap blocks
(compress_postinglist.rs:240-330).
"""

import importlib

import numpy as np
import pytest

import seekstorm_tpu as st
from seekstorm_tpu import lexindex

sm = importlib.import_module("seekstorm_tpu.search")


@pytest.fixture()
def bitmap_index(tmp_path, monkeypatch):
    monkeypatch.setattr(lexindex, "BITMAP_MIN", 8)
    rng = np.random.default_rng(4)
    vocab = [f"w{i:02d}" for i in range(40)]
    schema = [
        st.SchemaField("title", st.FieldType.Text, stored=True, indexed=True,
                       boost=10.0),
        st.SchemaField("body", st.FieldType.Text, stored=True, indexed=True),
    ]
    idx = st.create_index(tmp_path / "ix", schema, shard_count=1)
    docs = []
    for i in range(600):
        body = ["common"] + list(rng.choice(vocab, 15))
        if i % 7 == 0:
            body += ["common"]          # tf=2 -> CSR remainder
        title = list(rng.choice(vocab, 3))
        if i % 11 == 0:
            title += ["common"]         # title hit -> CSR remainder
        docs.append({"title": " ".join(title), "body": " ".join(body)})
    idx.index_documents(docs)
    idx.commit()
    d = idx.shards[0].lexical.directory
    assert (d.seg_bitmap >= 0).sum() >= 1, "no bitmap segments built"
    # the heavy term must have BOTH a bitmap and a CSR remainder
    from seekstorm_tpu.utils import term_hash

    ti = d.lookup(term_hash("common"))
    e = int(d.seg_start[ti])
    assert d.seg_bitmap[e] >= 0
    assert d.seg_dev_len[e] > 0
    assert d.seg_dev_len[e] < d.seg_len[e]
    return idx, docs


def test_bitmap_scores_match_oracle(bitmap_index):
    """Scores and counts through the bitmap path equal the numpy oracle."""
    idx, docs = bitmap_index
    from seekstorm_tpu.utils import term_hash
    from seekstorm_tpu.oracle import OracleTermPostings, idf as idf_fn
    from seekstorm_tpu.oracle import score_query, topk_from_scores

    lex = idx.shards[0].lexical
    d = lex.directory

    def oracle_postings(term):
        ti = d.lookup(term_hash(term))
        if ti < 0:
            return None, 0
        lvl = lex.levels[0]
        t = int(np.searchsorted(lvl.term_hash, np.uint64(term_hash(term))))
        a, b = int(lvl.term_offset[t]), int(lvl.term_offset[t + 1])
        comps = lex.comp[np.asarray(lvl.docid[a:b], np.int64)]
        from seekstorm_tpu.oracle import term_impacts

        imp = term_impacts(np.asarray(lvl.tf[a:b]), comps,
                           idx.boosts_or_default())
        return OracleTermPostings(
            docids=np.asarray(lvl.docid[a:b], np.int64),
            impacts=imp, positions=None), b - a

    for query, qtype in [("common", st.QueryType.Union),
                         ("common w01", st.QueryType.Union),
                         ("common w01", st.QueryType.Intersection),
                         ("w01 -common", st.QueryType.Union)]:
        rs = idx.search(st.SearchRequest(
            query=query, length=10, result_type=st.ResultType.TopkCount,
            realtime=False, query_type_default=qtype))
        # oracle
        terms = query.replace("-", "").split()
        neg = [w.startswith("-") for w in query.split()]
        tps, dfs = [], []
        for t in terms:
            tp, df = oracle_postings(t)
            tps.append(tp)
            dfs.append(df)
        req = [qtype == st.QueryType.Intersection and not n for n in neg]
        sc, matched = score_query(len(docs), len(docs), tps, dfs, req, neg)
        want_s, want_ids = topk_from_scores(sc, 10)
        got_ids = [r.doc_id for r in rs.results]
        got_s = [r.score for r in rs.results]
        assert got_ids == list(want_ids), (query, qtype)
        np.testing.assert_allclose(got_s, want_s, rtol=5e-3)
        assert rs.result_count_total == int(matched.sum()), (query, qtype)


def test_bitmap_memory_form(bitmap_index):
    """Plain postings are NOT duplicated: dev CSR holds only remainders."""
    idx, _ = bitmap_index
    lex = idx.shards[0].lexical
    d = lex.directory
    # device CSR = per-segment remainders + the join-path candidate stash
    assert len(lex.dev_docid) == int(
        d.seg_dev_len.sum() + d.seg_stash_len.sum())
    n_bm = int((d.seg_bitmap >= 0).sum())
    assert lex.bitmaps.shape == (n_bm, 2048)
    # every bitmap bit count equals the plain-posting count it replaced
    total_bits = sum(
        int(np.unpackbits(lex.bitmaps.view(np.uint8)).sum())
        for _ in [0]
    )
    dropped = int(d.seg_len.sum()) - int(d.seg_dev_len.sum())
    assert total_bits == dropped


def test_bitmap_qt_path(bitmap_index, monkeypatch):
    """Bitmap slots work through the query-tiled kernel too."""
    idx, _ = bitmap_index
    rng = np.random.default_rng(6)
    queries = [f"common w{rng.integers(40):02d}" for _ in range(12)]
    reqs = [st.SearchRequest(query=q, length=10,
                             result_type=st.ResultType.Topk, realtime=False)
            for q in queries]
    base = [[(r.doc_id, round(float(r.score), 4)) for r in rs.results]
            for rs in st.search_batch(idx, reqs)]
    monkeypatch.setattr(sm, "QT_MIN_BLOCKS", 1)
    qt = [[(r.doc_id, round(float(r.score), 4)) for r in rs.results]
          for rs in st.search_batch(idx, reqs)]
    assert base == qt
