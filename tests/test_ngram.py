"""N-gram indexing: phrase results must be identical with and without
n-gram acceleration; phrase counts must be exact via n-gram postings."""

import numpy as np

import seekstorm_tpu as st
from seekstorm_tpu.ngram import (
    ENGLISH_FREQUENT_WORDS,
    generate_ngrams,
    ngram_term,
    segment_phrase,
)


def test_generate_and_segment_consistency():
    flags = 1 | 2 | 4 | 8
    toks = "the quick brown fox of the forest".split()
    grams = generate_ngrams(toks, ENGLISH_FREQUENT_WORDS, flags)
    # every segment chosen at query time must have been indexed
    for term, off, ln in segment_phrase(toks, ENGLISH_FREQUENT_WORDS, flags):
        if ln > 1:
            assert term in grams and off in grams[term]


def make_docs(rng, n):
    # texts mixing frequent ("the", "of", "and") and rare words
    rare = [f"zq{i:02d}" for i in range(20)]
    docs = []
    for i in range(n):
        words = []
        for j in range(12):
            r = rng.random()
            if r < 0.4:
                words.append(rng.choice(["the", "of", "and", "to", "in"]))
            else:
                words.append(rare[int(rng.integers(0, len(rare)))])
        docs.append({"t": " ".join(words)})
    return docs


def build(tmp, rng, flags):
    meta = st.IndexMeta(
        ngram_indexing=flags,
        frequent_words=st.FrequentwordType.English,
    )
    schema = [st.SchemaField("t", st.FieldType.Text, stored=True, indexed=True)]
    idx = st.create_index(tmp, schema, meta=meta)
    docs = make_docs(rng, 250)
    idx.index_documents(docs)
    idx.commit()
    return idx, docs


def brute_phrase_count(docs, phrase):
    ph = phrase.split()
    n = 0
    for d in docs:
        toks = d["t"].split()
        if any(toks[i : i + len(ph)] == ph for i in range(len(toks))):
            n += 1
    return n


def test_phrase_parity_with_and_without_ngrams(tmp_path):
    rng = np.random.default_rng(11)
    docs_seed = make_docs(rng, 250)

    idx_plain = st.create_index(
        tmp_path / "plain",
        [st.SchemaField("t", st.FieldType.Text, stored=True, indexed=True)],
    )
    idx_plain.index_documents(docs_seed)
    idx_plain.commit()

    meta = st.IndexMeta(ngram_indexing=1 | 2 | 4 | 8,
                        frequent_words=st.FrequentwordType.English)
    idx_ng = st.create_index(
        tmp_path / "ngram",
        [st.SchemaField("t", st.FieldType.Text, stored=True, indexed=True)],
        meta=meta,
    )
    idx_ng.index_documents(docs_seed)
    idx_ng.commit()

    # n-gram postings exist
    grams = [t for t in idx_ng.shards[0].level0.term_str.values() if "\x01" in t]
    assert grams, "no n-gram terms were indexed"

    for phrase in ['"the of"', '"of the"', '"zq01 the"', '"the zq05 and"',
                   '"the of and"']:
        rp = idx_plain.search(st.SearchRequest(
            query=phrase, result_type=st.ResultType.TopkCount, length=50))
        rn = idx_ng.search(st.SearchRequest(
            query=phrase, result_type=st.ResultType.TopkCount, length=50))
        bf = brute_phrase_count(docs_seed, phrase.strip('"'))
        assert rp.result_count_total == bf, (phrase, "plain", rp.result_count_total, bf)
        assert rn.result_count_total == bf, (phrase, "ngram", rn.result_count_total, bf)
        assert {x.doc_id for x in rp.results} == {x.doc_id for x in rn.results}, phrase


def test_ngram_count_exact_without_verification(tmp_path, rng):
    """A fully-covered phrase (single n-gram segment) needs no position
    verification — its df IS the phrase count."""
    idx, docs = build(tmp_path / "ix", rng, flags=1 | 2 | 4 | 8)
    rs = idx.search(st.SearchRequest(query='"the of"',
                                     result_type=st.ResultType.TopkCount))
    assert rs.result_count_total == brute_phrase_count(docs, "the of")
    assert rs.count_exact


def test_ngram_reopen(tmp_path, rng):
    idx, docs = build(tmp_path / "ix", rng, flags=1 | 4)
    r1 = idx.search(st.SearchRequest(query='"the of"'))
    idx2 = st.open_index(tmp_path / "ix")
    r2 = idx2.search(st.SearchRequest(query='"the of"'))
    assert [x.doc_id for x in r1.results] == [x.doc_id for x in r2.results]


def _score_map(rs):
    return {x.doc_id: x.score for x in rs.results}


def test_ngram_constituent_scores_match_plain_index(tmp_path):
    """Bm25f scores n-gram postings with per-constituent tfs/idfs
    (reference add_result.rs:868-915), so phrase scores must be IDENTICAL
    with and without n-gram acceleration."""
    rng = np.random.default_rng(23)
    docs = make_docs(rng, 300)

    idx_plain = st.create_index(
        tmp_path / "plain",
        [st.SchemaField("t", st.FieldType.Text, stored=True, indexed=True)],
    )
    idx_plain.index_documents(docs)
    idx_plain.commit()

    meta = st.IndexMeta(ngram_indexing=1 | 2 | 4 | 8,
                        frequent_words=st.FrequentwordType.English)
    idx_ng = st.create_index(
        tmp_path / "ngram",
        [st.SchemaField("t", st.FieldType.Text, stored=True, indexed=True)],
        meta=meta,
    )
    idx_ng.index_documents(docs)
    idx_ng.commit()

    for phrase in ['"the of"', '"of the"', '"zq01 the"', '"the zq05 and"',
                   '"the of and"', '"and zq03"']:
        rp = idx_plain.search(st.SearchRequest(query=phrase, length=100))
        rn = idx_ng.search(st.SearchRequest(query=phrase, length=100))
        sp, sn = _score_map(rp), _score_map(rn)
        assert set(sp) == set(sn), phrase
        for d in sp:
            assert abs(sp[d] - sn[d]) <= 1e-3 * max(abs(sp[d]), 1.0), (
                phrase, d, sp[d], sn[d])


def test_ngram_constituent_scores_realtime_tail(tmp_path):
    """The uncommitted level-0 tail must score n-grams with the same
    constituent semantics as committed levels."""
    rng = np.random.default_rng(29)
    docs = make_docs(rng, 120)
    mk = lambda p: st.create_index(
        p, [st.SchemaField("t", st.FieldType.Text, stored=True, indexed=True)],
        meta=st.IndexMeta(ngram_indexing=1 | 2 | 4 | 8,
                          frequent_words=st.FrequentwordType.English))
    idx_c = mk(tmp_path / "committed")
    idx_c.index_documents(docs)
    idx_c.commit()
    idx_t = mk(tmp_path / "tail")
    idx_t.index_documents(docs)   # NOT committed

    for phrase in ['"the of"', '"the zq05 and"']:
        rc = idx_c.search(st.SearchRequest(query=phrase, length=100))
        rt = idx_t.search(st.SearchRequest(query=phrase, length=100,
                                           realtime=True))
        sc, stt = _score_map(rc), _score_map(rt)
        assert set(sc) == set(stt), phrase
        for d in sc:
            assert abs(sc[d] - stt[d]) <= 1e-3 * max(abs(sc[d]), 1.0), (
                phrase, d, sc[d], stt[d])


def test_bm25f_proximity_scores_ngram_as_unit(tmp_path):
    """Bm25fProximity keeps the n-gram's own idf (reference
    add_result.rs:917-919) — rarer than its constituents, so adjacency is
    rewarded and scores differ from the plain-index phrase scores."""
    rng = np.random.default_rng(31)
    docs = make_docs(rng, 300)
    meta = st.IndexMeta(ngram_indexing=1 | 2 | 4 | 8,
                        frequent_words=st.FrequentwordType.English,
                        similarity=st.LexicalSimilarity.Bm25fProximity)
    idx = st.create_index(
        tmp_path / "prox",
        [st.SchemaField("t", st.FieldType.Text, stored=True, indexed=True)],
        meta=meta,
    )
    idx.index_documents(docs)
    idx.commit()
    idx_plain = st.create_index(
        tmp_path / "plain",
        [st.SchemaField("t", st.FieldType.Text, stored=True, indexed=True)],
    )
    idx_plain.index_documents(docs)
    idx_plain.commit()

    rs = idx.search(st.SearchRequest(query='"the of"', length=100))
    rp = idx_plain.search(st.SearchRequest(query='"the of"', length=100))
    assert {x.doc_id for x in rs.results} == {x.doc_id for x in rp.results}
    sm, sp = _score_map(rs), _score_map(rp)
    # idf of the bigram exceeds idf(the)+idf(of) would be coincidence;
    # the point is the formulas differ
    assert any(abs(sm[d] - sp[d]) > 1e-6 for d in sm)
