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
