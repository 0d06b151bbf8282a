"""Lexical engine integration tests.

Mirrors the reference's integration-first test strategy
(reference tests/test.rs:22-745 — ordered lifecycle over a shared index with
exact-count asserts) plus randomized oracle-parity tests: an independent
brute-force BM25F implementation in this file recomputes every score from
the raw documents and must agree with the engine (device path) exactly.
"""

import math

import numpy as np
import pytest

import seekstorm_tpu as st
from seekstorm_tpu.schema import BM25_B, BM25_K
from seekstorm_tpu.utils import (
    DOCUMENT_LENGTH_COMPRESSION,
    compress_lengths,
)


def std_schema():
    return [
        st.SchemaField("title", st.FieldType.Text, stored=True, indexed=True, boost=10.0),
        st.SchemaField("body", st.FieldType.Text, stored=True, indexed=True),
    ]


# ---------------------------------------------------------------------------
# independent brute-force reference scorer (recomputed from raw docs)

class BruteForce:
    def __init__(self, index, docs):
        self.index = index
        self.analyzer = index.analyzer
        self.fields = [sf.field for sf in index.indexed_fields]
        self.boosts = [sf.boost for sf in index.indexed_fields]
        self.shard_count = index.shard_count
        # per shard: doc token streams
        self.shard_docs = [[] for _ in range(index.shard_count)]
        for g, doc in enumerate(docs):
            toks = [self.analyzer.analyze(doc.get(f, "") or "") for f in self.fields]
            self.shard_docs[g % index.shard_count].append((g, toks))

    def _shard_stats(self, sdocs):
        n = len(sdocs)
        norm_lens = []
        for _, toks in sdocs:
            lens = compress_lengths(np.array([len(t) for t in toks]))
            norm_lens.append(DOCUMENT_LENGTH_COMPRESSION[lens].astype(float))
        avg = sum(x.sum() for x in norm_lens) / max(n, 1)
        return norm_lens, avg

    def score(self, query, query_type="Union", deleted=()):
        """Returns {global_id: score} of matching docs."""
        from seekstorm_tpu.tokenizer import parse_query

        pq = parse_query(query, self.analyzer)
        out = {}
        for sdocs in self.shard_docs:
            n = len(sdocs)
            if n == 0:
                continue
            norm_lens, avg = self._shard_stats(sdocs)
            # df per term (in this shard)
            terms = []
            seen = set()
            for t in pq.terms:
                if t.term not in seen:
                    seen.add(t.term)
                    terms.append(t)
            dfs = {}
            for t in terms:
                dfs[t.term] = sum(
                    1
                    for _, toks in sdocs
                    if any(t.term in ftoks for ftoks in toks)
                )
            for di, (g, toks) in enumerate(sdocs):
                if g in deleted:
                    continue
                score, any_hit, req_ok, neg_hit = 0.0, False, True, False
                for t in terms:
                    present = any(t.term in ftoks for ftoks in toks)
                    if t.negated:
                        neg_hit |= present
                        continue
                    required = t.required or query_type in ("Intersection", "Phrase")
                    if required and not present:
                        req_ok = False
                    if not present:
                        continue
                    any_hit = True
                    idf = math.log(1 + (n - dfs[t.term] + 0.5) / (dfs[t.term] + 0.5))
                    for f, ftoks in enumerate(toks):
                        tf = ftoks.count(t.term)
                        if tf == 0:
                            continue
                        comp = BM25_K * (1 - BM25_B + BM25_B * norm_lens[di][f] / avg)
                        score += self.boosts[f] * idf * tf * (BM25_K + 1) / (tf + comp)
                if any_hit and req_ok and not neg_hit:
                    # phrase adjacency
                    if query_type == "Phrase" or pq.phrases:
                        groups = pq.phrases or [list(range(len(pq.terms)))]
                        ok = all(
                            self._phrase_in(toks, [pq.terms[i].term for i in grp])
                            for grp in groups
                        )
                        if not ok:
                            continue
                    out[g] = score
        return out

    @staticmethod
    def _phrase_in(toks, phrase):
        for ftoks in toks:
            for i in range(len(ftoks) - len(phrase) + 1):
                if ftoks[i : i + len(phrase)] == phrase:
                    return True
        return False


def make_docs(rng, n, vocab_size=60):
    vocab = [f"w{i:03d}" for i in range(vocab_size)]
    probs = np.array([1.0 / (i + 1) for i in range(vocab_size)])
    probs /= probs.sum()
    docs = []
    for _ in range(n):
        tn = int(rng.integers(3, 12))
        bn = int(rng.integers(5, 40))
        title = " ".join(rng.choice(vocab, size=tn, p=probs))
        body = " ".join(rng.choice(vocab, size=bn, p=probs))
        docs.append({"title": title, "body": body})
    return docs


def assert_parity(index, bf, query, query_type, k=10, deleted=(), tol=5e-3):
    expected = bf.score(query, query_type, deleted=deleted)
    req = st.SearchRequest(
        query=query,
        length=k,
        query_type_default=st.QueryType(query_type),
        result_type=st.ResultType.TopkCount,
    )
    rs = index.search(req)
    assert rs.result_count_total == len(expected), (
        f"count mismatch for {query!r} {query_type}: "
        f"{rs.result_count_total} != {len(expected)}"
    )
    exp_sorted = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    got = [(r.doc_id, r.score) for r in rs.results]
    assert len(got) == len(exp_sorted)
    for (gid, gs), (eid, es) in zip(got, exp_sorted):
        assert abs(gs - es) < tol * max(1.0, abs(es)), (query, gid, gs, eid, es)
    # ids may swap under near-ties; verify score ordering instead of exact ids
    got_ids = {g for g, _ in got}
    exp_ids = {e for e, _ in exp_sorted}
    # allow tie-boundary differences only
    for gid in got_ids - exp_ids:
        assert any(abs(expected[gid] - es) < 1e-3 for _, es in exp_sorted), (
            query, gid, expected.get(gid)
        )


# ---------------------------------------------------------------------------

def test_lifecycle(tmp_index_dir, rng):
    docs = make_docs(rng, 300)
    idx = st.create_index(tmp_index_dir, std_schema(), shard_count=1)
    ids = idx.index_documents(docs)
    assert ids == list(range(300))
    assert idx.indexed_doc_count == 300

    bf = BruteForce(idx, docs)
    # realtime before commit
    assert_parity(idx, bf, "w001 w005", "Union")
    idx.commit()
    assert idx.committed_doc_count == 300

    for q, t in [
        ("w000", "Union"),
        ("w001 w005", "Union"),
        ("w001 w005", "Intersection"),
        ("w000 w001 w002", "Intersection"),
        ("w003 w004", "Phrase"),
        ("w001 -w000", "Union"),
        ("+w002 w009", "Union"),
        ('"w001 w002"', "Union"),
    ]:
        assert_parity(idx, bf, q, t)

    # mixed committed + realtime tail
    more = make_docs(rng, 57)
    idx.index_documents(more)
    bf2 = BruteForce(idx, docs + more)
    assert_parity(idx, bf2, "w001 w005", "Union")
    assert_parity(idx, bf2, "w001 w005", "Intersection")
    idx.commit()
    assert_parity(idx, bf2, "w001 w005", "Union")


def test_multi_shard(tmp_index_dir, rng):
    docs = make_docs(rng, 400)
    idx = st.create_index(tmp_index_dir, std_schema(), shard_count=3)
    idx.index_documents(docs)
    idx.commit()
    bf = BruteForce(idx, docs)
    assert_parity(idx, bf, "w002 w007", "Union")
    assert_parity(idx, bf, "w001 w003", "Intersection")
    assert_parity(idx, bf, "w000 -w005", "Union")


def test_delete_update(tmp_index_dir, rng):
    docs = make_docs(rng, 120)
    idx = st.create_index(tmp_index_dir, std_schema(), shard_count=1)
    idx.index_documents(docs)
    idx.commit()
    bf = BruteForce(idx, docs)
    expected = bf.score("w001", "Union")
    victim = next(iter(sorted(expected)))
    idx.delete_document(victim)
    rs = idx.search(st.SearchRequest(query="w001"))
    assert rs.result_count_total == len(expected) - 1
    assert victim not in [r.doc_id for r in rs.results]

    # update = delete + reindex under a new id
    new_id = idx.update_document(victim + 0, {"title": "w059 only", "body": "w059"})
    idx.commit()
    rs = idx.search(st.SearchRequest(query="w059"))
    assert new_id in [r.doc_id for r in rs.results]


def test_reopen(tmp_index_dir, rng):
    docs = make_docs(rng, 150)
    idx = st.create_index(tmp_index_dir, std_schema(), shard_count=2)
    idx.index_documents(docs[:100])
    idx.commit()
    idx.index_documents(docs[100:])  # uncommitted tail
    idx.commit()
    r1 = idx.search(st.SearchRequest(query="w001 w004"))

    idx2 = st.open_index(tmp_index_dir)
    assert idx2.indexed_doc_count == 150
    r2 = idx2.search(st.SearchRequest(query="w001 w004"))
    assert [x.doc_id for x in r1.results] == [x.doc_id for x in r2.results]
    assert r1.result_count_total == r2.result_count_total
    # continue indexing after reopen (partial level rewrite path)
    more = make_docs(rng, 30)
    idx2.index_documents(more)
    idx2.commit()
    bf = BruteForce(idx2, docs + more)
    assert_parity(idx2, bf, "w002 w003", "Union")


def test_get_document_and_fields(tmp_index_dir, rng):
    docs = make_docs(rng, 20)
    idx = st.create_index(tmp_index_dir, std_schema(), shard_count=1)
    idx.index_documents(docs)
    idx.commit()
    d = idx.get_document(7)
    assert d["title"] == docs[7]["title"]
    rs = idx.search(st.SearchRequest(query="w000", fields=["title"]))
    for r in rs.results:
        assert r.doc is not None and set(r.doc) <= {"title"}


def test_empty_query_browse(tmp_index_dir, rng):
    docs = make_docs(rng, 25)
    idx = st.create_index(tmp_index_dir, std_schema(), shard_count=2)
    idx.index_documents(docs)
    idx.commit()
    rs = idx.search(st.SearchRequest(query="", offset=5, length=10))
    assert rs.result_count_total == 25
    assert [r.doc_id for r in rs.results] == list(range(5, 15))


def test_clear(tmp_index_dir, rng):
    docs = make_docs(rng, 40)
    idx = st.create_index(tmp_index_dir, std_schema(), shard_count=1)
    idx.index_documents(docs)
    idx.commit()
    idx.clear()
    assert idx.indexed_doc_count == 0
    rs = idx.search(st.SearchRequest(query="w000"))
    assert rs.result_count_total == 0 and rs.results == []
    idx.index_documents(docs[:10])
    idx.commit()
    assert idx.indexed_doc_count == 10


def test_field_filter(tmp_index_dir):
    idx = st.create_index(tmp_index_dir, std_schema(), shard_count=1)
    idx.index_documents(
        [
            {"title": "alpha beta", "body": "gamma"},
            {"title": "gamma", "body": "alpha"},
        ]
    )
    idx.commit()
    rs = idx.search(st.SearchRequest(query="alpha", field_filter=["title"]))
    assert [r.doc_id for r in rs.results] == [0]
    rs = idx.search(st.SearchRequest(query="alpha", field_filter=["body"]))
    assert [r.doc_id for r in rs.results] == [1]


@pytest.mark.slow
def test_multi_block(tmp_index_dir, rng):
    """Cross the 64K auto-commit boundary: multi-level device scan."""
    n = st.BLOCK_SIZE + 1500
    vocab = [f"w{i:02d}" for i in range(30)]
    docs = [
        {
            "title": f"{vocab[i % 30]} {vocab[(i * 7) % 30]}",
            "body": f"{vocab[(i * 3) % 30]} {vocab[(i * 11) % 30]} filler",
        }
        for i in range(n)
    ]
    idx = st.create_index(tmp_index_dir, std_schema(), shard_count=1)
    idx.index_documents(docs)
    assert idx.shards[0].full_levels == 1  # auto-commit happened
    idx.commit()
    rs = idx.search(st.SearchRequest(query="w01 w07", result_type=st.ResultType.TopkCount))
    # independent count
    expected = sum(
        1
        for d in docs
        if ("w01" in (d["title"] + " " + d["body"]).split())
        or ("w07" in (d["title"] + " " + d["body"]).split())
    )
    assert rs.result_count_total == expected


def test_warmup_cache(tmp_index_dir, rng):
    meta = st.IndexMeta(frequent_words=st.FrequentwordType.Custom,
                        custom_frequent_words=("w000", "w001"))
    docs = make_docs(rng, 150)
    idx = st.create_index(tmp_index_dir, std_schema(), meta=meta)
    idx.index_documents(docs)
    idx.commit()
    assert idx._warmup_cache and len(idx._warmup_cache) == 2
    bf = BruteForce(idx, docs)
    exp = bf.score("w000", "Union")
    rs = idx.search(st.SearchRequest(query="w000"))
    assert rs.result_count_total == len(exp)
    top = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [r.doc_id for r in rs.results] == [g for g, _ in top]
    # uncached multi-term still works
    assert_parity(idx, bf, "w000 w002", "Union")
    # tail present + realtime -> cache bypassed, results stay correct
    idx.index_documents(make_docs(rng, 10))
    rs2 = idx.search(st.SearchRequest(query="w000", realtime=True))
    assert rs2.result_count_total >= rs.result_count_total


def test_dense_term_representation(tmp_path, monkeypatch):
    """Terms above DENSE_MIN postings per block take the dense tf-column
    path (row gather + matmul, no window scatter) — scores/counts must be
    identical to the CSR path."""
    import seekstorm_tpu.lexindex as lexindex_mod

    rng = np.random.default_rng(77)
    docs = []
    for i in range(400):
        words = ["common"] * int(rng.integers(1, 4))   # df 400 >> DENSE_MIN
        words += [f"rare{int(rng.integers(0, 40))}" for _ in range(6)]
        rng.shuffle(words)
        docs.append({"t": " ".join(words)})

    schema = [st.SchemaField("t", st.FieldType.Text, stored=True, indexed=True)]
    ix_csr = st.create_index(tmp_path / "csr", schema)
    ix_csr.index_documents(docs)
    ix_csr.commit()
    assert len(ix_csr.shards[0].lexical.dense_tf) == 0  # all sparse

    monkeypatch.setattr(lexindex_mod, "DENSE_MIN", 64)
    ix_d = st.create_index(tmp_path / "dense", schema)
    ix_d.index_documents(docs)
    ix_d.commit()
    lex = ix_d.shards[0].lexical
    assert len(lex.dense_tf) >= 1, "dense store not built"
    assert (lex.directory.seg_dense >= 0).sum() >= 1

    for q in ["common", "common rare3", "+common +rare5", "common -rare7",
              '"common rare1"', "rare2 rare9"]:
        a = ix_csr.search(st.SearchRequest(
            query=q, result_type=st.ResultType.TopkCount, length=50,
            realtime=False))
        b = ix_d.search(st.SearchRequest(
            query=q, result_type=st.ResultType.TopkCount, length=50,
            realtime=False))
        assert a.result_count_total == b.result_count_total, q
        sa = {r.doc_id: round(r.score, 4) for r in a.results}
        sb = {r.doc_id: round(r.score, 4) for r in b.results}
        assert sa == sb, (q, sa, sb)


def test_phrase_counts_exact_at_scale(tmp_path):
    """Phrase counts are exact with no candidate cliff (phrase.py: host
    posting intersection + vectorized position join; reference gets this
    from position streams, add_result.rs:38-92)."""
    import seekstorm_tpu as st

    schema = [st.SchemaField("body", st.FieldType.Text, stored=True,
                             indexed=True)]
    idx = st.create_index(tmp_path / "ix", schema, shard_count=2)
    docs = []
    n_adj = 0
    for i in range(3000):
        if i % 3 == 0:
            docs.append({"body": f"alpha beta filler{i}"})      # adjacent
            n_adj += 1
        elif i % 3 == 1:
            docs.append({"body": f"alpha filler{i} beta"})      # apart
        else:
            docs.append({"body": f"beta alpha filler{i}"})      # reversed
    idx.index_documents(docs)
    idx.commit()
    rs = idx.search(st.SearchRequest(query='"alpha beta"',
                                     result_type=st.ResultType.TopkCount))
    assert rs.count_exact
    assert rs.result_count_total == n_adj
    # negation + phrase, and required extra term
    rs = idx.search(st.SearchRequest(query='"alpha beta" +filler0',
                                     result_type=st.ResultType.TopkCount))
    assert rs.result_count_total == 1 and rs.count_exact
    rs = idx.search(st.SearchRequest(query='"alpha beta" -filler0',
                                     result_type=st.ResultType.TopkCount))
    assert rs.result_count_total == n_adj - 1 and rs.count_exact
    # realtime tail phrase docs count too
    idx.index_document({"body": "alpha beta tail"})
    idx.index_document({"body": "beta alpha tail"})
    rs = idx.search(st.SearchRequest(query='"alpha beta"', realtime=True,
                                     result_type=st.ResultType.TopkCount))
    assert rs.result_count_total == n_adj + 1 and rs.count_exact


def test_phrase_page_no_candidate_cliff(tmp_path):
    """A phrase match ranked below the device's AND-candidate window must
    still appear in Topk pages without n-gram indexing (reference parity:
    the phrase check runs on every intersected doc, add_result.rs:38-92;
    a page is never silently short while matches exist)."""
    import seekstorm_tpu as st

    schema = [st.SchemaField("title", st.FieldType.Text, indexed=True,
                             boost=10.0),
              st.SchemaField("body", st.FieldType.Text, indexed=True)]
    idx = st.create_index(tmp_path / "ix", schema, shard_count=1)
    filler = " ".join(f"f{j:02d}" for j in range(30))
    # 600 high-scoring docs where the terms co-occur NON-adjacently
    docs = [{"title": "alpha gap beta", "body": f"alpha {filler} beta"}
            for _ in range(600)]
    # the ONLY adjacent occurrence, buried in a long unboosted body
    docs.append({"title": "none",
                 "body": f"{filler} {filler} alpha beta {filler} {filler}"})
    victim = len(docs) - 1
    idx.index_documents(docs)
    idx.commit()

    # sanity: the victim ranks far below the AND-candidate window
    rs_and = idx.search(st.SearchRequest(query="alpha beta", length=10))
    assert victim not in [r.doc_id for r in rs_and.results]

    for rt in (st.ResultType.Topk, st.ResultType.TopkCount):
        rs = idx.search(st.SearchRequest(
            query='"alpha beta"', length=10, result_type=rt))
        assert [r.doc_id for r in rs.results] == [victim], (rt, rs.results)
        if rt == st.ResultType.TopkCount:
            assert rs.result_count_total == 1
