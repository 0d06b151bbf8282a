"""Spelling correction (SymSpell) + query auto-completion (pruning radix
trie) + QueryRewriting modes."""

import seekstorm_tpu as st
from seekstorm_tpu.rewrite import (
    PruningRadixTrie,
    SymSpell,
    damerau_levenshtein,
)


def test_damerau_levenshtein():
    assert damerau_levenshtein("kitten", "sitting") == 3
    assert damerau_levenshtein("abcd", "acbd") == 1  # transposition
    assert damerau_levenshtein("same", "same") == 0


def test_symspell_lookup():
    s = SymSpell(max_edit=2)
    for w, c in [("apple", 100), ("apply", 40), ("ample", 10), ("banana", 50)]:
        s.add(w, c)
    out = s.lookup("aple", length=3)
    assert out[0][0] == "apple"          # closest + most frequent first
    assert s.lookup("apple")[0] == ("apple", 0, 100)
    assert s.lookup("zzz") == []
    fixed, changed = s.lookup_compound(["aple", "banana"])
    assert fixed == ["apple", "banana"] and changed


def test_pruning_radix_trie():
    t = PruningRadixTrie()
    for term, w in [("apple pie", 50), ("apple", 100), ("apple cider", 30),
                    ("application", 70), ("banana", 10)]:
        t.add(term, w)
    out = t.top_k("app", 3)
    assert out == [("apple", 100), ("application", 70), ("apple pie", 50)]
    assert t.top_k("zzz", 3) == []
    assert t.top_k("banana", 1) == [("banana", 10)]


def make_index(tmp, spelling=True, completion=True):
    meta = st.IndexMeta(
        spelling_correction=st.SpellingCorrection(
            max_dictionary_edit_distance=2, count_threshold=1),
        query_completion=st.QueryCompletion(max_completion_entries=10_000),
    )
    schema = [st.SchemaField("t", st.FieldType.Text, stored=True, indexed=True,
                             dictionary_source=True, completion_source=True)]
    idx = st.create_index(tmp, schema, meta=meta)
    return idx


def test_query_rewriting_end_to_end(tmp_index_dir):
    idx = make_index(tmp_index_dir)
    # force sampling: SymSpell feeds only hash&7==0 terms; use many docs
    # dictionary sampling keeps 1/8 of distinct terms (hash & 7 == 0,
    # reference index_posting.rs:25-49) — use a vocabulary large enough
    # that some terms pass the filter
    words = [f"wordstem{i:03d}" for i in range(80)]
    for i in range(160):
        idx.index_document({"t": " ".join(words[(i + j) % len(words)]
                                          for j in range(4))})
    idx.commit()
    assert idx.spell is not None and len(idx.spell) > 0
    assert idx.completions is not None and len(idx.completions) > 0

    # pick a word that made it into the dictionary
    word = next(iter(idx.spell.words))
    typo = word[:-1] + ("x" if word[-1] != "x" else "y")

    # SuggestOnly
    rs = idx.search(st.SearchRequest(
        query=typo,
        query_rewriting={"SuggestOnly": {"correct": 2, "distance": 2,
                                         "complete": 2}}))
    assert word in " ".join(rs.suggestions)
    assert rs.results == []

    # SearchRewrite: searches the corrected query
    rs = idx.search(st.SearchRequest(
        query=typo, query_type_default=st.QueryType.Union,
        query_rewriting={"SearchRewrite": {"correct": 2, "distance": 2}}))
    assert rs.result_count_total > 0

    # SearchSuggest: original query searched (no hits), suggestions present
    rs = idx.search(st.SearchRequest(
        query=typo, query_type_default=st.QueryType.Union,
        query_rewriting={"SearchSuggest": {"correct": 2, "distance": 2}}))
    assert rs.result_count_total == 0
    assert rs.suggestions

    # completion
    prefix = word[:4]
    rs = idx.search(st.SearchRequest(
        query=prefix,
        query_rewriting={"SuggestOnly": {"complete": 2}}))
    assert any(x.startswith(prefix) for x in rs.suggestions)


def test_multiterm_completion(tmp_index_dir):
    """'new yo'-style inputs: the last term completes in the context of
    the preceding terms (reference search.rs:1254-1314) — the window is
    the last <=3 terms, earlier terms are re-prepended, and a trailing
    space completes the NEXT term."""
    idx = make_index(tmp_index_dir, spelling=False)
    for _ in range(30):
        idx.index_document({"t": "new york city subway map"})
        idx.index_document({"t": "new york yankees schedule today"})
        idx.index_document({"t": "new jersey transit"})
    idx.commit()

    # last-term completion in context
    rs = idx.search(st.SearchRequest(
        query="new yo",
        query_rewriting={"SuggestOnly": {"complete": 2, "length": 5}}))
    assert any(s.startswith("new york") for s in rs.suggestions), \
        rs.suggestions

    # window beyond 3 terms: prefix re-prepended verbatim
    rs = idx.search(st.SearchRequest(
        query="best new york ci",
        query_rewriting={"SuggestOnly": {"complete": 2, "length": 5}}))
    assert any(s.startswith("best new york cit") for s in rs.suggestions), \
        rs.suggestions

    # trailing space completes the next term
    rs = idx.search(st.SearchRequest(
        query="york city ",
        query_rewriting={"SuggestOnly": {"complete": 2, "length": 5}}))
    assert any("city subway" in s for s in rs.suggestions), rs.suggestions


def test_rewrite_persistence(tmp_index_dir):
    idx = make_index(tmp_index_dir)
    for i in range(40):
        idx.index_document({"t": "persistent dictionary terms here"})
    idx.commit()
    n_words = len(idx.spell)
    n_comp = len(idx.completions)
    assert (tmp_index_dir / "dictionary.csv").exists()
    idx2 = st.open_index(tmp_index_dir)
    assert len(idx2.spell) == n_words
    assert len(idx2.completions) == n_comp


def test_compound_split_merge():
    """lookup_compound segments unknown run-together terms and merges
    wrongly split ones (reference lookup_compound_vec, search.rs:1324)."""
    from seekstorm_tpu.rewrite import SymSpell

    s = SymSpell()
    for w, c in [("new", 500), ("york", 300), ("city", 400),
                 ("quick", 600), ("brown", 450), ("fox", 200),
                 ("the", 900)]:
        s.add(w, c)

    # split: "newyork" is not a word, "new"+"york" both are
    out, changed = s.lookup_compound(["newyork", "city"])
    assert changed and out == ["new", "york", "city"], out

    # merge + re-split: "qui ckbrown" -> "quickbrown" -> "quick brown"
    out, changed = s.lookup_compound(["qui", "ckbrown", "fox"])
    assert changed
    assert " ".join(out) == "quick brown fox", out

    # known terms never touched
    out, changed = s.lookup_compound(["the", "quick", "fox"])
    assert not changed and out == ["the", "quick", "fox"]

    # plain single-term correction still works
    out, changed = s.lookup_compound(["quck"])
    assert changed and out == ["quick"]


def test_radix_trie_compression_and_speed():
    """Path compression: node count tracks TERM count (<= 2n), not total
    characters; iterative best-first top_k stays sub-ms at scale."""
    import time

    import numpy as np

    from seekstorm_tpu.rewrite import PruningRadixTrie

    rng = np.random.default_rng(3)
    t = PruningRadixTrie(max_entries=2_000_000)
    # 60K multi-word completions with heavy shared prefixes (the realistic
    # QAC shape: n-gram phrases over a zipf vocabulary)
    vocab = [f"term{i:04d}" for i in range(400)]
    n = 60_000
    total_chars = 0
    for i in range(n):
        words = rng.choice(vocab, size=int(rng.integers(1, 4)))
        phrase = " ".join(words)
        t.add(phrase, int(rng.integers(1, 1000)))
        total_chars += len(phrase)
    # a per-character trie allocates ~one node per distinct char position;
    # the radix trie must be bounded by terms, >= 10x below characters
    assert t.node_count <= 2 * t.size + 1, (t.node_count, t.size)
    assert total_chars / t.node_count >= 10, (total_chars, t.node_count)

    # correctness vs brute force on a shared prefix
    import heapq as _h
    pref = vocab[0][:6]
    brute = sorted(
        ((w, c) for w, c in t._terms.items() if w.startswith(pref)),
        key=lambda x: -x[1])[:10]
    got = t.top_k(pref, 10)
    assert [w for w, _ in got] == [w for w, _ in brute] or \
        sorted(c for _, c in got) == sorted(c for _, c in brute)

    t0 = time.perf_counter()
    for _ in range(100):
        t.top_k(vocab[10][:5], 10)
    dt = (time.perf_counter() - t0) / 100
    assert dt < 5e-3, f"top_k too slow: {dt*1e3:.2f} ms"
