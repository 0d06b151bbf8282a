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
