"""Tokenizer / analysis unit tests."""

import numpy as np

from seekstorm_tpu.schema import StemmerType, StopwordType, TokenizerType
from seekstorm_tpu.tokenizer import (
    Analyzer,
    fold_text,
    parse_query,
    porter_stem,
    tokenize_text,
)
from seekstorm_tpu.utils import (
    DOCUMENT_LENGTH_COMPRESSION,
    byte4_to_int,
    compress_lengths,
    int_to_byte4,
    term_hash,
)


def test_tokenizer_types():
    text = "Hello, World! Don't stop 123 café"
    assert tokenize_text(text, TokenizerType.AsciiAlphabetic) == [
        "hello", "world", "don", "t", "stop", "caf",
    ]
    assert tokenize_text(text, TokenizerType.UnicodeAlphanumeric) == [
        "hello", "world", "don", "t", "stop", "123", "café",
    ]
    assert tokenize_text(text, TokenizerType.UnicodeAlphanumericFolded) == [
        "hello", "world", "dont", "stop", "123", "cafe",
    ]
    assert tokenize_text(text, TokenizerType.Whitespace) == [
        "Hello,", "World!", "Don't", "stop", "123", "café",
    ]
    assert tokenize_text(text, TokenizerType.WhitespaceLowercase) == [
        "hello,", "world!", "don't", "stop", "123", "café",
    ]


def test_folding():
    assert fold_text("Ærøskøbing œuvre ß") == "Ærøskøbing oeuvre ss".replace(
        "Æ", "AE"
    ).replace("ø", "o")
    assert fold_text("naïve résumé") == "naive resume"


def test_porter_stem():
    assert porter_stem("running") == "run"
    assert porter_stem("caresses") == "caress"
    assert porter_stem("ponies") == "poni"
    assert porter_stem("relational") == "relat"
    assert porter_stem("sky") == "sky"


def test_analyzer_stopwords_positions():
    a = Analyzer(
        TokenizerType.UnicodeAlphanumeric,
        StemmerType.Null,
        StopwordType.English,
    )
    tp = a.term_positions("the quick fox and the lazy dog")
    assert "the" not in tp and "and" not in tp
    assert tp["quick"] == [0] and tp["fox"] == [1]
    assert tp["lazy"] == [2] and tp["dog"] == [3]


def test_parse_query_operators():
    a = Analyzer(TokenizerType.UnicodeAlphanumeric)
    pq = parse_query('apple +banana -cherry "date elderberry"', a)
    terms = {t.term: t for t in pq.terms}
    assert not terms["apple"].required and not terms["apple"].negated
    assert terms["banana"].required
    assert terms["cherry"].negated
    assert terms["date"].phrase_id == 0 and terms["elderberry"].phrase_id == 0
    assert len(pq.phrases) == 1 and len(pq.phrases[0]) == 2


def test_smallfloat_roundtrip():
    for i in [0, 1, 23, 24, 31, 32, 100, 1000, 65_535, 2**20]:
        b = int_to_byte4(i)
        v = byte4_to_int(b)
        assert v <= i
        # next byte decompresses above i
        if b < 255:
            assert byte4_to_int(b + 1) > i
    arr = np.array([0, 1, 23, 24, 31, 32, 100, 1000, 65_535, 2**20])
    vec = compress_lengths(arr)
    for i, x in enumerate(arr):
        assert vec[i] == int_to_byte4(int(x))
    assert len(DOCUMENT_LENGTH_COMPRESSION) == 256


def test_term_hash_stability():
    assert term_hash("hello") == term_hash("hello")
    assert term_hash("hello") != term_hash("world")


def test_zh_dictionary_segmentation():
    """CJK runs segment by max word probability (seed lexicon); unknown
    runs fall back to single characters; Latin passes through."""
    toks = tokenize_text("中文测试 english 日本語text",
                         TokenizerType.UnicodeAlphanumericZH)
    # "中" and "文" are seed words; the unknown chars split singly
    assert "english" in toks and "text" in toks
    assert "".join(t for t in toks if t not in ("english", "text")) == \
        "中文测试日本語"

    toks2 = tokenize_text("我们喜欢搜索引擎",
                          TokenizerType.UnicodeAlphanumericZH)
    assert toks2 == ["我们", "喜欢", "搜索引擎"]


def test_zh_segmenter_direct():
    from seekstorm_tpu.word_segmentation import WordSegmenter

    seg = WordSegmenter()
    seg.load_pairs([("天气", 100), ("天", 50), ("气", 40), ("很", 60),
                    ("好", 70)])
    assert seg.segment("天气很好") == ["天气", "很", "好"]
    # unknown chars become singles
    assert seg.segment("天气仌") == ["天气", "仌"]
    assert seg.segment("") == []


def test_zh_full_dictionary_segmentation():
    """The full 349K-entry public zh_CN frequency dictionary loads and
    produces known-good splits (reference embeds the same-derivation list,
    word_segmentation.rs:9-10)."""
    from seekstorm_tpu.word_segmentation import (full_dictionary_path,
                                                 get_segmenter)

    assert full_dictionary_path() is not None, "full zh dictionary missing"
    seg = get_segmenter()
    assert len(seg.logp) > 300_000
    # classic segmentation-ambiguity cases
    assert seg.segment("研究生命的起源") == ["研究", "生命", "的", "起源"]
    assert seg.segment("互联网搜索引擎技术的发展") == [
        "互联网", "搜索引擎", "技术", "的", "发展"]
    assert seg.segment("中华人民共和国成立于一九四九年") == [
        "中华人民共和国", "成立", "于", "一九四九年"]


def test_multilingual_stopword_and_frequent_lists():
    """German/French/Spanish Stopword + Frequentword variants (reference
    index.rs:1239-1281, assets/dictionaries/frequent_*.txt: one
    function-word list per language feeds both)."""
    from seekstorm_tpu.schema import StopwordType, FrequentwordType, IndexMeta
    from seekstorm_tpu.tokenizer import stopword_set
    from seekstorm_tpu.ngram import frequent_word_set

    de = stopword_set(StopwordType.German)
    assert {"der", "die", "das", "und", "ist"} <= de
    fr = stopword_set(StopwordType.French)
    assert {"le", "la", "les", "et", "est"} <= fr
    es = stopword_set(StopwordType.Spanish)
    assert {"el", "la", "los", "y", "es"} <= es
    # content words must NOT be swallowed
    assert "haus" not in de and "maison" not in fr and "casa" not in es

    for ft, probe in ((FrequentwordType.German, "und"),
                      (FrequentwordType.French, "et"),
                      (FrequentwordType.Spanish, "y")):
        meta = IndexMeta(frequent_words=ft)
        fw = frequent_word_set(meta)
        assert probe in fw and len(fw) > 100


def test_german_stopword_index_roundtrip(tmp_path):
    import seekstorm_tpu as st
    from seekstorm_tpu.schema import StopwordType

    schema = [st.SchemaField("b", st.FieldType.Text, indexed=True)]
    meta = st.IndexMeta(stop_words=StopwordType.German)
    idx = st.create_index(tmp_path / "ix", schema, meta=meta, shard_count=1)
    idx.index_document({"b": "der hund und die katze"})
    idx.commit()
    assert idx.search(st.SearchRequest(query="hund")).result_count == 1
    # stopwords are never indexed -> pure-stopword query matches nothing
    assert idx.search(st.SearchRequest(query="und")).result_count == 0
