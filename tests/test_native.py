"""Native (C++) host library parity: tokenizer must be bit-identical to the
Python analyzer; native and Python ingestion must produce identical packed
levels and identical search results."""

import hashlib
import os

import numpy as np
import pytest

import seekstorm_tpu as st
from seekstorm_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


UNICODE_SAMPLES = [
    "Hello, World! Don't stop 123 café",
    "Ærøskøbing œuvre ß STRASSE İstanbul",
    "naïve résumé — em–dash…ellipsis",
    "ᎠᎡᎢ ქართული 中文测试 日本語テスト 한국어",
    "ℕ𝔸𝕋𝕌ℝ𝔸𝕃 ﬁﬂ ﬀ ligatures ½ ⅓ fractions",
    "tabs\tnewlines\nand nbsp emspace",
    "ZA̡͊͠͝LGΌ ISͮ̂҉̯͈͕̹̘ TO͇̹̺ͅƝ̴ȳ̳",
    "mixed1234numbers and_underscores_split",
    "ΑΒΓΔΕ ελληνικά РУССКИЙ русский",
    "ñ ç ü ö ä å ø æ þ ð",
]


def make_analyzer_pair(ttype, stemmer=st.StemmerType.Null,
                       stop=st.StopwordType.Null):
    from seekstorm_tpu.tokenizer import Analyzer

    class FakeIndex:
        pass

    idx = FakeIndex()
    idx.meta = st.IndexMeta(tokenizer=ttype, stemmer=stemmer, stop_words=stop)
    idx.analyzer = Analyzer(ttype, stemmer, stop)
    idx._frequent_words = frozenset()
    idx._dict_field_ids = []
    idx.spell = None
    idx.completions = None
    idx._completion_fields = []
    idx.indexed_fields = []
    idx._synonym_map = {}
    cfg = native.NativeConfig(idx)
    return idx.analyzer, cfg


@pytest.mark.parametrize("ttype", [
    st.TokenizerType.AsciiAlphabetic,
    st.TokenizerType.UnicodeAlphanumeric,
    st.TokenizerType.UnicodeAlphanumericFolded,
    st.TokenizerType.Whitespace,
    st.TokenizerType.WhitespaceLowercase,
])
def test_tokenizer_parity(ttype):
    analyzer, cfg = make_analyzer_pair(ttype)
    for text in UNICODE_SAMPLES:
        assert cfg.tokenize(text) == analyzer.analyze(text), (ttype, text)


def test_tokenizer_parity_stemmer_stopwords():
    analyzer, cfg = make_analyzer_pair(
        st.TokenizerType.UnicodeAlphanumeric,
        st.StemmerType.English, st.StopwordType.English,
    )
    texts = [
        "the running dogs are relational caresses ponies",
        "nationalization of the industries was controversial",
    ]
    for t in texts:
        assert cfg.tokenize(t) == analyzer.analyze(t), t


def test_ingestion_parity(tmp_path, rng, monkeypatch):
    """Native and Python ingestion write byte-identical packed levels."""
    from tests.test_lexical import make_docs, std_schema

    docs = make_docs(rng, 120)

    idx_n = st.create_index(tmp_path / "nat", std_schema())
    assert idx_n._native
    idx_n.index_documents(docs)
    idx_n.commit()

    monkeypatch.setenv("SEEKSTORM_TPU_NO_NATIVE", "1")
    native._TRIED = False
    native._LIB = None
    idx_p = st.create_index(tmp_path / "py", std_schema())
    assert not idx_p._native
    idx_p.index_documents(docs)
    idx_p.commit()
    monkeypatch.delenv("SEEKSTORM_TPU_NO_NATIVE")
    native._TRIED = False
    native._LIB = None

    for f in ["term_hash.npy", "term_offset.npy", "doclen.npy"]:
        a = (tmp_path / "nat" / "shard_0" / "level_0" / f).read_bytes()
        b = (tmp_path / "py" / "shard_0" / "level_0" / f).read_bytes()
        assert hashlib.md5(a).hexdigest() == hashlib.md5(b).hexdigest(), f
    # postings: the native run wrote the compact varint stream
    # (postings.bin), the forced-Python run fell back to fixed-width
    # .npy — decode the stream and compare the logical content
    from seekstorm_tpu.lexindex import CommittedLevel

    la = CommittedLevel.load(tmp_path / "nat" / "shard_0" / "level_0")
    lb = CommittedLevel.load(tmp_path / "py" / "shard_0" / "level_0")
    np.testing.assert_array_equal(np.asarray(la.docid), np.asarray(lb.docid))
    np.testing.assert_array_equal(np.asarray(la.tf), np.asarray(lb.tf))
    np.testing.assert_array_equal(np.asarray(la.pos), np.asarray(lb.pos))


def test_native_realtime_and_phrase(tmp_path, rng):
    from tests.test_lexical import BruteForce, assert_parity, make_docs, std_schema

    docs = make_docs(rng, 150)
    idx = st.create_index(tmp_path / "ix", std_schema())
    idx.index_documents(docs[:100])
    idx.commit()
    idx.index_documents(docs[100:])
    bf = BruteForce(idx, docs)
    # 2% tolerance: the engine (like the reference, commit.rs:321) updates
    # the average doc length only at commit, while the brute-force oracle
    # averages over all docs including the uncommitted tail
    assert_parity(idx, bf, "w001 w004", "Union", tol=2e-2)
    assert_parity(idx, bf, "w002 w003", "Intersection", tol=2e-2)
    assert_parity(idx, bf, "w001 w002", "Phrase", tol=2e-2)


def test_native_synonyms_and_ngrams(tmp_path):
    meta = st.IndexMeta(ngram_indexing=1 | 2, frequent_words=st.FrequentwordType.English)
    idx = st.create_index(
        tmp_path / "ix",
        [st.SchemaField("t", st.FieldType.Text, stored=True, indexed=True)],
        meta=meta,
        synonyms=[{"terms": ["car", "automobile"], "multiway": True}],
    )
    assert idx._native
    idx.index_documents([{"t": "the car of the year"}, {"t": "a bike"}])
    idx.commit()
    r = idx.search(st.SearchRequest(query="automobile"))
    assert [x.doc_id for x in r.results] == [0]
    r = idx.search(st.SearchRequest(query='"the car"'))
    assert [x.doc_id for x in r.results] == [0]
    r = idx.search(st.SearchRequest(query='"car of the year"'))
    assert [x.doc_id for x in r.results] == [0]


def test_native_zh_segmentation_parity_and_ingest(tmp_path):
    """The C++ ZH segmenter (zh_segment, seekstorm_native.cpp) matches the
    Python DP byte-for-byte and serves the native ingest path end-to-end
    (reference word_segmentation.rs:95-190 + tokenizer.rs:306)."""
    import seekstorm_tpu as st
    from seekstorm_tpu.schema import StemmerType, TokenizerType
    from seekstorm_tpu.tokenizer import Analyzer
    from seekstorm_tpu.word_segmentation import resolve_dict_path

    if resolve_dict_path() is None:
        import pytest

        pytest.skip("no zh dictionary available")

    schema = [st.SchemaField("body", st.FieldType.Text, stored=True,
                             indexed=True)]
    meta = st.IndexMeta(tokenizer=TokenizerType.UnicodeAlphanumericZH)
    idx = st.create_index(tmp_path / "ix", schema, meta=meta, shard_count=1)
    assert idx._native, "ZH should ride the native path with a dictionary"

    # tokenizer parity: native vs Python analyzer
    a = Analyzer(TokenizerType.UnicodeAlphanumericZH, StemmerType.Null)
    cfg = idx._get_native_cfg()
    for t in ["研究生命的起源", "互联网搜索引擎abc技术的发展",
              "今天天气真好123我们去公园散步"]:
        assert cfg.tokenize(t) == a.analyze(t)

    idx.index_documents([
        {"body": "互联网搜索引擎技术的发展"},
        {"body": "今天天气真好我们去公园散步"},
        {"body": "研究生命的起源"},
    ])
    idx.commit()
    rs = idx.search(st.SearchRequest(query="搜索引擎"))
    assert rs.result_count == 1
    rs = idx.search(st.SearchRequest(query="生命 起源",
                                     query_type_default=st.QueryType.Intersection))
    assert rs.result_count == 1
    # multi-word query segments the same way at query time
    rs = idx.search(st.SearchRequest(query="公园散步"))
    assert rs.result_count == 1


def test_threaded_ingest_realtime_search_stress(tmp_path):
    """Concurrency hygiene (SURVEY §5): realtime searches (which read the
    native accumulator with the GIL released) racing parallel ingest must
    neither crash nor return malformed pages.  StAccum serializes writers
    vs readers with a shared_mutex (seekstorm_native.cpp)."""
    import threading

    schema = [st.SchemaField("body", st.FieldType.Text, indexed=True)]
    idx = st.create_index(tmp_path / "ix", schema, shard_count=2)

    errs: list = []
    stop = threading.Event()

    def searcher():
        try:
            while not stop.is_set():
                rs = idx.search(st.SearchRequest(
                    query="common", length=10, realtime=True))
                assert rs.result_count >= 0
                for r in rs.results:
                    assert r.doc_id >= 0
        except Exception:  # pragma: no cover - failure reporting
            import traceback
            errs.append(traceback.format_exc())

    def ingester(seed):
        try:
            rng = np.random.default_rng(seed)
            for i in range(40):
                idx.index_documents([
                    {"body": f"common w{int(rng.integers(0, 50)):03d} "
                             f"filler{i}"}
                    for _ in range(25)
                ])
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=ingester, args=(s,))
               for s in range(2)]
    threads += [threading.Thread(target=searcher) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads[:2]:
        t.join()
    stop.set()
    for t in threads[2:]:
        t.join()
    if errs:
        import sys
        print("\n".join(errs), file=sys.stderr)
    assert not errs, errs
    idx.commit()
    rs = idx.search(st.SearchRequest(
        query="common", length=10, realtime=True,
        result_type=st.ResultType.TopkCount))
    assert rs.result_count_total == 2 * 40 * 25


def test_tsan_stress_binary():
    """Run the ThreadSanitizer stress driver once per round (SURVEY §5
    sanitizers row).  Skipped when g++ or the sources are unavailable;
    the binary exits non-zero on a TSAN report or a lost update."""
    import shutil as _shutil
    import subprocess
    from pathlib import Path

    if os.environ.get("SEEKSTORM_TPU_SKIP_TSAN"):
        pytest.skip("explicitly skipped")
    if _shutil.which("g++") is None:
        pytest.skip("no g++")
    nat = Path(st.__file__).resolve().parent.parent / "native"
    if not (nat / "stress_tsan.cpp").exists():
        pytest.skip("stress driver sources absent")
    r = subprocess.run(["make", "-C", str(nat), "tsan"],
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "WARNING: ThreadSanitizer" not in r.stdout + r.stderr, (
        r.stdout[-3000:] + r.stderr[-3000:])
