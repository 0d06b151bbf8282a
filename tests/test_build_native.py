"""Native committed-index build fast path (st_build_impacts /
st_build_dev): the fused C++ passes must be BIT-IDENTICAL to the numpy
formulation — impacts, per-term maxima, bitmap selection, compacted CSR,
stash contents and every directory field (commit-speed work, r3 verdict
next-step #4)."""

import numpy as np
import pytest

import seekstorm_tpu as st
from seekstorm_tpu import lexindex, native


pytestmark = pytest.mark.skipif(
    native.load() is None or not hasattr(native.load(), "st_build_impacts"),
    reason="native library unavailable",
)

_FIELDS = ["pl_docid", "pl_tf", "pl_impact", "comp", "dense_tf",
           "bitmaps", "sat1", "dev_docid", "dev_imp"]
_DIR_FIELDS = ["hash", "df", "seg_start", "seg_block", "seg_offset",
               "seg_len", "seg_max_impact", "seg_dense", "seg_dev_offset",
               "seg_dev_len", "seg_bitmap", "seg_stash_off",
               "seg_stash_len"]


def _assert_same_build(levels, boosts, monkeypatch, expand_ngrams=False):
    a = lexindex.build_shard_lexical(levels, boosts,
                                     expand_ngrams=expand_ngrams)
    monkeypatch.setenv("SEEKSTORM_TPU_NO_NATIVE", "1")
    b = lexindex.build_shard_lexical(levels, boosts,
                                     expand_ngrams=expand_ngrams)
    monkeypatch.delenv("SEEKSTORM_TPU_NO_NATIVE")
    for f in _FIELDS:
        np.testing.assert_array_equal(
            getattr(a, f), getattr(b, f), err_msg=f, strict=True)
    for f in _DIR_FIELDS:
        np.testing.assert_array_equal(
            getattr(a.directory, f), getattr(b.directory, f),
            err_msg="directory." + f, strict=True)
    assert a.avg_len == b.avg_len and a.doc_count == b.doc_count


def test_native_build_parity(tmp_path, monkeypatch):
    """Multi-level, multi-field corpus with bitmap-qualifying terms
    (>= BITMAP_MIN plain postings), tf>=2 remainders and boosts."""
    rng = np.random.default_rng(5)
    schema = [
        st.SchemaField("title", st.FieldType.Text, stored=True,
                       indexed=True, boost=10.0),
        st.SchemaField("body", st.FieldType.Text, stored=True,
                       indexed=True),
    ]
    idx = st.create_index(tmp_path / "ix", schema, shard_count=1)
    vocab = [f"w{i:03d}" for i in range(300)]
    docs = []
    for i in range(3000):
        # 'common' appears once in body for most docs (plain, bitmap
        # class); zipf tail gives tf>=2 and title hits
        body = ["common"] if i % 2 == 0 else []
        body += list(rng.choice(vocab, 12))
        docs.append({
            "title": " ".join(rng.choice(vocab, 3)),
            "body": " ".join(body),
        })
    monkeypatch.setattr(lexindex, "BITMAP_MIN", 64)
    idx.index_documents(docs)
    idx.commit()
    idx.ensure_loaded()
    levels = idx.shards[0].lexical.levels
    _assert_same_build(levels, idx.boosts_or_default(), monkeypatch)


def test_native_build_parity_ngram_expanded(tmp_path, monkeypatch):
    """expand_ngrams appends virtual postings AFTER the native impact
    pass — the plain mask must be recomputed over the final arrays."""
    rng = np.random.default_rng(9)
    schema = [st.SchemaField("body", st.FieldType.Text, stored=True,
                             indexed=True)]
    meta = st.IndexMeta(ngram_indexing=1 | 2 | 4 | 8)
    idx = st.create_index(tmp_path / "ix", schema, shard_count=1,
                          meta=meta)
    vocab = ["the", "of", "quick", "fox", "lazy", "dog"]
    docs = [{"body": " ".join(rng.choice(vocab, 8))} for _ in range(500)]
    monkeypatch.setattr(lexindex, "BITMAP_MIN", 32)
    idx.index_documents(docs)
    idx.commit()
    idx.ensure_loaded()
    lex = idx.shards[0].lexical
    _assert_same_build(lex.levels, idx.boosts_or_default(), monkeypatch,
                       expand_ngrams=True)
