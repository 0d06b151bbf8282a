"""On-disk lexical build cache (lexindex.build_shard_lexical_cached):
reopen loads the commit-time artifact instead of rebuilding; the
fingerprint invalidates on any input the build depends on."""

import json

import numpy as np

import seekstorm_tpu as st
from seekstorm_tpu import lexindex


def _build(tmp_path):
    rng = np.random.default_rng(21)
    vocab = [f"w{i:02d}" for i in range(40)]
    schema = [st.SchemaField("body", st.FieldType.Text, stored=True,
                             indexed=True)]
    idx = st.create_index(tmp_path / "ix", schema, shard_count=1)
    docs = [{"body": " ".join(rng.choice(vocab, 10))} for _ in range(400)]
    idx.index_documents(docs)
    idx.commit()
    return idx


def _res(idx, q="w01 w02"):
    rs = idx.search(st.SearchRequest(query=q, length=10, realtime=False))
    return [(r.doc_id, round(float(r.score), 4)) for r in rs.results]


def test_cache_roundtrip(tmp_path):
    idx = _build(tmp_path)
    want = _res(idx)
    cpath = idx.shards[0].path / "lexcache.npz"
    assert cpath.exists(), "commit did not write the lexical cache"
    del idx

    idx2 = st.open_index(tmp_path / "ix")
    idx2.ensure_loaded()
    # loaded-from-cache state matches a fresh rebuild byte-for-byte
    lex = idx2.shards[0].lexical
    fresh = lexindex.build_shard_lexical(
        lex.levels, idx2.boosts_or_default())
    np.testing.assert_array_equal(lex.dev_docid, fresh.dev_docid)
    np.testing.assert_array_equal(lex.dev_imp, fresh.dev_imp)
    np.testing.assert_array_equal(lex.bitmaps, fresh.bitmaps)
    np.testing.assert_array_equal(lex.directory.hash, fresh.directory.hash)
    np.testing.assert_array_equal(lex.directory.seg_dev_len,
                                  fresh.directory.seg_dev_len)
    assert _res(idx2) == want


def test_cache_invalidation(tmp_path, monkeypatch):
    idx = _build(tmp_path)
    want = _res(idx)
    sp = idx.shards[0].path
    del idx
    # stale fingerprint (layout constant changed) -> rebuild, same results
    monkeypatch.setattr(lexindex, "BITMAP_MIN", 8)
    fp = json.loads((sp / "lexcache.json").read_text())
    assert fp["bitmap_min"] != 8
    idx2 = st.open_index(tmp_path / "ix")
    idx2.ensure_loaded()
    assert _res(idx2) == want
    # cache refreshed under the new fingerprint
    assert json.loads((sp / "lexcache.json").read_text())["bitmap_min"] == 8


def test_cache_corruption_falls_back(tmp_path):
    idx = _build(tmp_path)
    want = _res(idx)
    sp = idx.shards[0].path
    del idx
    (sp / "lexcache.npz").write_bytes(b"garbage")
    idx2 = st.open_index(tmp_path / "ix")
    idx2.ensure_loaded()
    assert _res(idx2) == want


def test_cache_tracks_new_commits(tmp_path):
    idx = _build(tmp_path)
    idx.index_documents([{"body": "w01 fresh unique"}])
    idx.commit()
    want = _res(idx, "unique")
    assert want
    del idx
    idx2 = st.open_index(tmp_path / "ix")
    assert _res(idx2, "unique") == want
