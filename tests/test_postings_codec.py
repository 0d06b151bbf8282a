"""Compact durable posting codec (native st_pack_postings/st_decode):
round-trip exactness, on-disk size, and end-to-end reopen through the
public API (reference analog: varint positions + per-block posting form
choice, compress_postinglist.rs:240-330,949)."""

import numpy as np
import pytest

import seekstorm_tpu as st
from seekstorm_tpu import native as native_mod


pytestmark = pytest.mark.skipif(native_mod.load() is None,
                                reason="native library unavailable")


def _random_level(rng, T=40, F=2, max_docs=300):
    offsets = [0]
    docids, tfs, poss = [], [], []
    for _ in range(T):
        n = int(rng.integers(1, 30))
        ids = np.sort(rng.choice(max_docs, n, replace=False))
        for d in ids:
            row = np.zeros(F, np.uint16)
            nf = int(rng.integers(1, F + 1))
            for f in rng.choice(F, nf, replace=False):
                row[f] = int(rng.integers(1, 5))
            docids.append(d)
            tfs.append(row)
            for f in range(F):
                if row[f]:
                    p = np.sort(rng.choice(500, row[f], replace=False))
                    poss.extend(p.tolist())
        offsets.append(len(docids))
    return (np.asarray(offsets, np.int64),
            np.asarray(docids, np.uint16),
            np.stack(tfs).astype(np.uint16),
            np.asarray(poss, np.uint16))


def test_roundtrip_exact():
    rng = np.random.default_rng(3)
    off, docid, tf, pos = _random_level(rng)
    blob = native_mod.pack_postings(off, docid, tf, pos)
    assert blob is not None
    d2, t2, p2 = native_mod.decode_postings(blob, off, tf.shape[1],
                                            len(pos))
    np.testing.assert_array_equal(docid, d2)
    np.testing.assert_array_equal(tf, t2)
    np.testing.assert_array_equal(pos, p2)
    # compact: the stream must be well under the fixed-width bytes
    fixed = docid.nbytes + tf.nbytes + pos.nbytes
    assert len(blob) < 0.75 * fixed


def test_e2e_reopen_compact(tmp_path):
    rng = np.random.default_rng(11)
    vocab = [f"w{i:03d}" for i in range(80)]
    docs = [{"title": " ".join(rng.choice(vocab, 3)),
             "body": " ".join(rng.choice(vocab, 12))}
            for _ in range(3_000)]
    schema = [
        st.SchemaField("title", st.FieldType.Text, indexed=True, boost=10.0),
        st.SchemaField("body", st.FieldType.Text, indexed=True),
    ]
    idx = st.create_index(tmp_path / "ix", schema, shard_count=2)
    idx.index_documents(docs)
    idx.commit()
    lvl = tmp_path / "ix" / "shard_0" / "level_0"
    assert (lvl / "postings.bin").exists()
    assert not (lvl / "docid.npy").exists()
    r1 = idx.search(st.SearchRequest(query="w001 w002", length=10,
                                     result_type=st.ResultType.TopkCount))
    idx2 = st.open_index(tmp_path / "ix")
    r2 = idx2.search(st.SearchRequest(query="w001 w002", length=10,
                                      result_type=st.ResultType.TopkCount))
    assert r1.result_count_total == r2.result_count_total
    assert [x.doc_id for x in r1.results] == [x.doc_id for x in r2.results]
    # phrase queries exercise the decoded positions
    p1 = idx.search(st.SearchRequest(query='"w001 w002"', length=10,
                                     result_type=st.ResultType.TopkCount))
    p2 = idx2.search(st.SearchRequest(query='"w001 w002"', length=10,
                                      result_type=st.ResultType.TopkCount))
    assert p1.result_count_total == p2.result_count_total


def test_pack_returns_load_identical_level(tmp_path):
    """Commit seeds the shard level cache with the CommittedLevel that
    pack() built in RAM; it must be field-for-field identical to what
    CommittedLevel.load decodes from the directory pack() wrote."""
    from seekstorm_tpu.lexindex import CommittedLevel

    rng = np.random.default_rng(5)
    vocab = [f"t{i:03d}" for i in range(60)]
    docs = [{"title": " ".join(rng.choice(vocab, 2)),
             "body": " ".join(rng.choice(vocab, 9))}
            for _ in range(1_500)]
    schema = [
        st.SchemaField("title", st.FieldType.Text, indexed=True, boost=10.0),
        st.SchemaField("body", st.FieldType.Text, indexed=True),
    ]
    idx = st.create_index(tmp_path / "ix", schema, shard_count=1)
    idx.index_documents(docs)
    sh = idx.shards[0]
    packed = sh.level0.pack(tmp_path / "lvl", idx.facet_fields)
    loaded = CommittedLevel.load(tmp_path / "lvl")
    assert packed.doc_count == loaded.doc_count
    assert packed.positions_sum_normalized == loaded.positions_sum_normalized
    assert packed.term_names == loaded.term_names
    for f in ("term_hash", "term_offset", "docid", "tf", "pos",
              "pos_offset", "doclen"):
        a, b = getattr(packed, f), getattr(loaded, f)
        assert a.dtype == b.dtype, f
        np.testing.assert_array_equal(a, b, err_msg=f)


def test_recommit_uses_level_cache(tmp_path):
    """A second commit must reuse cached immutable levels (no disk
    re-decode) and still answer identically to a fresh open."""
    from seekstorm_tpu import lexindex

    rng = np.random.default_rng(6)
    vocab = [f"t{i:03d}" for i in range(60)]
    mk = lambda n: [{"title": " ".join(rng.choice(vocab, 2)),
                     "body": " ".join(rng.choice(vocab, 9))}
                    for _ in range(n)]
    schema = [
        st.SchemaField("title", st.FieldType.Text, indexed=True, boost=10.0),
        st.SchemaField("body", st.FieldType.Text, indexed=True),
    ]
    idx = st.create_index(tmp_path / "ix", schema, shard_count=1)
    idx.index_documents(mk(70_000))      # one full level + partial
    idx.commit()
    sh = idx.shards[0]
    assert 0 in sh._level_cache          # seeded by pack
    cached0 = sh._level_cache[0]
    assert sh.lexical.levels[0] is cached0
    idx.index_documents(mk(2_000))
    orig_load = lexindex.CommittedLevel.load
    loaded_ids = []

    def spy(path, mmap=False):
        loaded_ids.append(str(path).rsplit("_", 1)[-1])
        return orig_load(path, mmap=mmap)

    lexindex.CommittedLevel.load = staticmethod(spy)
    try:
        idx.commit()
    finally:
        lexindex.CommittedLevel.load = staticmethod(orig_load)
    # only the rewritten partial level (id 1) may be re-decoded
    assert "0" not in loaded_ids
    assert idx.shards[0].lexical.levels[0] is cached0
    r1 = idx.search(st.SearchRequest(query="t001 t002", length=10,
                                     result_type=st.ResultType.TopkCount))
    idx2 = st.open_index(tmp_path / "ix")
    r2 = idx2.search(st.SearchRequest(query="t001 t002", length=10,
                                      result_type=st.ResultType.TopkCount))
    assert r1.result_count_total == r2.result_count_total
    assert [x.doc_id for x in r1.results] == [x.doc_id for x in r2.results]
