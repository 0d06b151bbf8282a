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
