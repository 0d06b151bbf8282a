"""Internal Model2Vec inference: chunking, embedding, text->vector indexing
and query-string embedding (mirrors reference tests/test.rs:496-616
internal-inference vector tests, with a tiny synthetic local model)."""

import json

import numpy as np
import pytest

import seekstorm_tpu as st
from seekstorm_tpu.inference import Model2Vec, chunk_text


@pytest.fixture()
def model_dir(tmp_path, rng):
    words = ["cat", "dog", "fish", "bird", "car", "bike", "train", "plane",
             "red", "blue", "green", "fast", "slow", "big", "small", "the",
             "a", "is", "very"]
    d = 16
    emb = rng.standard_normal((len(words), d)).astype(np.float32)
    p = tmp_path / "model"
    p.mkdir()
    np.save(p / "embeddings.npy", emb)
    with open(p / "vocab.json", "w") as f:
        json.dump({w: i for i, w in enumerate(words)}, f)
    return p, words, emb


def test_chunking():
    text = "First sentence. Second one! Third? " + "x" * 50
    chunks = chunk_text(text, 30)
    assert all(len(c.encode()) <= 30 or "." not in c for c in chunks)
    assert "".join(chunks).replace(" ", "") == text.replace(" ", "")
    assert chunk_text("", 100) == []
    # a single long sentence still splits at the byte limit
    assert all(len(c.encode()) <= 100 for c in chunk_text("y" * 500, 100))


def test_model_encode(model_dir):
    p, words, emb = model_dir
    m = Model2Vec.load(p)
    v = m.encode(["cat dog"])
    np.testing.assert_allclose(v[0], (emb[0] + emb[1]) / 2, rtol=1e-6)
    assert np.all(m.encode(["zzzz unknown"])[0] == 0)


def test_predefined_model_gated(tmp_path):
    with pytest.raises(RuntimeError, match="network download"):
        Model2Vec.load("minishlab/potion-base-2M")


def test_text_vector_index_end_to_end(tmp_path, model_dir):
    p, words, emb = model_dir
    meta = st.IndexMeta(
        vector=st.VectorConfig(
            enabled=True, dim=0, similarity=st.VectorSimilarity.Cosine,
            precision=st.Precision.F32, quantization=st.Quantization.Null,
            inference=st.InferenceType.Model2VecCustom, model=str(p),
            chunk_size=1000,
            clustering=st.ClusteringConfig(mode=st.ClusteringMode.Null),
        )
    )
    schema = [
        st.SchemaField("body", st.FieldType.Text, stored=True, indexed=True,
                       index_vector=True),
    ]
    idx = st.create_index(tmp_path / "ix", schema, meta=meta)
    idx.index_documents([
        {"body": "the cat is very big"},
        {"body": "a fast red car"},
        {"body": "the blue bird is small"},
    ])
    idx.commit()
    # query embedded from the query string (no query_vector)
    rs = idx.search(st.SearchRequest(
        query="fast car", search_mode=st.SearchMode.Vector, length=3))
    assert rs.results[0].doc_id == 1
    # hybrid with inferred vector
    rs = idx.search(st.SearchRequest(
        query="cat", search_mode=st.SearchMode.Hybrid, length=3))
    assert rs.results


def test_predefined_model_local_cache(tmp_path, monkeypatch):
    """Predefined Potion names resolve from a local cache dir
    ($SEEKSTORM_TPU_MODEL_DIR/<org>--<name>) before raising the
    no-egress error (reference vector.rs:264-279 downloads at runtime)."""
    import numpy as np
    import json
    import pytest as _pt

    from seekstorm_tpu.inference import Model2Vec

    # no cache -> clear error mentioning the remedy
    monkeypatch.delenv("SEEKSTORM_TPU_MODEL_DIR", raising=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "nohub"))
    with _pt.raises(RuntimeError, match="Model2VecCustom"):
        Model2Vec.load("minishlab/potion-base-2M")

    # cached copy -> loads (vocab.json fallback tokenizer, same as the
    # model_dir fixture)
    d = tmp_path / "minishlab--potion-base-2M"
    d.mkdir()
    np.save(d / "embeddings.npy", np.ones((8, 4), np.float32))
    (d / "vocab.json").write_text(
        json.dumps({chr(97 + i): i for i in range(8)}))
    monkeypatch.setenv("SEEKSTORM_TPU_MODEL_DIR", str(tmp_path))
    m = Model2Vec.load("minishlab/potion-base-2M")
    assert m.dim == 4
