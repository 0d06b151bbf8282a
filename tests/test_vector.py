"""Vector engine tests: external-embedding lifecycle (mirrors reference
tests/test.rs test_12..test_14), quantization fidelity, brute-force recall,
nprobe, hybrid RRF."""

import numpy as np
import pytest

import seekstorm_tpu as st


def vec_meta(dim, similarity, precision=st.Precision.I8,
             quantization=st.Quantization.ScalarQuantizationI8,
             clustering=st.ClusteringMode.Auto, min_points=100):
    return st.IndexMeta(
        vector=st.VectorConfig(
            enabled=True,
            dim=dim,
            similarity=similarity,
            precision=precision,
            quantization=quantization,
            inference=st.InferenceType.External,
            clustering=st.ClusteringConfig(mode=clustering, min_points=min_points),
        )
    )


def vec_schema():
    return [
        st.SchemaField("vector", st.FieldType.Json, index_vector=True),
        st.SchemaField("label", st.FieldType.Text, stored=True),
    ]


def test_external_lifecycle(tmp_index_dir):
    """reference tests/test.rs:617-745 semantics: 3 external f32 vectors,
    AnnMode All returns all 3."""
    meta = vec_meta(128, st.VectorSimilarity.Euclidean,
                    precision=st.Precision.F32,
                    quantization=st.Quantization.Null,
                    clustering=st.ClusteringMode.Null)
    idx = st.create_index(tmp_index_dir, vec_schema(), meta=meta, shard_count=2)
    vecs = [np.arange(1, 129, dtype=np.float32) * 0.001 + i * 0.128 for i in range(3)]
    for i, v in enumerate(vecs):
        idx.index_document({"vector": v.tolist(), "label": str(i)})
    idx.commit()
    assert idx.indexed_doc_count == 3

    rs = idx.search(st.SearchRequest(
        search_mode=st.SearchMode.Vector, query_vector=vecs[0].tolist(),
        result_type=st.ResultType.TopkCount))
    assert len(rs.results) == 3
    assert rs.result_count == 3
    assert rs.result_count_total == 3
    assert rs.results[0].doc_id == 0       # nearest = itself
    assert rs.results[0].score < 1e-3      # euclidean distance ~ 0
    # reopen keeps vectors
    idx2 = st.open_index(tmp_index_dir)
    rs = idx2.search(st.SearchRequest(
        search_mode=st.SearchMode.Vector, query_vector=vecs[1].tolist()))
    assert rs.results[0].doc_id == 1


@pytest.mark.parametrize("similarity", [
    st.VectorSimilarity.Cosine,
    st.VectorSimilarity.Dot,
    st.VectorSimilarity.Euclidean,
])
def test_recall_vs_bruteforce(tmp_index_dir, rng, similarity):
    """i8 SQ exhaustive scan must reproduce the exact f32 top-10."""
    n, d = 600, 64
    data = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((8, d)).astype(np.float32)

    meta = vec_meta(d, similarity, clustering=st.ClusteringMode.Null)
    idx = st.create_index(tmp_index_dir, vec_schema(), meta=meta, shard_count=1)
    for i in range(n):
        idx.index_document({"vector": data[i].tolist(), "label": str(i)})
    idx.commit()

    # brute force ground truth (f32)
    if similarity == st.VectorSimilarity.Cosine:
        dn = data / np.linalg.norm(data, axis=1, keepdims=True)
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        sims = qn @ dn.T
    elif similarity == st.VectorSimilarity.Dot:
        sims = queries @ data.T
    else:
        sims = -(
            (queries * queries).sum(1)[:, None]
            + (data * data).sum(1)[None, :]
            - 2 * queries @ data.T
        )
    for qi in range(len(queries)):
        truth = set(np.argsort(-sims[qi])[:10].tolist())
        rs = idx.search(st.SearchRequest(
            search_mode=st.SearchMode.Vector, query_vector=queries[qi].tolist(),
            length=10))
        got = {r.doc_id for r in rs.results}
        recall = len(got & truth) / 10
        assert recall >= 0.9, (similarity, qi, recall)


def test_nprobe_recall(tmp_index_dir, rng):
    """IVF nprobe: recall grows with nprobe; full probe = exhaustive."""
    # gaussian mixture: IVF clustering needs structure for pruning to work
    n, d, n_centers = 2000, 32, 25
    centers = rng.standard_normal((n_centers, d)).astype(np.float32) * 5.0
    assign = rng.integers(0, n_centers, size=n)
    data = (centers[assign] + rng.standard_normal((n, d))).astype(np.float32)
    queries = (
        centers[rng.integers(0, n_centers, size=5)]
        + rng.standard_normal((5, d))
    ).astype(np.float32)
    meta = vec_meta(d, st.VectorSimilarity.Euclidean,
                    clustering=st.ClusteringMode.Auto, min_points=100)
    idx = st.create_index(tmp_index_dir, vec_schema(), meta=meta, shard_count=1)
    for i in range(n):
        idx.index_document({"vector": data[i].tolist(), "label": str(i)})
    idx.commit()
    assert idx.vectors.shards[0].levels[0].n_clusters > 1

    sims = -(
        (queries * queries).sum(1)[:, None]
        + (data * data).sum(1)[None, :]
        - 2 * queries @ data.T
    )
    recalls = {}
    for nprobe in (2, 16):
        hits = 0
        for qi in range(len(queries)):
            truth = set(np.argsort(-sims[qi])[:10].tolist())
            rs = idx.search(st.SearchRequest(
                search_mode=st.SearchMode.Vector,
                query_vector=queries[qi].tolist(),
                length=10, ann_mode="Nprobe", nprobe=nprobe))
            hits += len({r.doc_id for r in rs.results} & truth)
        recalls[nprobe] = hits / (10 * len(queries))
    assert recalls[16] >= recalls[2]
    assert recalls[16] >= 0.8, recalls


def test_pam_build_clustering(tmp_index_dir, rng, monkeypatch):
    """SEEKSTORM_TPU_CLUSTER_ALGO=pam: the reference-style greedy
    k-medoid BUILD (clustering.rs:229-500) produces a valid layout
    (permutation, medoid-first clusters) with nprobe recall comparable to
    the Lloyd default."""
    monkeypatch.setenv("SEEKSTORM_TPU_CLUSTER_ALGO", "pam")
    from seekstorm_tpu.clustering import cluster_level
    from seekstorm_tpu.schema import ClusteringConfig, ClusteringMode

    n, d, n_centers = 2000, 32, 25
    centers = rng.standard_normal((n_centers, d)).astype(np.float32) * 5.0
    assign = rng.integers(0, n_centers, size=n)
    data = (centers[assign] + rng.standard_normal((n, d))).astype(np.float32)
    cfg = ClusteringConfig(mode=ClusteringMode.Auto, min_points=100)
    order, offsets = cluster_level(
        data, st.VectorSimilarity.Euclidean, cfg)
    # valid permutation + medoid-first ranges
    assert sorted(order.tolist()) == list(range(n))
    assert offsets[0] == 0 and offsets[-1] == n
    assert len(offsets) - 1 > 1
    # end-to-end recall with PAM layout
    meta = vec_meta(d, st.VectorSimilarity.Euclidean,
                    clustering=st.ClusteringMode.Auto, min_points=100)
    idx = st.create_index(tmp_index_dir, vec_schema(), meta=meta,
                          shard_count=1)
    for i in range(n):
        idx.index_document({"vector": data[i].tolist(), "label": str(i)})
    idx.commit()
    queries = (centers[rng.integers(0, n_centers, size=5)]
               + rng.standard_normal((5, d))).astype(np.float32)
    sims = -((queries * queries).sum(1)[:, None]
             + (data * data).sum(1)[None, :] - 2 * queries @ data.T)
    hits = 0
    for qi in range(len(queries)):
        truth = set(np.argsort(-sims[qi])[:10].tolist())
        rs = idx.search(st.SearchRequest(
            search_mode=st.SearchMode.Vector,
            query_vector=queries[qi].tolist(),
            length=10, ann_mode="Nprobe", nprobe=16))
        hits += len({r.doc_id for r in rs.results} & truth)
    assert hits / 50 >= 0.8, hits / 50


def test_realtime_tail_and_multivector(tmp_index_dir, rng):
    d = 16
    meta = vec_meta(d, st.VectorSimilarity.Cosine,
                    clustering=st.ClusteringMode.Null)
    idx = st.create_index(tmp_index_dir, vec_schema(), meta=meta, shard_count=1)
    a = rng.standard_normal(d).astype(np.float32)
    b = rng.standard_normal(d).astype(np.float32)
    idx.index_document({"vector": a.tolist(), "label": "committed"})
    idx.commit()
    # multi-chunk doc, uncommitted
    idx.index_document({"vector": [b.tolist(), (b * 2).tolist()], "label": "tail"})
    rs = idx.search(st.SearchRequest(
        search_mode=st.SearchMode.Vector, query_vector=b.tolist(), length=10))
    assert rs.results[0].doc_id == 1      # realtime hit, deduped multi-chunk
    ids = [r.doc_id for r in rs.results]
    assert ids.count(1) == 1
    # delete excludes from vector results
    idx.delete_document(1)
    rs = idx.search(st.SearchRequest(
        search_mode=st.SearchMode.Vector, query_vector=b.tolist(), length=10))
    assert 1 not in [r.doc_id for r in rs.results]


def test_similarity_threshold(tmp_index_dir, rng):
    d = 8
    meta = vec_meta(d, st.VectorSimilarity.Cosine, precision=st.Precision.F32,
                    quantization=st.Quantization.Null,
                    clustering=st.ClusteringMode.Null)
    idx = st.create_index(tmp_index_dir, vec_schema(), meta=meta, shard_count=1)
    base = np.eye(d, dtype=np.float32)
    for i in range(d):
        idx.index_document({"vector": base[i].tolist(), "label": str(i)})
    idx.commit()
    q = base[0]
    rs = idx.search(st.SearchRequest(
        search_mode=st.SearchMode.Vector, query_vector=q.tolist(), length=10,
        ann_mode="SimilarityThreshold", similarity_threshold=0.5,
        result_type=st.ResultType.TopkCount))
    assert [r.doc_id for r in rs.results] == [0]
    assert rs.result_count_total == 1


def test_hybrid_rrf(tmp_index_dir, rng):
    d = 16
    meta = vec_meta(d, st.VectorSimilarity.Cosine,
                    clustering=st.ClusteringMode.Null)
    schema = [
        st.SchemaField("text", st.FieldType.Text, stored=True, indexed=True),
        st.SchemaField("vector", st.FieldType.Json, index_vector=True),
    ]
    idx = st.create_index(tmp_index_dir, schema, meta=meta, shard_count=1)
    vs = rng.standard_normal((4, d)).astype(np.float32)
    texts = ["apple banana", "banana cherry", "cherry date", "date apple"]
    for t, v in zip(texts, vs):
        idx.index_document({"text": t, "vector": v.tolist()})
    idx.commit()
    rs = idx.search(st.SearchRequest(
        query="banana", search_mode=st.SearchMode.Hybrid,
        query_vector=vs[2].tolist(), length=4))
    assert rs.results
    # manual RRF check for the top doc
    lex = idx.search(st.SearchRequest(query="banana", length=4))
    vec = idx.search(st.SearchRequest(search_mode=st.SearchMode.Vector,
                                      query_vector=vs[2].tolist(), length=4))
    fused = {}
    for rank, r in enumerate(lex.results):
        fused[r.doc_id] = fused.get(r.doc_id, 0) + 1 / (0.6 + rank)
    for rank, r in enumerate(vec.results):
        fused[r.doc_id] = fused.get(r.doc_id, 0) + 1 / (0.6 + rank)
    best = max(fused.items(), key=lambda kv: kv[1])[0]
    assert rs.results[0].doc_id == best


def test_turboquant_qjl_quantizer():
    """TurboQuant = random-sign FWHT rotation + sigma/32 symmetric (QJL)
    quantizer (reference vector_similarity.rs:1825+, calculate_scale
    :2035-2039): dots reconstruct within ~2% and the stored form is
    symmetric (zp = -128*scale)."""
    import numpy as np

    from seekstorm_tpu.quantize import prepare_vectors, preprocess_vectors
    from seekstorm_tpu.schema import (Precision, Quantization,
                                      VectorSimilarity)

    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, size=(500, 96)).astype(np.float32)
    qb = prepare_vectors(x, VectorSimilarity.Dot, Precision.I8,
                         Quantization.TurboQuantI8)
    np.testing.assert_allclose(qb.zp, -128.0 * qb.scale, rtol=1e-6)
    xh = (qb.data.astype(np.float32) + 128.0) * qb.scale[:, None] \
        + qb.zp[:, None]
    xp = preprocess_vectors(x, VectorSimilarity.Dot,
                            Quantization.TurboQuantI8)
    exact = xp[:50] @ xp[50:100].T
    approx = xh[:50] @ xh[50:100].T
    rel = np.abs(approx - exact).mean() / np.abs(exact).mean()
    assert rel < 0.03, rel


def test_global_recluster_field_alignment(tmp_path):
    """Multi-level commits trigger the global device-build re-cluster;
    per-row metadata (fieldid, docid) must stay aligned through the
    permutation — verified via field-filtered nprobe search."""
    import numpy as np

    import seekstorm_tpu as st

    meta = st.IndexMeta(vector=st.VectorConfig(
        enabled=True, dim=8, similarity=st.VectorSimilarity.Euclidean,
        precision=st.Precision.F32, quantization=st.Quantization.Null,
        inference=st.InferenceType.External,
        clustering=st.ClusteringConfig(mode=st.ClusteringMode.Auto,
                                       min_points=32)))
    schema = [
        st.SchemaField("a", st.FieldType.Json, index_vector=True),
        st.SchemaField("b", st.FieldType.Json, index_vector=True),
    ]
    idx = st.create_index(tmp_path / "ix", schema, meta=meta, shard_count=1)
    rng = np.random.default_rng(5)
    A = rng.normal(0, 5, (200, 8)).astype(np.float32)
    B = rng.normal(50, 5, (200, 8)).astype(np.float32)
    idx.index_documents([{"a": A[i], "b": B[i]} for i in range(200)])
    idx.commit()
    # levels are 64K-doc-aligned, so force the multi-level re-cluster
    # gate on the single test level
    from seekstorm_tpu.vector_index import IndexVectors

    idx.vectors._global_recluster = lambda levels, n: n >= 32
    q = A[150] + 0.01
    # unfiltered: nearest is doc 150's field-a vector
    r = idx.search(st.SearchRequest(search_mode=st.SearchMode.Vector,
        query_vector=q.tolist(), length=3, top_n=3, ann_mode="Nprobe",
        nprobe=4, realtime=False))
    assert r.results and r.results[0].doc_id == 150, r.results[:2]
    # filtered to field b: the A-cluster rows must be masked out
    rb = idx.search(st.SearchRequest(search_mode=st.SearchMode.Vector,
        query_vector=(B[7] + 0.01).tolist(), length=3, top_n=3,
        ann_mode="Nprobe", nprobe=4, realtime=False, field_filter=["b"]))
    assert rb.results and rb.results[0].doc_id == 7, rb.results[:2]
