"""Multi-chip mesh execution tests on the 8-virtual-device CPU backend:
results from the mesh-sharded stacked path must match the per-shard path."""

import jax
import numpy as np
import pytest

import seekstorm_tpu as st
from tests.test_lexical import BruteForce, assert_parity, make_docs, std_schema


def test_mesh_matches_single_device(tmp_index_dir, rng):
    assert len(jax.devices()) == 8
    docs = make_docs(rng, 640)
    idx = st.create_index(tmp_index_dir, std_schema(), shard_count=8)
    idx.index_documents(docs)
    idx.commit()

    r_plain = idx.search(st.SearchRequest(query="w001 w004"))
    idx.attach_mesh()
    assert idx._mesh.devices.size == 8
    r_mesh = idx.search(st.SearchRequest(query="w001 w004"))
    assert [x.doc_id for x in r_mesh.results] == [x.doc_id for x in r_plain.results]
    assert r_mesh.result_count_total == r_plain.result_count_total
    np.testing.assert_allclose(
        [x.score for x in r_mesh.results],
        [x.score for x in r_plain.results],
        rtol=1e-5,
    )

    bf = BruteForce(idx, docs)
    assert_parity(idx, bf, "w002 w003", "Union")
    assert_parity(idx, bf, "w001 w002", "Intersection")


def test_mesh_uneven_devices(tmp_index_dir, rng):
    """shard_count not divisible by device count: falls back to a divisor."""
    docs = make_docs(rng, 120)
    idx = st.create_index(tmp_index_dir, std_schema(), shard_count=6)
    idx.index_documents(docs)
    idx.commit()
    idx.attach_mesh()
    assert idx._mesh.devices.size in (1, 2, 3, 6)
    bf = BruteForce(idx, docs)
    assert_parity(idx, bf, "w000 w001", "Union")


def test_mesh_dense_term_path(tmp_index_dir, rng, monkeypatch):
    """The shard_map program must score dense-term entries (row-gather +
    matmul path) identically to the single-device path."""
    import seekstorm_tpu.lexindex as lexindex_mod

    monkeypatch.setattr(lexindex_mod, "DENSE_MIN", 16)
    docs = []
    for i in range(400):
        w = ["common"] * int(rng.integers(1, 3))
        w += [f"rare{int(rng.integers(0, 30))}" for _ in range(5)]
        rng.shuffle(w)
        docs.append({"t": " ".join(w)})
    idx = st.create_index(
        tmp_index_dir,
        [st.SchemaField("t", st.FieldType.Text, stored=True, indexed=True)],
        shard_count=8,
    )
    idx.index_documents(docs)
    idx.commit()
    assert any(len(sh.lexical.dense_tf) for sh in idx.shards), \
        "no dense entries built"

    def run_all():
        out = {}
        for q in ["common", "common rare3", "+common +rare5",
                  "common -rare7"]:
            r = idx.search(st.SearchRequest(
                query=q, result_type=st.ResultType.TopkCount, length=50,
                realtime=False))
            out[q] = (r.result_count_total,
                      [(x.doc_id, round(x.score, 4)) for x in r.results])
        return out

    plain = run_all()
    idx.attach_mesh()
    mesh = run_all()
    assert plain == mesh


def test_mesh_throughput_shape_divides(tmp_index_dir, rng):
    """Throughput shape: with 8 shards over an 8-device mesh, per-device
    scan work is per-SHARD work — 1/8th of the corpus blocks — and the
    whole batch executes as one fused mesh dispatch.  Asserted on the
    planner's per-shard block coverage, the device placement of the
    stacked arrays, and the dispatch counter (real-hardware runbook:
    docs/MULTICHIP.md)."""
    import seekstorm_tpu.metrics as M
    from seekstorm_tpu.search import _get_stacked

    # 3 commits -> 3 levels (= 3 blocks) per shard, 24 blocks total
    docs = make_docs(rng, 240)
    idx = st.create_index(tmp_index_dir, std_schema(), shard_count=8)
    for c in range(3):
        idx.index_documents(docs[c * 80: (c + 1) * 80])
        idx.commit()
    idx.attach_mesh()
    assert idx._mesh.devices.size == 8

    total_blocks = sum(sh.lexical.n_blocks for sh in idx.shards)
    per_shard = [sh.lexical.n_blocks for sh in idx.shards]
    # per-device work = that device's shard's blocks = total / n_devices
    # (commits below 64K docs merge into one level per shard — partial
    # level rewrite — so per-shard is 1 block here; the invariant is the
    # even split, not the absolute count)
    assert all(b == total_blocks // 8 for b in per_shard), per_shard

    # the stacked device tensors are laid out [S, ...] and sharded over
    # the mesh's "shards" axis — each device holds 1/8th
    stacked = _get_stacked(idx)
    arr = stacked.dev_docid
    assert arr.shape[0] == 8
    spec = arr.sharding.spec
    assert spec[0] == "shards", spec
    assert len(arr.sharding.device_set) == 8

    # one fused dispatch serves the whole batch
    before = M.METRICS._counters.get("device_dispatch_total", 0)
    reqs = [st.SearchRequest(query="w001 w004", length=10,
                             result_type=st.ResultType.TopkCount)
            for _ in range(16)]
    st.search_batch(idx, reqs)
    after = M.METRICS._counters.get("device_dispatch_total", 0)
    assert after - before == 1, (before, after)


def test_mesh_wand_matches_single_device(tmp_index_dir, rng, monkeypatch):
    """The bucket-WAND engine (the default serving path at reference scale)
    under the 8-device mesh: partitioned presence/bucket-max pools, per-
    device scan, ICI all-gather merge — pages and counts must match the
    single-device WAND path and the dense kernels."""
    from tests.test_wand import _Page

    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    docs = make_docs(rng, 900)
    idx = st.create_index(tmp_index_dir, std_schema(), shard_count=8)
    idx.index_documents(docs)
    idx.commit()

    queries = [
        ("w001 w004", st.QueryType.Union),
        ("w002 w003", st.QueryType.Intersection),
        ("w000", st.QueryType.Union),
        ("+w001 w005", st.QueryType.Union),
        ("-w000 w001 w002", st.QueryType.Union),
        ("w004 w005 w006", st.QueryType.Union),
    ]

    def run_all():
        out = []
        for q, ty in queries:
            rs = idx.search(st.SearchRequest(
                query=q, length=10, result_type=st.ResultType.TopkCount,
                query_type_default=ty, realtime=False))
            out.append(_Page(rs))
        return out

    single = run_all()

    # dense parity (counts exact on both engines)
    monkeypatch.setenv("SEEKSTORM_TPU_NO_WAND", "1")
    monkeypatch.delenv("SEEKSTORM_TPU_WAND", raising=False)
    dense = run_all()
    monkeypatch.delenv("SEEKSTORM_TPU_NO_WAND", raising=False)
    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    assert single == dense

    idx.attach_mesh()
    assert idx._mesh.devices.size == 8

    from seekstorm_tpu.ops import wand as wand_mod

    state = wand_mod.get_state(idx)
    assert state.mesh is not None and state.D == 8
    # pools are partitioned: device axis sharded over the mesh
    assert state.ppool.shape[0] == 8
    assert len(state.ppool.sharding.device_set) == 8

    meshed = run_all()
    assert meshed == single

    # the populated pools really live sharded across all 8 devices
    assert len(state.ppool.sharding.device_set) == 8, \
        state.ppool.sharding
    assert len(state.sp_prow.sharding.device_set) == 8
    # per-device row partition is balanced over the 8 real blocks
    assert sum(1 for n in state.n_prows if n > 0) >= 4, state.n_prows


def test_mesh_wand_count_only(tmp_index_dir, rng, monkeypatch):
    """ResultType.Count under the mesh: the psum'd phase-1 popcount is the
    answer (no rescore)."""
    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    docs = make_docs(rng, 400)
    idx = st.create_index(tmp_index_dir, std_schema(), shard_count=8)
    idx.index_documents(docs)
    idx.commit()
    bf = BruteForce(idx, docs)

    idx.attach_mesh()
    for q, ty in [("w001 w002", "Union"), ("w001 w002", "Intersection")]:
        expected = bf.score(q, ty)
        rs = idx.search(st.SearchRequest(
            query=q, result_type=st.ResultType.Count,
            query_type_default=st.QueryType(ty), realtime=False))
        assert rs.result_count_total == len(expected), (q, ty)


def test_mesh_multiple_shards_per_device(tmp_index_dir, rng):
    """shard_count > device count: each device owns S/D contiguous shards
    and must scan ALL of them (regression: the shard_map bodies used to
    read only local shard 0)."""
    docs = make_docs(rng, 800)
    idx = st.create_index(tmp_index_dir, std_schema(), shard_count=16)
    idx.index_documents(docs)
    idx.commit()

    queries = [("w001 w004", "Union"), ("w001 w002", "Intersection"),
               ("w000", "Union")]
    plain = {}
    for q, ty in queries:
        rs = idx.search(st.SearchRequest(
            query=q, length=10, result_type=st.ResultType.TopkCount,
            query_type_default=st.QueryType(ty)))
        plain[(q, ty)] = (rs.result_count_total,
                          [x.doc_id for x in rs.results])

    idx.attach_mesh()
    assert idx._mesh.devices.size == 8  # 16 shards over 8 devices
    bf = BruteForce(idx, docs)
    for q, ty in queries:
        rs = idx.search(st.SearchRequest(
            query=q, length=10, result_type=st.ResultType.TopkCount,
            query_type_default=st.QueryType(ty)))
        assert rs.result_count_total == plain[(q, ty)][0], (q, ty)
        assert [x.doc_id for x in rs.results] == plain[(q, ty)][1], (q, ty)
        assert_parity(idx, bf, q, ty)


def test_mesh_vector_matches_single_device(tmp_index_dir, rng):
    """Mesh vector engine: per-shard vector partitions sharded over the
    8-device mesh, one medoid dispatch + one shard_map scan dispatch,
    ICI-merged candidates — results must match the per-shard loop, and
    the stacked tensors must actually live distributed."""
    from tests.test_vector import vec_meta, vec_schema

    n, d, n_centers = 1600, 32, 20
    centers = rng.standard_normal((n_centers, d)).astype(np.float32) * 5.0
    assign = rng.integers(0, n_centers, size=n)
    data = (centers[assign]
            + rng.standard_normal((n, d))).astype(np.float32)
    queries = (centers[rng.integers(0, n_centers, size=4)]
               + rng.standard_normal((4, d))).astype(np.float32)
    meta = vec_meta(d, st.VectorSimilarity.Euclidean,
                    clustering=st.ClusteringMode.Auto, min_points=50)
    idx = st.create_index(tmp_index_dir, vec_schema(), meta=meta,
                          shard_count=8)
    for i in range(n):
        idx.index_document({"vector": data[i].tolist(), "label": str(i)})
    idx.commit()

    def run_all():
        out = []
        for q in queries:
            for mode, np_ in [("All", 0), ("Nprobe", 4)]:
                rs = idx.search(st.SearchRequest(
                    search_mode=st.SearchMode.Vector,
                    query_vector=q.tolist(), length=10,
                    ann_mode=mode, nprobe=np_, realtime=False))
                out.append((
                    [r.doc_id for r in rs.results],
                    [round(r.score, 4) for r in rs.results],
                    rs.observed_vector_count, rs.observed_cluster_count))
        return out

    plain = run_all()
    # observed counters populated on the single-device path too
    assert plain[0][2] > 0 and plain[0][3] > 0

    idx.attach_mesh()
    assert idx._mesh.devices.size == 8
    meshed = run_all()
    for p, m in zip(plain, meshed):
        assert p[0] == m[0], (p, m)
        assert p[1] == m[1]
        assert p[2] == m[2] and p[3] == m[3]   # observed counters agree

    # the vector partitions demonstrably live sharded across devices
    dev = idx.vectors.device_stacked(idx._mesh)
    assert dev["data"].shape[0] == 8
    assert len(dev["data"].sharding.device_set) == 8, dev["data"].sharding
    assert len(dev["med_data"].sharding.device_set) == 8


def test_mesh_hybrid_rrf(tmp_index_dir, rng):
    """Hybrid (lexical + vector + RRF) under the mesh: both engines run
    their sharded programs and fuse identically to single-device."""
    from tests.test_vector import vec_meta

    d = 16
    schema = [
        st.SchemaField("title", st.FieldType.Text, stored=True,
                       indexed=True),
        st.SchemaField("vector", st.FieldType.Json, index_vector=True),
    ]
    meta = vec_meta(d, st.VectorSimilarity.Cosine)
    vocab = [f"w{i:03d}" for i in range(40)]
    docs = []
    for i in range(320):
        docs.append({
            "title": " ".join(rng.choice(vocab, 8)),
            "vector": rng.standard_normal(d).astype(np.float32).tolist(),
        })
    idx = st.create_index(tmp_index_dir, schema, meta=meta, shard_count=8)
    idx.index_documents(docs)
    idx.commit()

    q = rng.standard_normal(d).astype(np.float32).tolist()
    req = st.SearchRequest(query="w001 w002",
                           search_mode=st.SearchMode.Hybrid,
                           query_vector=q, length=10, realtime=False)
    plain = idx.search(req)
    idx.attach_mesh()
    meshed = idx.search(req)
    assert [r.doc_id for r in meshed.results] == \
        [r.doc_id for r in plain.results]
