"""Pallas WAND phase-1 kernel (ops/wand_pallas.py) parity vs the XLA step.

Runs the kernel in interpret mode on the CPU backend (the compiled path
needs real TPU hardware; the driver's bench exercises it there).  Two
layers:

  * surgical: wand_scan's packed output on random synthetic pools must
    match the XLA step — counts bit-exact, upper bounds to 1-2 f32 ulp
    (XLA may contract the weight multiply into an fma; the serving-side
    termination margin absorbs the same difference);
  * end-to-end: search_batch pages through the public API with the
    interpreted kernel forced must equal the dense kernels' pages.
"""

import importlib

import numpy as np
import pytest

import seekstorm_tpu as st
from seekstorm_tpu.schema import BLOCK_SIZE

wand_mod = importlib.import_module("seekstorm_tpu.ops.wand")
wp = importlib.import_module("seekstorm_tpu.ops.wand_pallas")

NW = wand_mod.NW
KP = wand_mod.K_SEL + 1


def _synth(rng, *, NBLK=4, V=8, Bq=16, T=2, S=2, R=24, with_filter=False):
    """Random synthetic device inputs for wand_scan (single device)."""
    import jax.numpy as jnp

    PR = R + 1
    ppool = rng.integers(0, 1 << 32, size=(1, PR, NW), dtype=np.uint32)
    # sparsify so matches are non-trivial
    ppool &= rng.integers(0, 1 << 32, size=(1, PR, NW), dtype=np.uint32)
    ppool &= rng.integers(0, 1 << 32, size=(1, PR, NW), dtype=np.uint32)
    vpool = rng.random((1, PR, NW), np.float32).astype(np.float32) * 3.0
    sp_prow = np.full((V, NBLK), -1, np.int32)
    sp_ioff = np.full((V, NBLK), -1, np.int32)
    nxt = 0
    for v in range(V):
        for b in range(NBLK):
            if rng.random() < 0.8 and nxt < R:
                sp_prow[v, b] = nxt
                nxt += 1
    delw = (rng.integers(0, 1 << 32, size=(NBLK, NW), dtype=np.uint32)
            & rng.integers(0, 1 << 32, size=(NBLK, NW), dtype=np.uint32)
            & rng.integers(0, 1 << 32, size=(NBLK, NW), dtype=np.uint32))
    sid = (np.arange(NBLK, dtype=np.int32) * S) // NBLK
    slotmap = np.arange(V, dtype=np.int32)  # slot v -> row v of sp_prow
    tslot = np.full((Bq, T), -1, np.int32)
    treq = np.zeros((Bq, T), bool)
    tneg = np.zeros((Bq, T), bool)
    wsh = np.zeros((S, Bq, T), np.float32)
    for q in range(Bq - 1):          # leave the last row all-padding
        npos = int(rng.integers(1, T + 1))
        sl = rng.choice(V, size=npos, replace=False)
        pos = sorted(sl[:-1]) if npos > 1 and rng.random() < 0.3 \
            else sorted(sl)
        negs = [s for s in sl if s not in pos]
        for j, s in enumerate(pos):
            tslot[q, j] = s
            treq[q, j] = rng.random() < 0.3
            wsh[:, q, j] = rng.random(S).astype(np.float32) + 0.1
        for j, s in enumerate(negs):
            tslot[q, len(pos) + j] = s
            tneg[q, len(pos) + j] = True
    qargs = jnp.asarray(wand_mod._pack_qargs(slotmap, tslot, treq, tneg,
                                             wsh))
    filtw = (rng.integers(0, 1 << 32, size=(NBLK, NW), dtype=np.uint32)
             if with_filter else np.zeros((1, 1), np.uint32))
    args = (jnp.asarray(ppool), jnp.asarray(vpool),
            jnp.zeros((1, 1, NW), jnp.uint16), jnp.zeros((1, 64),
                                                         jnp.float32),
            jnp.asarray(sp_prow), jnp.asarray(sp_ioff),
            jnp.asarray(delw), jnp.asarray(sid), qargs,
            jnp.zeros((1, 1), jnp.int32), jnp.asarray(filtw),
            jnp.zeros((1, 1), jnp.float32))
    statics = dict(V=V, Bq=Bq, T=T, S=S, with_counts=True, NF=0, FCM=1,
                   with_filter=with_filter, rank_by_key=False,
                   with_three=True, BS=1, with_rescore=False)
    return args, statics


@pytest.mark.parametrize("T,with_filter", [(2, False), (4, False),
                                           (4, True), (8, False)])
def test_scan_parity_synthetic(T, with_filter):
    rng = np.random.default_rng(3 + T)
    args, statics = _synth(rng, T=T, with_filter=with_filter)
    out_x, _ = wand_mod.wand_scan(*args, **statics, PALLAS=0)
    out_p, _ = wand_mod.wand_scan(*args, **statics, PALLAS=2)
    out_x = np.asarray(out_x)
    out_p = np.asarray(out_p)
    nr = len(wand_mod.F_LADDER)
    # exact match counts (the last two packed lanes)
    np.testing.assert_array_equal(out_x[:, 2 * KP * nr:],
                                  out_p[:, 2 * KP * nr:])
    for f in range(nr):
        ub_x = out_x[:, 2 * KP * f: 2 * KP * f + KP]
        ub_p = out_p[:, 2 * KP * f: 2 * KP * f + KP]
        # UBs agree to fma-contraction tolerance; -inf padding must align
        np.testing.assert_array_equal(np.isinf(ub_x), np.isinf(ub_p))
        fin = np.isfinite(ub_x)
        np.testing.assert_allclose(ub_x[fin], ub_p[fin], rtol=3e-7)
        # where UB gaps exceed ulp noise, the selected regions agree
        id_x = out_x[:, 2 * KP * f + KP: 2 * KP * (f + 1)]
        id_p = out_p[:, 2 * KP * f + KP: 2 * KP * (f + 1)]
        gap_ok = np.ones_like(ub_x, bool)
        gap_ok[:, 1:] &= ub_x[:, 1:] < ub_x[:, :-1] * (1 - 1e-6)
        gap_ok[:, :-1] &= gap_ok[:, 1:]
        same = id_x == id_p
        assert (same | ~gap_ok | ~fin).all()


def test_scan_parity_t2_bitexact():
    """T=2 with no fma-sensitive chains beyond one mul+add per term: the
    packed buffers must agree bit-for-bit (counts AND ub lanes)."""
    rng = np.random.default_rng(11)
    args, statics = _synth(rng, T=2)
    out_x, _ = wand_mod.wand_scan(*args, **statics, PALLAS=0)
    out_p, _ = wand_mod.wand_scan(*args, **statics, PALLAS=2)
    ax, ap = np.asarray(out_x), np.asarray(out_p)
    if not np.array_equal(ax, ap):
        # fma contraction differences are tolerated, exact otherwise
        np.testing.assert_allclose(ax, ap, rtol=3e-7)


@pytest.fixture(scope="module")
def small_index(tmp_path_factory):
    rng = np.random.default_rng(7)
    vocab = [f"w{i:03d}" for i in range(120)]
    docs = [{"title": " ".join(rng.choice(vocab, 3)),
             "body": " ".join(rng.choice(vocab, 14))}
            for _ in range(9_000)]
    tmp = tmp_path_factory.mktemp("wandp")
    schema = [
        st.SchemaField("title", st.FieldType.Text, indexed=True, boost=10.0),
        st.SchemaField("body", st.FieldType.Text, indexed=True),
    ]
    idx = st.create_index(tmp / "ix", schema, shard_count=2)
    idx.index_documents(docs)
    idx.commit()
    return idx


def _pages(idx, queries, qtype):
    reqs = [st.SearchRequest(query=q, length=10,
                             result_type=st.ResultType.TopkCount,
                             query_type_default=qtype)
            for q in queries]
    out = []
    for rs in st.search_batch(idx, reqs):
        out.append((rs.result_count_total,
                    [(round(float(r.score), 3)) for r in rs.results]))
    return out


def test_e2e_pages_match_dense(small_index, monkeypatch):
    queries = ["w001 w002", "w003", "+w004 w005", "-w006 w007 w008",
               "w010 w011 w012 w013", "w000 w001", "w002 w009"]
    dense = _pages(small_index, queries, st.QueryType.Union)
    dense_i = _pages(small_index, queries[:5], st.QueryType.Intersection)
    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    monkeypatch.setenv("SEEKSTORM_TPU_WAND_PALLAS", "interp")
    small_index._device_dirty = True
    wand = _pages(small_index, queries, st.QueryType.Union)
    assert dense == wand
    wand_i = _pages(small_index, queries[:5], st.QueryType.Intersection)
    assert dense_i == wand_i
    monkeypatch.delenv("SEEKSTORM_TPU_WAND")
    monkeypatch.delenv("SEEKSTORM_TPU_WAND_PALLAS")
    small_index._device_dirty = True


@pytest.fixture(scope="module")
def small_index_s1(tmp_path_factory):
    rng = np.random.default_rng(17)
    vocab = [f"w{i:03d}" for i in range(120)]
    docs = [{"title": " ".join(rng.choice(vocab, 3)),
             "body": " ".join(rng.choice(vocab, 14))}
            for _ in range(9_000)]
    tmp = tmp_path_factory.mktemp("wandp1")
    schema = [
        st.SchemaField("title", st.FieldType.Text, indexed=True, boost=10.0),
        st.SchemaField("body", st.FieldType.Text, indexed=True),
    ]
    idx = st.create_index(tmp / "ix", schema, shard_count=1)
    idx.index_documents(docs)
    idx.commit()
    return idx


def test_dev_exact_matches_dense(small_index_s1, monkeypatch):
    """wand_exact_scan (full-coverage device evaluation for ladder
    stragglers) must match the dense kernels on every query shape —
    forced for ALL queries via SEEKSTORM_TPU_WAND_FORCE_DEV_EXACT."""
    idx = small_index_s1
    queries = ["w001 w002", "w003", "+w004 w005", "-w006 w007 w008",
               "w010 w011 w012 w013", "w000 w001"]
    dense = _pages(idx, queries, st.QueryType.Union)
    dense_i = _pages(idx, queries[:4], st.QueryType.Intersection)
    monkeypatch.setenv("SEEKSTORM_TPU_WAND", "1")
    monkeypatch.setenv("SEEKSTORM_TPU_WAND_FORCE_DEV_EXACT", "1")
    idx._device_dirty = True
    assert _pages(idx, queries, st.QueryType.Union) == dense
    assert _pages(idx, queries[:4], st.QueryType.Intersection) == dense_i
    monkeypatch.delenv("SEEKSTORM_TPU_WAND")
    monkeypatch.delenv("SEEKSTORM_TPU_WAND_FORCE_DEV_EXACT")
    idx._device_dirty = True
