"""Multi-chip execution: shards stacked on a device mesh axis, queries
replicated, per-shard top-k merged on device over ICI.

This is the TPU-native restatement of the reference's shard fan-out
(reference seekstorm/src/search.rs:1637-1743 — tokio task per shard, await,
merge): the shard axis becomes a jax.sharding.Mesh axis; all per-shard
index tensors are stacked [n_shards, ...] and sharded on axis 0; one jitted
program vmaps the per-shard scoring kernel and merges the per-shard top-k —
XLA inserts the all-gather over ICI for the final cross-shard merge, and a
psum-equivalent reduction for counts.  Doc-id globalization matches the
reference: global = shard_local * n_shards + shard_id (search.rs:1671).

Two kernels ride this executor:
  * the impact fast path (ops/lexical.lexical_scan_imp) — chunked row
    gathers over the compacted [P/128, 128] CSR + one-hot MXU decode; the
    default for queries on the schema boost profile;
  * the tf fallback (ops/lexical.lexical_scan) — window-gather kernel that
    recombines per-field tfs at query time, used for custom boost profiles
    (field_filter).  Its tensors upload lazily on first use.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..schema import BLOCK_SIZE
from ..utils import ceil_ladder, ceil_pow2
from ..ops.lexical import CHUNK


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("shards",))


# ---------------------------------------------------------------------------
# plan packing: the whole per-batch plan ships as ONE [S, L] i32 buffer
# (per-transfer latency through the TPU tunnel dominates; the per-shard rows
# shard cleanly over the mesh axis)


def _qsel_words(qsel_bool, NB, B):
    """bool[NB0, B0] per-query block-selection -> packed i32[NB, ceil(B/32)]
    bitmask words (bit q of word q//32 = query q selected the block)."""
    BW = (B + 31) // 32
    bits = np.zeros((NB, BW * 32), np.uint8)
    if qsel_bool is not None and qsel_bool.size:
        nb0, b0 = qsel_bool.shape
        bits[:nb0, :b0] = qsel_bool
    w = (bits.reshape(NB, BW, 32).astype(np.uint32)
         << np.arange(32, dtype=np.uint32))
    return np.ascontiguousarray(w.sum(axis=2, dtype=np.uint32)).view(np.int32)


def _pack_plan_imp(bi, c_row, c_se, qw, W, M, nr, dids, dsl):
    S = bi.shape[0]
    rows = []
    for s in range(S):
        rows.append(np.concatenate([
            bi[s].reshape(-1),
            c_row[s].reshape(-1),
            c_se[s].reshape(-1),
            qw[s].reshape(-1),
            W[s].reshape(-1).view(np.int32),
            M[s].reshape(-1).view(np.int32),
            nr[s].reshape(-1),
            dids[s].reshape(-1),
            dsl[s].reshape(-1),
        ]))
    return np.stack(rows)


def _unpack_plan_imp(row, NB, NC, V, B, VD=0, NW=1):
    BW = (B + 31) // 32
    sizes = [NB, NB * NW * NC, NB * NW * NC, NB * BW, B * V, B * V, B,
             NB * VD, NB * VD]
    offs = np.cumsum([0] + sizes)
    bi = row[offs[0]:offs[1]]
    c_row = row[offs[1]:offs[2]].reshape(NB, NW, NC)
    c_se = row[offs[2]:offs[3]].reshape(NB, NW, NC)
    qw = row[offs[3]:offs[4]].reshape(NB, BW)
    W = jax.lax.bitcast_convert_type(
        row[offs[4]:offs[5]], jnp.float32).reshape(B, V)
    M = jax.lax.bitcast_convert_type(
        row[offs[5]:offs[6]], jnp.float32).reshape(B, V)
    nr = row[offs[6]:offs[7]]
    did = row[offs[7]:offs[8]].reshape(NB, VD)
    dsl = row[offs[8]:offs[9]].reshape(NB, VD)
    return bi, c_row, c_se, qw, W, M, nr, did, dsl


def _pack_plan_tf(bi, so, sl, qw, W, M, nr, bst, dids, dsl):
    S = bi.shape[0]
    rows = []
    for s in range(S):
        rows.append(np.concatenate([
            bi[s].reshape(-1),
            so[s].reshape(-1),
            sl[s].reshape(-1),
            qw[s].reshape(-1),
            W[s].reshape(-1).view(np.int32),
            M[s].reshape(-1).view(np.int32),
            nr[s].reshape(-1),
            bst.reshape(-1).view(np.int32),
            dids[s].reshape(-1),
            dsl[s].reshape(-1),
        ]))
    return np.stack(rows)


def _unpack_plan_tf(row, NB, V, B, F, VD=0):
    BW = (B + 31) // 32
    sizes = [NB, NB * V, NB * V, NB * BW, B * V, B * V, B, V * F,
             NB * VD, NB * VD]
    offs = np.cumsum([0] + sizes)
    bi = row[offs[0]:offs[1]]
    so = row[offs[1]:offs[2]].reshape(NB, V)
    sl = row[offs[2]:offs[3]].reshape(NB, V)
    qw = row[offs[3]:offs[4]].reshape(NB, BW)
    W = jax.lax.bitcast_convert_type(
        row[offs[4]:offs[5]], jnp.float32).reshape(B, V)
    M = jax.lax.bitcast_convert_type(
        row[offs[5]:offs[6]], jnp.float32).reshape(B, V)
    nr = row[offs[6]:offs[7]]
    bst = jax.lax.bitcast_convert_type(
        row[offs[7]:offs[8]], jnp.float32).reshape(V, F)
    did = row[offs[8]:offs[9]].reshape(NB, VD)
    dsl = row[offs[9]:offs[10]].reshape(NB, VD)
    return bi, so, sl, qw, W, M, nr, bst, did, dsl


def _pack_plan_qt(bi, c_row, c_se, qid, W, M, nr, dids, dsl):
    S = bi.shape[0]
    rows = []
    for s in range(S):
        rows.append(np.concatenate([
            bi[s].reshape(-1),
            c_row[s].reshape(-1),
            c_se[s].reshape(-1),
            qid[s].reshape(-1),
            W[s].reshape(-1).view(np.int32),
            M[s].reshape(-1).view(np.int32),
            nr[s].reshape(-1),
            dids[s].reshape(-1),
            dsl[s].reshape(-1),
        ]))
    return np.stack(rows)


def _unpack_plan_qt(row, T, NC, QTn, V, B, VD=0, NW=1):
    sizes = [T, T * NW * NC, T * NW * NC, T * QTn, B * V, B * V, B,
             T * VD, T * VD]
    offs = np.cumsum([0] + sizes)
    bi = row[offs[0]:offs[1]]
    c_row = row[offs[1]:offs[2]].reshape(T, NW, NC)
    c_se = row[offs[2]:offs[3]].reshape(T, NW, NC)
    qid = row[offs[3]:offs[4]].reshape(T, QTn)
    W = jax.lax.bitcast_convert_type(
        row[offs[4]:offs[5]], jnp.float32).reshape(B, V)
    M = jax.lax.bitcast_convert_type(
        row[offs[5]:offs[6]], jnp.float32).reshape(B, V)
    nr = row[offs[6]:offs[7]]
    did = row[offs[7]:offs[8]].reshape(T, VD)
    dsl = row[offs[8]:offs[9]].reshape(T, VD)
    return bi, c_row, c_se, qid, W, M, nr, did, dsl


def _unpack_plan_join(row, B, V, NR, NS, NBp):
    sizes = [B * V * NR, B * V, B * V, B * V * NS, B * NBp,
             B * V, B * V, B]
    offs = np.cumsum([0] + sizes)
    rows = row[offs[0]:offs[1]].reshape(B, V, NR)
    packA = row[offs[1]:offs[2]].reshape(B, V)
    packB = row[offs[2]:offs[3]].reshape(B, V)
    segp = row[offs[3]:offs[4]].reshape(B, V, NS)
    rowtab = row[offs[4]:offs[5]].reshape(B, NBp)
    W = jax.lax.bitcast_convert_type(
        row[offs[5]:offs[6]], jnp.float32).reshape(B, V)
    flags = row[offs[6]:offs[7]].reshape(B, V)
    nreq = row[offs[7]:offs[8]]
    isreq = (flags & 1) > 0
    isneg = (flags & 2) > 0
    return rows, packA, packB, segp, rowtab, W, isreq, isneg, nreq


@functools.partial(
    jax.jit,
    static_argnames=("S", "shard_id", "B", "V", "NR", "NS", "NBp",
                     "PW", "k", "has_bm"),
)
def scan_one_shard_join(
    dev_docid, dev_imp, bitmaps, sat1, plan_buf,
    *,
    S: int, shard_id: int, B: int, V: int, NR: int, NS: int, NBp: int,
    PW: int, k: int, has_bm: bool,
):
    from ..ops.join import join_scan

    rows, packA, packB, segp, rowtab, W, isreq, isneg, nreq = \
        _unpack_plan_join(plan_buf, B, V, NR, NS, NBp)
    ts, ti = join_scan(
        dev_docid, dev_imp, sat1, bitmaps,
        rows, packA, packB, segp, rowtab, W, isreq, isneg, nreq,
        k=k, PW=PW, has_bm=has_bm,
    )
    gid = ti * S + shard_id
    cnt = jnp.zeros((B,), jnp.int32)
    fc = jnp.zeros((1, B, 1), jnp.float32)
    return ts, gid, cnt, fc


def make_sharded_scan_join(mesh, statics):
    """shard_map program (posting-space join path)."""
    from jax import shard_map

    from ..ops.join import join_scan

    S = statics["S"]

    SL = S // int(mesh.devices.size)

    def body(dev_docid, dev_imp, deleted, plan_buf, bitmaps, sat1):
        parts = []
        for j in range(SL):
            rows, packA, packB, segp, rowtab, W, isreq, isneg, nreq = \
                _unpack_plan_join(
                    plan_buf[j], statics["B"], statics["V"], statics["NR"],
                    statics["NS"], statics["NBp"])
            ts, ti = join_scan(
                dev_docid[j], dev_imp[j], sat1[j], bitmaps[j],
                rows, packA, packB, segp, rowtab, W, isreq, isneg, nreq,
                k=statics["k"], PW=statics["PW"], has_bm=statics["has_bm"],
            )
            B = ts.shape[0]
            cnt = jnp.zeros((B,), jnp.int32)
            fc = jnp.zeros((1, B, 1), jnp.float32)
            parts.append((ts, ti, cnt, fc))
        return _merge_body(parts, S, statics["k"])

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("shards"),) * 6,
        out_specs=(P("shards"), P("shards")),
        check_vma=False,
    )
    return jax.jit(lambda *a: tuple(x[0] for x in fn(*a)))


def _pack_result(ts, gid, cnt, fc):
    """Two result buffers (f32: scores|facets, i32: gids|counts) — a single
    device_get sync fetches both.  (Bitcasting small ints through f32 is
    unsafe: the values are denormals and get flushed to zero.)"""
    B = ts.shape[0]
    f32_part = jnp.concatenate(
        [ts, jnp.transpose(fc, (1, 0, 2)).reshape(B, -1)], axis=1)
    i32_part = jnp.concatenate([gid, cnt[:, None]], axis=1)
    return f32_part, i32_part


# ---------------------------------------------------------------------------
# single-device per-shard programs


@functools.partial(
    jax.jit,
    static_argnames=(
        "S", "shard_id", "NB", "NC", "V", "B", "VD", "NW",
        "k", "with_counts", "n_facets", "facet_codes_max",
        "use_sort_key", "sort_desc", "fast",
    ),
)
def scan_one_shard_imp(
    dev_docid, dev_imp, deleted,
    plan_buf, facet_codes, sort_key, bitmaps, sat1,
    *,
    S: int, shard_id: int, NB: int, NC: int, V: int, B: int, VD: int,
    NW: int, k: int, with_counts: bool, n_facets: int,
    facet_codes_max: int, use_sort_key: bool, sort_desc: bool,
    fast: bool,
):
    from ..ops.lexical import lexical_scan_imp

    bi, c_row, c_se, qw, W, M, nr, did, dsl = _unpack_plan_imp(
        plan_buf, NB, NC, V, B, VD, NW)
    ts, ti, cnt, fc = lexical_scan_imp(
        dev_docid, dev_imp, deleted,
        bi, c_row, c_se, qw, W, M, nr,
        facet_codes, sort_key, bitmaps, sat1, did, dsl,
        k=k, with_counts=with_counts, n_facets=n_facets,
        facet_codes_max=facet_codes_max, use_sort_key=use_sort_key,
        sort_desc=sort_desc, fast=fast,
    )
    gid = ti * S + shard_id
    return ts, gid, cnt, fc


@functools.partial(
    jax.jit,
    static_argnames=(
        "S", "shard_id", "T", "NC", "QTn", "V", "B", "VD", "NW",
        "k", "fast",
    ),
)
def scan_one_shard_qt(
    dev_docid, dev_imp, deleted, plan_buf, bitmaps, sat1,
    *,
    S: int, shard_id: int, T: int, NC: int, QTn: int, V: int, B: int,
    VD: int, NW: int, k: int, fast: bool,
):
    from ..ops.lexical import lexical_scan_qt

    bi, c_row, c_se, qid, W, M, nr, did, dsl = _unpack_plan_qt(
        plan_buf, T, NC, QTn, V, B, VD, NW)
    ts, ti = lexical_scan_qt(
        dev_docid, dev_imp, deleted,
        bi, c_row, c_se, qid, W, M, nr,
        bitmaps, sat1, did, dsl, k=k, fast=fast,
    )
    gid = ti * S + shard_id
    cnt = jnp.zeros((B,), jnp.int32)
    fc = jnp.zeros((1, B, 1), jnp.float32)
    return ts, gid, cnt, fc


def make_sharded_scan_qt(mesh, statics):
    """shard_map program (query-tiled pruned path)."""
    from jax import shard_map

    from ..ops.lexical import lexical_scan_qt

    S = statics["S"]

    SL = S // int(mesh.devices.size)

    def body(dev_docid, dev_imp, deleted, plan_buf, bitmaps, sat1):
        parts = []
        for j in range(SL):
            bi, c_row, c_se, qid, W, M, nr, did, dsl = _unpack_plan_qt(
                plan_buf[j], statics["T"], statics["NC"], statics["QTn"],
                statics["V"], statics["B"], statics["VD"], statics["NW"])
            ts, ti = lexical_scan_qt(
                dev_docid[j], dev_imp[j], deleted[j],
                bi, c_row, c_se, qid, W, M, nr,
                bitmaps[j], sat1[j], did, dsl,
                k=statics["k"], fast=statics["fast"],
            )
            B = ts.shape[0]
            cnt = jnp.zeros((B,), jnp.int32)
            fc = jnp.zeros((1, B, 1), jnp.float32)
            parts.append((ts, ti, cnt, fc))
        return _merge_body(parts, S, statics["k"])

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("shards"),) * 6,
        out_specs=(P("shards"), P("shards")),
        check_vma=False,
    )
    return jax.jit(lambda *a: tuple(x[0] for x in fn(*a)))


@functools.partial(
    jax.jit,
    static_argnames=(
        "S", "shard_id", "NB", "V", "B", "F", "VD",
        "P_max", "k", "with_counts", "n_facets", "facet_codes_max",
        "use_sort_key", "sort_desc",
    ),
)
def scan_one_shard_tf(
    pl_docid, pl_tf, comp, deleted,
    plan_buf, facet_codes, sort_key, dense_tf,
    *,
    S: int, shard_id: int, NB: int, V: int, B: int, F: int, VD: int,
    P_max: int, k: int, with_counts: bool, n_facets: int,
    facet_codes_max: int, use_sort_key: bool, sort_desc: bool,
):
    from ..ops.lexical import lexical_scan

    bi, so, sl, qw, W, M, nr, bst, did, dsl = _unpack_plan_tf(
        plan_buf, NB, V, B, F, VD)
    ts, ti, cnt, fc = lexical_scan(
        pl_docid, pl_tf, comp, deleted,
        bi, so, sl, qw, W, M, nr, bst,
        facet_codes, sort_key, dense_tf, did, dsl,
        P_max=P_max, k=k, with_counts=with_counts, n_facets=n_facets,
        facet_codes_max=facet_codes_max, use_sort_key=use_sort_key,
        sort_desc=sort_desc,
    )
    gid = ti * S + shard_id
    return ts, gid, cnt, fc


@functools.partial(jax.jit, static_argnames=("k",))
def merge_shard_results(ts_all, gid_all, cnt_all, fc_all, *, k: int):
    """[n, B, k] per-shard results -> merged packed result buffer."""
    n, B, _ = ts_all.shape
    ts_t = jnp.transpose(ts_all, (1, 0, 2)).reshape(B, n * k)
    gid_t = jnp.transpose(gid_all, (1, 0, 2)).reshape(B, n * k)
    mts, sel = jax.lax.top_k(ts_t, k)
    mgid = jnp.take_along_axis(gid_t, sel, axis=1)
    counts = jnp.sum(cnt_all, axis=0, dtype=jnp.int32)
    fcounts = jnp.sum(fc_all, axis=0)
    return _pack_result(mts, mgid, counts, fcounts)


# ---------------------------------------------------------------------------
# mesh (shard_map) programs


def _merge_body(parts, S, k):
    """parts: per-LOCAL-shard (ts, ti, cnt, fc) results on this device
    (devices own S // D contiguous shards each when the mesh is smaller
    than the shard count).  Globalizes doc ids, then merges across the
    mesh via ICI collectives."""
    SL = len(parts)
    didx = jax.lax.axis_index("shards")
    ts_l = jnp.stack([p[0] for p in parts])            # [SL, B, k]
    gid_l = jnp.stack([p[1] * S + (didx * SL + j)
                       for j, p in enumerate(parts)])
    cnt = sum(p[2] for p in parts)
    fc = sum(p[3] for p in parts)
    # ICI collectives: gather every shard's top-k, merge on device
    ts_all = jax.lax.all_gather(ts_l, "shards")        # [D, SL, B, k]
    gid_all = jax.lax.all_gather(gid_l, "shards")
    cnt_sum = jax.lax.psum(cnt, "shards")
    fc_sum = jax.lax.psum(fc, "shards")
    B = ts_l.shape[1]
    D = ts_all.shape[0]
    ts_t = jnp.transpose(ts_all, (2, 0, 1, 3)).reshape(B, D * SL * k)
    gid_t = jnp.transpose(gid_all, (2, 0, 1, 3)).reshape(B, D * SL * k)
    mts, sel = jax.lax.top_k(ts_t, k)
    mgid = jnp.take_along_axis(gid_t, sel, axis=1)
    f32_part, i32_part = _pack_result(mts, mgid, cnt_sum, fc_sum)
    return f32_part[None], i32_part[None]


def make_sharded_scan_imp(mesh, statics):
    """shard_map program (impact path): each device scans its own shard,
    then merges via all_gather/psum over ICI."""
    from jax import shard_map

    from ..ops.lexical import lexical_scan_imp

    S = statics["S"]

    SL = S // int(mesh.devices.size)

    def body(dev_docid, dev_imp, deleted, plan_buf, facet_codes, sort_key,
             bitmaps, sat1):
        parts = []
        for j in range(SL):
            bi, c_row, c_se, qw, W, M, nr, did, dsl = _unpack_plan_imp(
                plan_buf[j], statics["NB"], statics["NC"], statics["V"],
                statics["B"], statics["VD"], statics["NW"])
            ts, ti, cnt, fc = lexical_scan_imp(
                dev_docid[j], dev_imp[j], deleted[j],
                bi, c_row, c_se, qw, W, M, nr,
                facet_codes[j], sort_key[j], bitmaps[j], sat1[j], did, dsl,
                k=statics["k"], with_counts=statics["with_counts"],
                n_facets=statics["n_facets"],
                facet_codes_max=statics["facet_codes_max"],
                use_sort_key=statics["use_sort_key"],
                sort_desc=statics["sort_desc"], fast=statics["fast"],
            )
            parts.append((ts, ti, cnt, fc))
        return _merge_body(parts, S, statics["k"])

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("shards"),) * 8,
        out_specs=(P("shards"), P("shards")),
        check_vma=False,
    )
    return jax.jit(lambda *a: tuple(x[0] for x in fn(*a)))


def make_sharded_scan_tf(mesh, statics):
    """shard_map program (tf fallback path)."""
    from jax import shard_map

    from ..ops.lexical import lexical_scan

    S = statics["S"]

    SL = S // int(mesh.devices.size)

    def body(pl_docid, pl_tf, comp, deleted, plan_buf, facet_codes, sort_key,
             dense_tf):
        parts = []
        for j in range(SL):
            bi, so, sl, qw, W, M, nr, bst, did, dsl = _unpack_plan_tf(
                plan_buf[j], statics["NB"], statics["V"], statics["B"],
                statics["F"], statics["VD"])
            ts, ti, cnt, fc = lexical_scan(
                pl_docid[j], pl_tf[j], comp[j], deleted[j],
                bi, so, sl, qw, W, M, nr, bst,
                facet_codes[j], sort_key[j], dense_tf[j], did, dsl,
                P_max=statics["P_max"], k=statics["k"],
                with_counts=statics["with_counts"],
                n_facets=statics["n_facets"],
                facet_codes_max=statics["facet_codes_max"],
                use_sort_key=statics["use_sort_key"],
                sort_desc=statics["sort_desc"],
            )
            parts.append((ts, ti, cnt, fc))
        return _merge_body(parts, S, statics["k"])

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("shards"),) * 8,
        out_specs=(P("shards"), P("shards")),
        check_vma=False,
    )
    return jax.jit(lambda *a: tuple(x[0] for x in fn(*a)))


class StackedIndex:
    """Device tensors + executor for all shards.

    Two execution modes:
      * single-device (mesh=None): per-shard UNSTACKED arrays (no padding
        waste), a jitted per-shard scan, and an on-device cross-shard merge
        — per-shard results never leave the device until the final packed
        fetch;
      * mesh: arrays stacked [S, ...] and sharded over Mesh(("shards",)),
        one shard_map program per plan-shape with all_gather/psum merges
        over ICI.

    The impact-path tensors (compacted 2-D CSR + dense impact rows) upload
    at build; the tf-fallback tensors upload lazily on the first custom-
    boost-profile query.
    """

    def __init__(self, index, mesh: Mesh | None = None):
        self.index = index
        self.mesh = mesh
        self._aux_cache: dict = {}
        self._sharded_fns: dict = {}
        self._tf_ready = False
        self.build()

    def _put_row(self, x):
        if self.mesh is not None:
            return jax.device_put(x, NamedSharding(self.mesh, P("shards")))
        return jnp.asarray(x)

    def aux_device(self, key, dtype, builder):
        """Cache device uploads of auxiliary columns (facet codes, sort
        keys, filter masks) keyed by spec signature; builder() produces the
        host array only on a cache miss."""
        hit = self._aux_cache.get(key)
        if hit is not None:
            return hit
        dev = self._put_row(np.ascontiguousarray(builder().astype(dtype)))
        self._aux_cache[key] = dev
        return dev

    # -- array builders ----------------------------------------------------

    def _imp_arrays(self, sh):
        """(docid2d u16[R,128], imp2d f32[R,128], deleted bool[N],
        bitmaps u32[NBM, BLOCK//32], sat1 f32[N])"""
        lex = sh.lexical
        N = self.NB_pad * BLOCK_SIZE
        pc = len(lex.dev_docid) if lex.dev_docid is not None else 0
        R = max((pc + CHUNK - 1) // CHUNK, 1)
        d2 = np.zeros((R, CHUNK), np.uint16)
        i2 = np.zeros((R, CHUNK), np.float32)
        if pc:
            d2.reshape(-1)[:pc] = lex.dev_docid
            i2.reshape(-1)[:pc] = lex.dev_imp
        dl = np.zeros(N, bool)
        if sh.deleted:
            ids = np.fromiter(sh.deleted, dtype=np.int64)
            ids = ids[ids < N]
            dl[ids] = True
        bm = lex.bitmaps
        if bm is None or len(bm) == 0:
            bm = np.zeros((1, BLOCK_SIZE // 32), np.uint32)
        s1 = np.zeros(N, np.float32)
        if lex.sat1 is not None and len(lex.sat1):
            s1[: len(lex.sat1)] = lex.sat1
        return d2, i2, dl, bm, s1

    def _tf_arrays(self, sh):
        """(pl_docid u16[P], pl_tf u16[P,F], comp f32[N,F],
        dense_tf u16[ND, BLOCK, F]) — fallback path only."""
        lex = sh.lexical
        F = max(len(self.index.indexed_fields), 1)
        N = self.NB_pad * BLOCK_SIZE
        p = max(len(lex.pl_docid), 1)
        pd = np.zeros(p, np.uint16)
        pt = np.zeros((p, F), np.uint16)
        pd[: len(lex.pl_docid)] = lex.pl_docid
        pt[: len(lex.pl_tf)] = lex.pl_tf
        cp = np.ones((N, F), np.float32)
        if lex.comp is not None and len(lex.comp):
            cp[: len(lex.comp)] = lex.comp
        dt = lex.dense_tf
        if dt is None or len(dt) == 0:
            dt = np.zeros((1, BLOCK_SIZE, F), np.uint16)
        return pd, pt, cp, dt

    def build(self):
        idx = self.index
        S = idx.shard_count
        NB_pad = max(max(sh.lexical.n_blocks for sh in idx.shards), 1)
        self.NB_pad = NB_pad

        if self.mesh is None:
            self.per_shard = []
            for sh in idx.shards:
                self.per_shard.append(
                    tuple(jnp.asarray(x) for x in self._imp_arrays(sh))
                )
        else:
            arrs = [self._imp_arrays(sh) for sh in idx.shards]
            R_pad = max(a[0].shape[0] for a in arrs)
            NBM_pad = max(a[3].shape[0] for a in arrs)
            N = NB_pad * BLOCK_SIZE
            d2 = np.zeros((S, R_pad, CHUNK), np.uint16)
            i2 = np.zeros((S, R_pad, CHUNK), np.float32)
            dl = np.zeros((S, N), bool)
            bm = np.zeros((S, NBM_pad, BLOCK_SIZE // 32), np.uint32)
            s1 = np.zeros((S, N), np.float32)
            for s, a in enumerate(arrs):
                d2[s, : a[0].shape[0]] = a[0]
                i2[s, : a[1].shape[0]] = a[1]
                dl[s] = a[2]
                bm[s, : a[3].shape[0]] = a[3]
                s1[s] = a[4]
            self.dev_docid = self._put_row(d2)
            self.dev_imp = self._put_row(i2)
            self.deleted = self._put_row(dl)
            self.bitmaps = self._put_row(bm)
            self.sat1 = self._put_row(s1)

    def _ensure_tf(self):
        """Upload the tf-fallback tensors on first use."""
        if self._tf_ready:
            return
        idx = self.index
        if self.mesh is None:
            self.per_shard_tf = [
                tuple(jnp.asarray(x) for x in self._tf_arrays(sh))
                for sh in idx.shards
            ]
        else:
            S = idx.shard_count
            F = max(len(idx.indexed_fields), 1)
            arrs = [self._tf_arrays(sh) for sh in idx.shards]
            P_pad = max(ceil_pow2(a[0].shape[0], 128) for a in arrs)
            ND_pad = max(a[3].shape[0] for a in arrs)
            N = self.NB_pad * BLOCK_SIZE
            pl_docid = np.zeros((S, P_pad), np.uint16)
            pl_tf = np.zeros((S, P_pad, F), np.uint16)
            comp = np.ones((S, N, F), np.float32)
            dense = np.zeros((S, ND_pad, BLOCK_SIZE, F), np.uint16)
            for s, a in enumerate(arrs):
                pl_docid[s, : a[0].shape[0]] = a[0]
                pl_tf[s, : a[1].shape[0]] = a[1]
                comp[s] = a[2]
                dense[s, : a[3].shape[0]] = a[3]
            self.pl_docid = self._put_row(pl_docid)
            self.pl_tf = self._put_row(pl_tf)
            self.comp = self._put_row(comp)
            self.dense_tf = self._put_row(dense)
        self._tf_ready = True

    # -- execution ----------------------------------------------------------

    def run(self, plans, boosts, k: int, with_counts: bool,
            fcod_dev=None, facet_codes_max: int = 1,
            skey_dev=None, sort_desc: bool = True,
            allowed_dev=None):
        """plans: list of per-shard _ShardPlan (padded to common shapes).

        fcod_dev:    device i32[S, n_facets, N] facet codes (optional)
        skey_dev:    device f32[S, N] sort-key column (optional)
        allowed_dev: device bool[S, N] facet-filter mask (optional)
        """
        mode = next((p.mode for p in plans if p is not None), "imp")
        if mode == "qt":
            return self._run_qt_mode(plans, k)
        S = self.index.shard_count
        nb = max(max((p.block_ids.shape[0] for p in plans if p is not None),
                     default=1), 1)
        nb = ceil_ladder(nb, 4)
        v = max(max((p.W.shape[1] for p in plans if p is not None),
                    default=1), 1)
        v = ceil_pow2(v, 32)
        B_true = next(p.W.shape[0] for p in plans if p is not None)
        # batch-dim bucketing: servers see arbitrary batch sizes; padding to
        # a pow2 (>=16) keeps the number of compiled kernel shapes small.
        # Padded query rows have no weights/required slots -> no matches.
        B = ceil_pow2(B_true, 16)

        VD = max((p.dense_ids.shape[1] for p in plans
                  if p is not None and p.dense_ids is not None), default=0)

        BW = (B + 31) // 32
        bi = np.full((S, nb), -1, np.int32)
        qw = np.zeros((S, nb, BW), np.int32)
        W = np.zeros((S, B, v), np.float32)
        M = np.zeros((S, B, v), np.float32)
        nr = np.zeros((S, B), np.int32)
        dids = np.full((S, nb, VD), -1, np.int32)
        dsl = np.zeros((S, nb, VD), np.int32)
        for s, p in enumerate(plans):
            if p is None:
                continue
            NB0 = p.block_ids.shape[0]
            V0 = p.W.shape[1]
            bi[s, :NB0] = p.block_ids
            if p.qsel is not None:
                qw[s] = _qsel_words(p.qsel, nb, B)
            else:
                qw[s, :NB0] = -1  # no per-query selection: all queries
            W[s, :B_true, :V0] = p.W
            M[s, :B_true, :V0] = p.Mreq
            nr[s, :B_true] = p.nreq
            if VD and p.dense_ids is not None:
                vd0 = p.dense_ids.shape[1]
                dids[s, :NB0, :vd0] = p.dense_ids
                dsl[s, :NB0, :vd0] = p.dense_slots

        n_facets = int(fcod_dev.shape[1]) if fcod_dev is not None else 0
        use_sort = skey_dev is not None

        if mode == "imp":
            nc = max(max((p.c_row.shape[2] for p in plans
                          if p is not None and p.c_row is not None),
                         default=16), 16)
            nc = ceil_ladder(nc, 16)
            nw = max((p.c_row.shape[1] for p in plans
                      if p is not None and p.c_row is not None),
                     default=1)
            c_row = np.zeros((S, nb, nw, nc), np.int32)
            c_se = np.full((S, nb, nw, nc), 0xFF, np.int32)
            for s, p in enumerate(plans):
                if p is None or p.c_row is None:
                    continue
                NB0, NW0, NC0 = p.c_row.shape
                c_row[s, :NB0, :NW0, :NC0] = p.c_row
                c_se[s, :NB0, :NW0, :NC0] = p.c_se
            plan_rows = _pack_plan_imp(bi, c_row, c_se, qw, W, M, nr,
                                       dids, dsl)
            out = self._run_imp(
                plan_rows, S, nb, nc, v, B, VD, nw, k, with_counts,
                fcod_dev, facet_codes_max, skey_dev, use_sort, sort_desc,
                allowed_dev, n_facets,
            )
        else:
            self._ensure_tf()
            P_max = max(max((p.P_max for p in plans if p is not None),
                            default=128), 128)
            F = max(len(self.index.indexed_fields), 1)
            so = np.zeros((S, nb, v), np.int32)
            sl = np.zeros((S, nb, v), np.int32)
            for s, p in enumerate(plans):
                if p is None:
                    continue
                NB0, V0 = p.seg_len.shape
                so[s, :NB0, :V0] = p.seg_off
                sl[s, :NB0, :V0] = p.seg_len
            bst = np.zeros((v, boosts.shape[0]), np.float32)
            bst[:] = boosts[None, :]
            plan_rows = _pack_plan_tf(bi, so, sl, qw, W, M, nr, bst,
                                      dids, dsl)
            out = self._run_tf(
                plan_rows, S, nb, v, B, F, VD, P_max, k, with_counts,
                fcod_dev, facet_codes_max, skey_dev, use_sort, sort_desc,
                allowed_dev, n_facets,
            )

        # analytic MXU-FLOP estimate for the impact-path scan (decode einsum
        # + S/C score matmuls + dense rows) — feeds the bench's MFU metric
        from ..metrics import METRICS

        if mode == "imp":
            nw_f = c_row.shape[2]
            nc_f = c_row.shape[3]
            Z = BLOCK_SIZE // nw_f
            flops = S * nb * nw_f * nc_f * (
                2 * 128 * Z                           # one-hot decode einsum
                + 4 * B * Z                           # S and C matmuls
            ) + S * nb * 4 * B * VD * BLOCK_SIZE      # dense-row matmuls
            METRICS.inc("device_flops", float(flops))

        with METRICS.timer("lex_device"):
            f32_part, i32_part = jax.device_get(out)  # ONE D2H sync
        ts = f32_part[:B_true, :k]
        fcounts = f32_part[:B_true, k:].reshape(
            B_true, max(n_facets, 1), facet_codes_max).transpose(1, 0, 2)
        gid = i32_part[:B_true, :k]
        cnt = i32_part[:B_true, k]
        return ts, gid, cnt, fcounts

    def run_join(self, plan_bufs, statics):
        """Posting-space join path (ops/join.py; plans built by
        search._build_join_plans).  Returns (ts f32[B, k], gid i32[B, k])
        merged over shards."""
        from ..metrics import METRICS

        S = self.index.shard_count
        k = statics["k"]
        kw = {kk: vv for kk, vv in statics.items()}
        if self.mesh is None:
            results = []
            for s in range(S):
                d2, i2, _dl, bm, s1 = self.per_shard[s]
                results.append(scan_one_shard_join(
                    d2, i2, bm, s1, jnp.asarray(plan_bufs[s]),
                    S=S, shard_id=s, **kw,
                ))
            out = self._merge(results, k)
        else:
            kw["S"] = S
            key = ("join",) + tuple(sorted(kw.items()))
            fn = self._sharded_fns.get(key)
            if fn is None:
                fn = make_sharded_scan_join(self.mesh, kw)
                self._sharded_fns[key] = fn
            plan_dev = self._put_row(np.stack(plan_bufs))
            out = fn(self.dev_docid, self.dev_imp, self.deleted,
                     plan_dev, self.bitmaps, self.sat1)
        METRICS.inc("join_dispatch_total")
        with METRICS.timer("lex_device"):
            f32_part, i32_part = jax.device_get(out)
        B = statics["B"]
        return f32_part[:B, :k], i32_part[:B, :k]

    def _run_qt_mode(self, plans, k: int):
        """Query-tiled pruned path (plans built by _build_qt_plan)."""
        from ..metrics import METRICS
        from ..ops.lexical import QT, fast_mode

        S = self.index.shard_count
        T = max(max((p.block_ids.shape[0] for p in plans if p is not None),
                    default=1), 1)
        T = ceil_ladder(T, 4)
        v = max(max((p.W.shape[1] for p in plans if p is not None),
                    default=1), 1)
        v = ceil_pow2(v, 32)
        B_true = next(p.W.shape[0] for p in plans if p is not None)
        B = ceil_pow2(B_true, 16)
        VD = max((p.dense_ids.shape[1] for p in plans
                  if p is not None and p.dense_ids is not None), default=0)
        nc = max(max((p.c_row.shape[2] for p in plans
                      if p is not None and p.c_row is not None),
                     default=16), 16)
        nc = ceil_ladder(nc, 16)
        nw = max((p.c_row.shape[1] for p in plans
                  if p is not None and p.c_row is not None), default=1)

        bi = np.full((S, T), -1, np.int32)
        qid = np.full((S, T, QT), -1, np.int32)
        c_row = np.zeros((S, T, nw, nc), np.int32)
        c_se = np.full((S, T, nw, nc), 0xFF, np.int32)
        W = np.zeros((S, B, v), np.float32)
        M = np.zeros((S, B, v), np.float32)
        nr = np.zeros((S, B), np.int32)
        dids = np.full((S, T, VD), -1, np.int32)
        dsl = np.zeros((S, T, VD), np.int32)
        for s, p in enumerate(plans):
            if p is None:
                continue
            T0 = p.block_ids.shape[0]
            V0 = p.W.shape[1]
            NW0, NC0 = p.c_row.shape[1], p.c_row.shape[2]
            bi[s, :T0] = p.block_ids
            qid[s, :T0] = p.t_qid
            c_row[s, :T0, :NW0, :NC0] = p.c_row
            c_se[s, :T0, :NW0, :NC0] = p.c_se
            W[s, :B_true, :V0] = p.W
            M[s, :B_true, :V0] = p.Mreq
            nr[s, :B_true] = p.nreq
            if VD and p.dense_ids is not None:
                vd0 = p.dense_ids.shape[1]
                dids[s, :T0, :vd0] = p.dense_ids
                dsl[s, :T0, :vd0] = p.dense_slots

        plan_rows = _pack_plan_qt(bi, c_row, c_se, qid, W, M, nr, dids, dsl)
        METRICS.inc("qt_plan_bytes", float(plan_rows.nbytes))
        fast = fast_mode()
        statics = dict(S=S, T=T, NC=nc, QTn=QT, V=v, B=B, VD=VD, NW=nw,
                       k=k, fast=fast)
        if self.mesh is None:
            with METRICS.timer("qt_put"):
                plan_dev = jnp.asarray(plan_rows)
            results = []
            for s in range(S):
                d2, i2, dl, bm, s1 = self.per_shard[s]
                results.append(scan_one_shard_qt(
                    d2, i2, dl, plan_dev[s], bm, s1,
                    shard_id=s, **statics,
                ))
            out = self._merge(results, k)
        else:
            key = ("qt",) + tuple(sorted(statics.items()))
            fn = self._sharded_fns.get(key)
            if fn is None:
                fn = make_sharded_scan_qt(self.mesh, statics)
                self._sharded_fns[key] = fn
            plan_dev = self._put_row(plan_rows)
            out = fn(self.dev_docid, self.dev_imp, self.deleted,
                     plan_dev, self.bitmaps, self.sat1)

        Zq = BLOCK_SIZE // nw
        flops = S * T * (
            nw * nc * (2 * 128 * Zq + 4 * QT * Zq)
            + 4 * QT * VD * BLOCK_SIZE
        )
        METRICS.inc("device_flops", float(flops))
        with METRICS.timer("lex_device"), METRICS.timer("qt_fetch"):
            f32_part, i32_part = jax.device_get(out)
        ts = f32_part[:B_true, :k]
        gid = i32_part[:B_true, :k]
        cnt = i32_part[:B_true, k]
        fcounts = np.zeros((1, B_true, 1), np.float64)
        return ts, gid, cnt, fcounts

    def _run_imp(self, plan_rows, S, nb, nc, v, B, VD, nw, k, with_counts,
                 fcod_dev, facet_codes_max, skey_dev, use_sort, sort_desc,
                 allowed_dev, n_facets):
        from ..ops.lexical import fast_mode

        fast = fast_mode()
        if self.mesh is None:
            plan_dev = jnp.asarray(plan_rows)  # ONE upload
            results = []
            for s in range(S):
                d2, i2, dl, bm, s1 = self.per_shard[s]
                if allowed_dev is not None:
                    dl = _merge_deleted(dl, allowed_dev[s])
                fcod = (fcod_dev[s] if fcod_dev is not None
                        else jnp.zeros((1, 1), jnp.int32))
                skey = (skey_dev[s] if use_sort
                        else jnp.zeros((1,), jnp.float32))
                results.append(scan_one_shard_imp(
                    d2, i2, dl, plan_dev[s], fcod, skey, bm, s1,
                    S=S, shard_id=s, NB=nb, NC=nc, V=v, B=B, VD=VD,
                    NW=nw, k=k, with_counts=with_counts,
                    n_facets=n_facets, facet_codes_max=facet_codes_max,
                    use_sort_key=use_sort, sort_desc=sort_desc, fast=fast,
                ))
            return self._merge(results, k)
        statics = dict(
            S=S, NB=nb, NC=nc, V=v, B=B, VD=VD, NW=nw, k=k, fast=fast,
            with_counts=with_counts, n_facets=n_facets,
            facet_codes_max=facet_codes_max, use_sort_key=use_sort,
            sort_desc=sort_desc,
        )
        key = ("imp",) + tuple(sorted(statics.items()))
        fn = self._sharded_fns.get(key)
        if fn is None:
            fn = make_sharded_scan_imp(self.mesh, statics)
            self._sharded_fns[key] = fn
        deleted = self.deleted
        if allowed_dev is not None:
            deleted = _merge_deleted(self.deleted, allowed_dev)
        fcod = (fcod_dev if fcod_dev is not None
                else self._put_row(np.zeros((S, 1, 1), np.int32)))
        skey = (skey_dev if use_sort
                else self._put_row(np.zeros((S, 1), np.float32)))
        plan_dev = self._put_row(plan_rows)
        return fn(self.dev_docid, self.dev_imp, deleted,
                  plan_dev, fcod, skey, self.bitmaps, self.sat1)

    def _run_tf(self, plan_rows, S, nb, v, B, F, VD, P_max, k, with_counts,
                fcod_dev, facet_codes_max, skey_dev, use_sort, sort_desc,
                allowed_dev, n_facets):
        if self.mesh is None:
            plan_dev = jnp.asarray(plan_rows)
            results = []
            for s in range(S):
                pd, pt, cp, dt = self.per_shard_tf[s]
                dl = self.per_shard[s][2]
                if allowed_dev is not None:
                    dl = _merge_deleted(dl, allowed_dev[s])
                fcod = (fcod_dev[s] if fcod_dev is not None
                        else jnp.zeros((1, 1), jnp.int32))
                skey = (skey_dev[s] if use_sort
                        else jnp.zeros((1,), jnp.float32))
                results.append(scan_one_shard_tf(
                    pd, pt, cp, dl, plan_dev[s], fcod, skey, dt,
                    S=S, shard_id=s, NB=nb, V=v, B=B, F=F, VD=VD,
                    P_max=P_max, k=k, with_counts=with_counts,
                    n_facets=n_facets, facet_codes_max=facet_codes_max,
                    use_sort_key=use_sort, sort_desc=sort_desc,
                ))
            return self._merge(results, k)
        statics = dict(
            S=S, NB=nb, V=v, B=B, F=F, VD=VD, P_max=P_max, k=k,
            with_counts=with_counts, n_facets=n_facets,
            facet_codes_max=facet_codes_max, use_sort_key=use_sort,
            sort_desc=sort_desc,
        )
        key = ("tf",) + tuple(sorted(statics.items()))
        fn = self._sharded_fns.get(key)
        if fn is None:
            fn = make_sharded_scan_tf(self.mesh, statics)
            self._sharded_fns[key] = fn
        deleted = self.deleted
        if allowed_dev is not None:
            deleted = _merge_deleted(self.deleted, allowed_dev)
        fcod = (fcod_dev if fcod_dev is not None
                else self._put_row(np.zeros((S, 1, 1), np.int32)))
        skey = (skey_dev if use_sort
                else self._put_row(np.zeros((S, 1), np.float32)))
        plan_dev = self._put_row(plan_rows)
        return fn(self.pl_docid, self.pl_tf, self.comp, deleted,
                  plan_dev, fcod, skey, self.dense_tf)

    def _merge(self, results, k):
        ts_all = jnp.stack([r[0] for r in results])
        gid_all = jnp.stack([r[1] for r in results])
        cnt_all = jnp.stack([r[2] for r in results])
        fc_all = jnp.stack([r[3] for r in results])
        return merge_shard_results(ts_all, gid_all, cnt_all, fc_all, k=k)


@jax.jit
def _merge_deleted(deleted, allowed):
    return deleted | ~allowed
