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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..schema import BLOCK_SIZE
from ..utils import ceil_pow2


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("shards",))


@functools.partial(jax.jit, static_argnames=("P_max", "k", "with_counts"))
def score_shards_stacked(
    pl_docid,    # u16[S, P_pad]
    pl_tf,       # u16[S, P_pad, F]
    comp,        # f32[S, NB_pad*BLOCK, F]
    deleted,     # bool[S, NB_pad*BLOCK]
    block_ids,   # i32[S, NB]
    seg_off,     # i32[S, NB, V]
    seg_len,     # i32[S, NB, V]
    W,           # f32[S, B, V]
    Mreq,        # f32[S, B, V]
    nreq,        # i32[S, B]
    boosts,      # f32[V, F]
    *,
    P_max: int,
    k: int,
    with_counts: bool,
):
    """All shards scored in parallel (vmap over the sharded axis), then the
    per-shard top-k lists merge into one global top-k per query.

    Returns (scores f32[B, k], global_ids i64[B, k], counts i32[B]).
    """
    from ..ops.lexical import score_shard

    S = pl_docid.shape[0]

    def per_shard(args):
        pd, pt, cp, dl, bi, so, sl, w, m, nr = args
        return score_shard(
            pd, pt, cp, dl, bi, so, sl, w, m, nr, boosts,
            P_max=P_max, k=k, with_counts=with_counts,
        )

    ts, ti, cnt = jax.vmap(
        lambda pd, pt, cp, dl, bi, so, sl, w, m, nr: per_shard(
            (pd, pt, cp, dl, bi, so, sl, w, m, nr)
        )
    )(pl_docid, pl_tf, comp, deleted, block_ids, seg_off, seg_len, W, Mreq, nreq)
    # ts/ti: [S, B, k]; globalize doc ids (reference search.rs:1671)
    shard_ids = jnp.arange(S, dtype=jnp.int32)[:, None, None]
    gid = ti * S + shard_ids
    # cross-shard merge: [S, B, k] -> [B, S*k] -> top_k  (all-gather over ICI)
    ts_t = jnp.transpose(ts, (1, 0, 2)).reshape(ts.shape[1], S * k)
    gid_t = jnp.transpose(gid, (1, 0, 2)).reshape(ts.shape[1], S * k)
    mts, sel = jax.lax.top_k(ts_t, k)
    mgid = jnp.take_along_axis(gid_t, sel, axis=1)
    counts = jnp.sum(cnt, axis=0, dtype=jnp.int32)
    return mts, mgid, counts


@functools.partial(
    jax.jit,
    static_argnames=(
        "P_max", "k", "with_counts", "n_facets", "facet_codes_max",
        "use_sort_key", "sort_desc",
    ),
)
def scan_shards_stacked(
    pl_docid, pl_tf, comp, deleted,
    block_ids, seg_off, seg_len, W, Mreq, nreq, boosts,
    facet_codes,   # i32[S, n_facets, N] (dummy when n_facets == 0)
    sort_key,      # f32[S, N]           (dummy when not use_sort_key)
    *,
    P_max: int,
    k: int,
    with_counts: bool,
    n_facets: int,
    facet_codes_max: int,
    use_sort_key: bool,
    sort_desc: bool,
):
    """General stacked scan: scoring/sorting + counts + facet histograms,
    merged across the shard axis on device."""
    from ..ops.lexical import lexical_scan

    S = pl_docid.shape[0]
    ts, ti, cnt, fc = jax.vmap(
        lambda pd, pt, cp, dl, bi, so, sl, w, m, nr, fcod, skey: lexical_scan(
            pd, pt, cp, dl, bi, so, sl, w, m, nr, boosts, fcod, skey,
            P_max=P_max, k=k, with_counts=with_counts, n_facets=n_facets,
            facet_codes_max=facet_codes_max, use_sort_key=use_sort_key,
            sort_desc=sort_desc,
        )
    )(pl_docid, pl_tf, comp, deleted, block_ids, seg_off, seg_len, W, Mreq,
      nreq, facet_codes, sort_key)
    shard_ids = jnp.arange(S, dtype=jnp.int32)[:, None, None]
    gid = ti * S + shard_ids
    B = ts.shape[1]
    ts_t = jnp.transpose(ts, (1, 0, 2)).reshape(B, S * k)
    gid_t = jnp.transpose(gid, (1, 0, 2)).reshape(B, S * k)
    mts, sel = jax.lax.top_k(ts_t, k)
    mgid = jnp.take_along_axis(gid_t, sel, axis=1)
    counts = jnp.sum(cnt, axis=0, dtype=jnp.int32)
    fcounts = jnp.sum(fc, axis=0)  # [n_facets, B, FCM]
    return mts, mgid, counts, fcounts


class StackedIndex:
    """Stacked + (optionally) mesh-sharded device tensors for all shards."""

    def __init__(self, index, mesh: Mesh | None = None):
        self.index = index
        self.mesh = mesh
        self._aux_cache: dict = {}
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

    def build(self):
        idx = self.index
        S = idx.shard_count
        F = max(len(idx.indexed_fields), 1)
        P_pad = 1
        NB_pad = 1
        for sh in idx.shards:
            P_pad = max(P_pad, ceil_pow2(max(len(sh.lexical.pl_docid), 1), 128))
            NB_pad = max(NB_pad, max(sh.lexical.n_blocks, 1))
        pl_docid = np.zeros((S, P_pad), np.uint16)
        pl_tf = np.zeros((S, P_pad, F), np.uint16)
        comp = np.ones((S, NB_pad * BLOCK_SIZE, F), np.float32)
        deleted = np.zeros((S, NB_pad * BLOCK_SIZE), bool)
        for s, sh in enumerate(idx.shards):
            lex = sh.lexical
            p = len(lex.pl_docid)
            pl_docid[s, :p] = lex.pl_docid
            pl_tf[s, :p] = lex.pl_tf
            if lex.comp is not None and len(lex.comp):
                comp[s, : len(lex.comp)] = lex.comp
            if sh.deleted:
                ids = np.fromiter(sh.deleted, dtype=np.int64)
                ids = ids[ids < NB_pad * BLOCK_SIZE]
                deleted[s, ids] = True

        if self.mesh is not None:
            row = NamedSharding(self.mesh, P("shards"))
            put = lambda x: jax.device_put(x, row)
        else:
            put = jnp.asarray
        self.pl_docid = put(pl_docid)
        self.pl_tf = put(pl_tf)
        self.comp = put(comp)
        self.deleted = put(deleted)
        self.NB_pad = NB_pad
        self.P_pad = P_pad

    def run(self, plans, boosts, k: int, with_counts: bool,
            fcod_dev=None, facet_codes_max: int = 1,
            skey_dev=None, sort_desc: bool = True,
            allowed_dev=None):
        """plans: list of per-shard _ShardPlan (padded to common shapes).

        fcod_dev:    device i32[S, n_facets, N] facet codes (optional)
        skey_dev:    device f32[S, N] sort-key column (optional)
        allowed_dev: device bool[S, N] facet-filter mask (optional)
        """
        S = self.index.shard_count
        nb = max(max((p.seg_len.shape[0] for p in plans if p is not None),
                     default=1), 1)
        nb = ceil_pow2(nb, 4)
        v = max(max((p.seg_len.shape[1] for p in plans if p is not None),
                    default=1), 1)
        v = ceil_pow2(v, 8)
        P_max = max(max((p.P_max for p in plans if p is not None), default=128),
                    128)
        B = next(p.W.shape[0] for p in plans if p is not None)

        bi = np.full((S, nb), -1, np.int32)
        so = np.zeros((S, nb, v), np.int32)
        sl = np.zeros((S, nb, v), np.int32)
        W = np.zeros((S, B, v), np.float32)
        M = np.zeros((S, B, v), np.float32)
        nr = np.zeros((S, B), np.int32)
        for s, p in enumerate(plans):
            if p is None:
                continue
            NB0, V0 = p.seg_len.shape
            bi[s, :NB0] = p.block_ids
            so[s, :NB0, :V0] = p.seg_off
            sl[s, :NB0, :V0] = p.seg_len
            W[s, :, :V0] = p.W
            M[s, :, :V0] = p.Mreq
            nr[s] = p.nreq
        bst = np.zeros((v, boosts.shape[0]), np.float32)
        bst[:] = boosts[None, :]

        put = self._put_row

        deleted = self.deleted
        if allowed_dev is not None:
            deleted = _merge_deleted(self.deleted, allowed_dev)

        n_facets = 0
        fcod = jnp.zeros((S, 1, 1), jnp.int32)
        if fcod_dev is not None:
            fcod = fcod_dev
            n_facets = fcod.shape[1]
        skey = jnp.zeros((S, 1), jnp.float32)
        use_sort = skey_dev is not None
        if use_sort:
            skey = skey_dev

        ts, gid, cnt, fcounts = scan_shards_stacked(
            self.pl_docid, self.pl_tf, self.comp, deleted,
            put(bi), put(so), put(sl), put(W), put(M), put(nr),
            jnp.asarray(bst), fcod, skey,
            P_max=P_max, k=k, with_counts=with_counts,
            n_facets=n_facets, facet_codes_max=facet_codes_max,
            use_sort_key=use_sort, sort_desc=sort_desc,
        )
        return jax.device_get((ts, gid, cnt, fcounts))  # one D2H sync


@jax.jit
def _merge_deleted(deleted, allowed):
    return deleted | ~allowed
