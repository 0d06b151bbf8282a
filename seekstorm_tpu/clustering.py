"""IVF clustering: k-means seeding + Lloyd iterations on device (MXU
distance matrices), snapped to medoids, with the reference's sizing and
layout conventions.

Reference behavior mirrored (reference seekstorm/src/clustering.rs:229-500,
vector.rs:969-1100): clustering runs per committed level when the level has
>= min_points vectors; k = 2*sqrt(n) for Auto; records are re-sorted by
cluster with the medoid as the first record of each cluster so nprobe
selection reads medoids for free.  The reference's PAM-style refinement is
replaced by Lloyd iterations + medoid snap — distance computation is where
the time goes, and on TPU it is a matmul.
"""

from __future__ import annotations

import os

import numpy as np

from .schema import ClusteringConfig, ClusteringMode, VectorSimilarity


def cluster_level(
    vecs: np.ndarray,                  # f32[N, d] (normalized for cosine)
    similarity: VectorSimilarity,
    cfg: ClusteringConfig,
    seed: int = 7,
) -> tuple[np.ndarray, np.ndarray]:
    """Cluster one level's vectors.

    Returns (order, cluster_offsets):
      order: i64[N] permutation — rows sorted by cluster, medoid first
      cluster_offsets: i64[C+1] ranges into the permuted rows
    """
    n = len(vecs)
    if (
        cfg.mode == ClusteringMode.Null
        or n < cfg.min_points
        or n < 4
    ):
        return np.arange(n, dtype=np.int64), np.array([0, n], dtype=np.int64)

    if cfg.mode == ClusteringMode.Fixed and cfg.cluster_count > 0:
        k = min(cfg.cluster_count, n)
    else:
        k = max(1, min(int(2 * np.sqrt(n)), n))

    algo = os.environ.get("SEEKSTORM_TPU_CLUSTER_ALGO", "lloyd")
    if algo == "pam":
        order, offsets = _pam_build_order(vecs, k, similarity)
        if order is not None:
            return order, offsets
    assign, centers = _kmeans(vecs, k, similarity, cfg.iterations, seed)

    # medoid per cluster: nearest real vector to the center.  One argsort
    # instead of per-cluster flatnonzero (O(n log n) vs O(n*k))
    order_all = np.argsort(assign, kind="stable")
    bounds = np.searchsorted(assign[order_all], np.arange(k + 1))
    order_chunks = []
    offsets = [0]
    x = vecs.astype(np.float32)
    for c in range(k):
        rows = order_all[bounds[c] : bounds[c + 1]]
        if len(rows) == 0:
            continue
        sims = _sim(x[rows], centers[c : c + 1], similarity)[:, 0]
        medoid = rows[int(np.argmax(sims))]
        rest = rows[rows != medoid]
        order_chunks.append(np.concatenate([[medoid], rest]))
        offsets.append(offsets[-1] + len(rows))
    order = np.concatenate(order_chunks).astype(np.int64)
    return order, np.asarray(offsets, dtype=np.int64)


def _pam_build_order(vecs, k, similarity):
    """Reference-style sampled greedy k-medoid BUILD
    (clustering.rs:229-500) restated as matmuls:

    * first medoid = the vector most similar to the (strided) mean;
    * each further medoid = the strided CANDIDATE maximizing
      sum_j max(0, sim(cand, j) - best_sim_so_far(j)) over a strided
      gain SAMPLE — the point whose adoption most raises total assigned
      similarity (facility-location greedy, what PAM's BUILD phase does);
    * final assignment = exact argmax over all k medoids (the reference's
      chronological switch-if-closer converges to the same thing: each
      doc keeps the max over every medoid it was compared against).

    All pairwise similarities are batched matmuls: candidates x sample
    for gains, docs x medoids (chunked) for assignment.  Returns
    (order, offsets) like cluster_level, or (None, None) when k < 2.
    """
    n = len(vecs)
    if k < 2:
        return None, None
    import jax
    import jax.numpy as jnp

    x = vecs.astype(np.float32)
    # reference-derived sampling (clustering.rs:241-247); the candidate
    # pool is widened to >= 2k so the fixed pool can supply every medoid
    # (the reference instead rotates a small pool's stride offset per
    # round, which forces a fresh similarity matrix per medoid — a fixed
    # wide pool keeps the whole greedy build ONE device program)
    sample_size = max(int(n / (1.0 + n * 0.0025)), 1)
    m_step = max(n // max(sample_size, 2 * k), 1)
    v_step = max(n // sample_size // 16, 1)

    cand = np.arange(0, n, m_step)
    samp = np.arange(0, n, v_step)
    mean = x[samp].mean(axis=0, keepdims=True)
    first = int(np.argmax(_sim(x, mean, similarity)[:, 0]))

    S = jnp.asarray(_sim(x[cand], x[samp], similarity)
                    .astype(np.float32))            # [nc, ns]
    cur0 = jnp.asarray(
        _sim(x[samp], x[first: first + 1], similarity)[:, 0]
        .astype(np.float32))
    used0 = jnp.asarray(cand == first)
    k_eff = int(min(k, len(cand)))

    @jax.jit
    def _greedy(S, cur, used):
        def body(i, state):
            cur, used, meds = state
            gains = jnp.sum(jnp.maximum(S - cur[None, :], 0.0), axis=1)
            gains = jnp.where(used, -jnp.inf, gains)
            ci = jnp.argmax(gains)
            used = used.at[ci].set(True)
            meds = meds.at[i].set(ci)
            cur = jnp.maximum(cur, S[ci])
            return cur, used, meds
        meds = jnp.zeros(max(k_eff - 1, 1), jnp.int32)
        _, _, meds = jax.lax.fori_loop(0, k_eff - 1, body,
                                       (cur, used, meds))
        return meds

    meds_ci = np.asarray(_greedy(S, cur0, used0))[: k_eff - 1]
    med = np.concatenate([[first], cand[meds_ci]]).astype(np.int64)
    # the used-mask guarantees distinct pool entries; `first` could
    # coincide with a pool entry only if the mask missed it
    med = med[np.sort(np.unique(med, return_index=True)[1])]
    assign = _assign_nearest(x, x[med], similarity)
    # docs sorted by cluster, medoid first (same layout as cluster_level)
    order_all = np.argsort(assign, kind="stable")
    bounds = np.searchsorted(assign[order_all], np.arange(len(med) + 1))
    order_chunks = []
    offsets = [0]
    for c in range(len(med)):
        rows = order_all[bounds[c]: bounds[c + 1]]
        if len(rows) == 0:
            continue
        mrow = med[c]
        if (rows == mrow).any():
            chunk = np.concatenate([[mrow], rows[rows != mrow]])
        else:
            # an identical twin medoid won the argmax tie; the cluster's
            # first row serves as its representative
            chunk = rows
        order_chunks.append(chunk)
        offsets.append(offsets[-1] + len(chunk))
    order = np.concatenate(order_chunks).astype(np.int64)
    return order, np.asarray(offsets, np.int64)


def _assign_nearest(x, medvecs, similarity):
    """argmax-similarity assignment of every row to a medoid (chunked
    device matmuls, same tiling rules as the Lloyd step)."""
    import jax
    import jax.numpy as jnp

    n, d = x.shape
    k = len(medvecs)
    chunk = n
    while chunk * k > (1 << 28):
        chunk //= 2
    chunk = min(max(chunk, 1 << 14), max((1 << 26) // (d * 4), 1 << 12))

    @jax.jit
    def _chunk(C, xc):
        return jnp.argmax(_sim_j(xc, C, similarity), axis=1)

    Cj = jnp.asarray(medvecs.astype(np.float32))
    assign = np.zeros(n, np.int64)
    for a in range(0, n, chunk):
        assign[a: a + chunk] = np.asarray(_chunk(Cj, jnp.asarray(x[a: a + chunk])))
    return assign


def _sim(a: np.ndarray, b: np.ndarray, similarity: VectorSimilarity) -> np.ndarray:
    """Similarity (higher = closer) between rows of a [n,d] and b [m,d]."""
    dots = a @ b.T
    if similarity == VectorSimilarity.Euclidean:
        na = (a * a).sum(axis=1)[:, None]
        nb = (b * b).sum(axis=1)[None, :]
        return -(na + nb - 2 * dots)
    return dots


def _kmeans(
    x: np.ndarray, k: int, similarity: VectorSimilarity, iters: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Device k-means (jnp matmuls) with kmeans++-lite seeding."""
    import jax
    import jax.numpy as jnp

    n, d = x.shape
    rng = np.random.default_rng(seed)
    # subsample for seeding/refinement on very large levels (reference
    # subsamples similarly, clustering.rs:241-247)
    sample = min(n, max(4 * k, 4096))
    sub = rng.choice(n, size=sample, replace=False) if sample < n else np.arange(n)

    # seeding: start from the vector nearest the mean (reference
    # clustering.rs:260-315), then greedy farthest-point on the subsample
    xs = x[sub]
    mean = xs.mean(axis=0, keepdims=True)
    first = int(np.argmax(_sim(xs, mean, similarity)[:, 0]))
    centers = [xs[first]]
    best_sim = _sim(xs, xs[first : first + 1], similarity)[:, 0]
    for _ in range(k - 1):
        nxt = int(np.argmin(best_sim))
        centers.append(xs[nxt])
        best_sim = np.maximum(best_sim, _sim(xs, xs[nxt : nxt + 1], similarity)[:, 0])
    C = np.stack(centers).astype(np.float32)

    # tile the Lloyd step: (a) the [n, k] similarity matrix must fit HBM
    # comfortably (global re-clustering runs at millions x thousands);
    # (b) single uploads through the device tunnel are size-limited
    # (~250 MB POSTs fail with HTTP 413), so chunks cap at 64 MB
    chunk = n
    while chunk * k > (1 << 28):
        chunk //= 2
    chunk = min(max(chunk, 1 << 14), max((1 << 26) // (d * 4), 1 << 12))

    @jax.jit
    def assign_chunk(C, xc):
        sims = _sim_j(xc, C, similarity)
        a = jnp.argmax(sims, axis=1)
        oh = jax.nn.one_hot(a, C.shape[0], dtype=jnp.float32)
        return a, oh.T @ xc, oh.sum(axis=0)

    Cj = jnp.asarray(C)
    xchunks = [jnp.asarray(x[a : a + chunk]) for a in range(0, n, chunk)]
    assign = np.zeros(n, np.int64)
    for _ in range(max(iters, 1)):
        sums = np.zeros((k, d), np.float64)
        counts = np.zeros(k, np.float64)
        pos = 0
        for xc in xchunks:
            a, s, c = jax.device_get(assign_chunk(Cj, xc))
            assign[pos : pos + len(a)] = a
            sums += s
            counts += c
            pos += len(a)
        newC = np.where(counts[:, None] > 0,
                        sums / np.maximum(counts[:, None], 1),
                        np.asarray(Cj))
        Cj = jnp.asarray(newC.astype(np.float32))
    return assign, np.asarray(Cj)


def _sim_j(a, b, similarity: VectorSimilarity):
    import jax.numpy as jnp

    dots = a @ b.T
    if similarity == VectorSimilarity.Euclidean:
        na = (a * a).sum(axis=1)[:, None]
        nb = (b * b).sum(axis=1)[None, :]
        return -(na + nb - 2 * dots)
    return dots
