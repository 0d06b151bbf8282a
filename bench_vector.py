"""Vector recall/latency benchmark at SIFT1M/GIST1M scale with synthetic
proxy datasets (this environment has no egress for the real files; the
fvecs/ivecs loaders + console `searchsift` accept the real ones unchanged,
reference server.rs:455-720).

Proxies match the originals' shape and value statistics:
  * SIFT proxy:  1M x 128d, integer-valued in [0, 255], clustered
    (mixture of ~1K centers + noise) — SQ-i8, Euclidean.
  * GIST proxy:  1M x 960d, floats in [0, 1], smoother cluster structure.

Reports nprobe -> recall@10 + mean latency curves against exact f32
ground truth (computed on-device in tiles), comparable to BASELINE rows
6-9 (reference README.md:246-254: SIFT1M nprobe=16 95%@188us,
nprobe=33 99%@302us; GIST1M nprobe=38 95%, nprobe=80 98%).

Usage: python bench_vector.py [--dataset sift|gist] [--n 1000000]
                              [--queries 256] [--nprobe 8,16,33,64,128]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time

import numpy as np


def make_proxy(dataset: str, n: int, rng) -> tuple[np.ndarray, np.ndarray]:
    """(base [n, d], queries [q, d]) with SIFT/GIST-like statistics."""
    if dataset == "sift":
        d, n_centers, noise, hi = 128, 1024, 18.0, 255.0
    else:
        d, n_centers, noise, hi = 960, 512, 0.035, 1.0
    centers = rng.uniform(0, hi * 0.8, size=(n_centers, d)).astype(np.float32)
    out = np.empty((n, d), np.float32)
    step = 131072
    for a in range(0, n, step):
        b = min(a + step, n)
        ci = rng.integers(0, n_centers, size=b - a)
        x = centers[ci] + rng.normal(
            0, noise, size=(b - a, d)).astype(np.float32)
        np.clip(x, 0, hi, out=x)
        if dataset == "sift":
            np.rint(x, out=x)
        out[a:b] = x
    qi = rng.integers(0, n_centers, size=4096)
    q = centers[qi[:4096]] + rng.normal(
        0, noise, size=(4096, d)).astype(np.float32)
    np.clip(q, 0, hi, out=q)
    if dataset == "sift":
        np.rint(q, out=q)
    return out, q


def ground_truth(base: np.ndarray, queries: np.ndarray, k: int = 10
                 ) -> np.ndarray:
    """Exact Euclidean top-k ids via on-device tiled matmuls."""
    import jax
    import jax.numpy as jnp

    n = base.shape[0]
    qn = (queries.astype(np.float32) ** 2).sum(axis=1)
    q_dev = jnp.asarray(queries.astype(np.float32))

    step = 262144
    best_d = np.full((len(queries), k), np.inf, np.float32)
    best_i = np.zeros((len(queries), k), np.int64)

    @jax.jit
    def tile_topk(xb, qd):
        bn = jnp.sum(xb * xb, axis=1)
        # HIGHEST precision: the MXU's default f32 matmul runs bf16
        # passes, and bn - 2 q.x cancels ~x||x|| magnitudes down to
        # ~noise-scale distances — default precision corrupts the
        # ground truth at exactly the near-tie ranks recall measures
        d2 = bn[None, :] - 2.0 * jnp.dot(
            qd, xb.T, precision=jax.lax.Precision.HIGHEST)
        vals, idx = jax.lax.top_k(-d2, k)
        return -vals, idx

    for a in range(0, n, step):
        b = min(a + step, n)
        vals, idx = jax.device_get(
            tile_topk(jnp.asarray(base[a:b]), q_dev))
        cd = np.concatenate([best_d, vals + qn[:, None] * 0], axis=1)
        ci = np.concatenate([best_i, idx.astype(np.int64) + a], axis=1)
        order = np.argsort(cd, axis=1)[:, :k]
        best_d = np.take_along_axis(cd, order, axis=1)
        best_i = np.take_along_axis(ci, order, axis=1)
    return best_i


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["sift", "gist"], default="sift")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--nprobe", default="8,16,33,64,128")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--precision", choices=["i8", "f32"], default="i8")
    args = ap.parse_args()

    import seekstorm_tpu as st

    rng = np.random.default_rng(11)
    t0 = time.time()
    base, queries = make_proxy(args.dataset, args.n, rng)
    queries = queries[: args.queries]
    gen_s = time.time() - t0

    t0 = time.time()
    gt = ground_truth(base, queries)
    gt_s = time.time() - t0

    tmp = tempfile.mkdtemp(prefix=f"vbench_{args.dataset}_")
    try:
        meta = st.IndexMeta(vector=st.VectorConfig(
            enabled=True, dim=base.shape[1],
            similarity=st.VectorSimilarity.Euclidean,
            precision=(st.Precision.I8 if args.precision == "i8"
                       else st.Precision.F32),
            quantization=(st.Quantization.ScalarQuantizationI8
                          if args.precision == "i8"
                          else st.Quantization.Null),
            inference=st.InferenceType.External,
            clustering=st.ClusteringConfig(mode=st.ClusteringMode.Auto),
        ))
        schema = [st.SchemaField("vector", st.FieldType.Json,
                                 index_vector=True)]
        idx = st.create_index(f"{tmp}/ix", schema, meta=meta, shard_count=1)
        t0 = time.time()
        step = 8192
        for a in range(0, args.n, step):
            idx.index_documents(
                [{"vector": base[i]} for i in range(a, min(a + step, args.n))]
            )
        index_s = time.time() - t0
        t0 = time.time()
        idx.commit()
        commit_s = time.time() - t0
        print(f"# {args.dataset}-proxy n={args.n} d={base.shape[1]} "
              f"gen={gen_s:.0f}s gt={gt_s:.0f}s index={index_s:.0f}s "
              f"commit={commit_s:.0f}s", file=sys.stderr)

        # clustering diagnostic: how many clusters hold each query's true
        # top-10 in the SERVING layout (the device build re-clusters the
        # union globally) — isolates clustering granularity from probe
        # selection quality
        dev = idx.vectors.device(idx.shards[0])
        h_docid = np.asarray(dev["h_docid"])
        h_cluster = np.asarray(dev["cluster"]).reshape(-1)
        asg = np.full(args.n, -1, np.int64)
        ok = h_docid >= 0
        asg[h_docid[ok]] = h_cluster[ok]
        span = np.array([len(set(asg[gt[i]].tolist())) for i in
                         range(len(queries))])
        print(f"# clusters={dev['n_clusters']} gt10 cluster span: "
              f"mean={span.mean():.2f} p90={np.percentile(span, 90):.0f}",
              file=sys.stderr)

        curves = []
        for nprobe in [int(x) for x in args.nprobe.split(",")]:
            reqs = [st.SearchRequest(
                search_mode=st.SearchMode.Vector, query_vector=q.tolist(),
                length=10, top_n=10, ann_mode="Nprobe", nprobe=nprobe,
                realtime=False,
            ) for q in queries]
            # warmup
            st.search_batch(idx, reqs[: args.batch])
            t0 = time.time()
            hits = 0
            for a in range(0, len(reqs), args.batch):
                out = st.search_batch(idx, reqs[a : a + args.batch])
                for qi, rs in enumerate(out):
                    got = {r.doc_id for r in rs.results}
                    hits += len(got & set(gt[a + qi].tolist()))
            dt = time.time() - t0
            recall = hits / (len(reqs) * 10)
            lat_us = dt / len(reqs) * 1e6
            curves.append({"nprobe": nprobe, "recall_at_10": round(recall, 4),
                           "mean_latency_us": round(lat_us, 1)})
            print(f"# nprobe={nprobe}: recall@10={recall:.4f} "
                  f"lat={lat_us:.0f}us", file=sys.stderr)
        print(json.dumps({
            "metric": f"{args.dataset}_proxy_recall_curve",
            "n": args.n, "d": int(base.shape[1]),
            "precision": args.precision,
            "queries": len(queries), "curve": curves,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
