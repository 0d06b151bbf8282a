"""Benchmark: batched BM25 top-10 QPS on the device lexical engine at
reference scale.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Baseline: the reference engine's published 305 µs average BM25 top-10
latency on English Wikipedia 5M docs (BASELINE.md row 3, reference
README.md:268-274) => ~3,279 QPS equivalent for a single node.

The corpus is synthetic (zipf rank-frequency vocabulary, Wikipedia-like
title/body length statistics) because this environment has no egress to
fetch the real Wikipedia dump; the DEFAULT SIZE matches the reference's
benchmark corpus (5,032,105 docs) so per-query work is comparable.  The
query mix mirrors the search-benchmark-game workload: 2-term unions /
intersections over mid-frequency terms + single terms.

Honest-reporting rules (round-1 verdict):
  * default --docs is reference scale (5M), not 100K;
  * per-pass throughput is reported for every pass plus the mean — not
    best-of-N;
  * realtime=True (the engine's default serving mode);
  * latency percentiles (p50/p99 per batch) and a host/device time
    breakdown (plan / device / fetch) from the engine's metrics registry;
  * analytic device-FLOP estimate per batch -> achieved TFLOP/s + MFU.

Usage: python bench.py [--docs 5000000] [--batch 128] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import json
import sys
import time

import numpy as np

BASELINE_QPS = 1e6 / 305.0  # reference: 305 us avg BM25 top-10 (README.md:268)
# v5e peak MXU throughput (per chip): ~197 TFLOP/s bf16, ~49 TFLOP/s f32
PEAK_FLOPS = {"bf16": 197e12, "f32": 49e12}
# v5e HBM bandwidth per chip (~819 GB/s) — the peak the bandwidth-bound
# WAND engine is measured against
PEAK_HBM_GBPS = 819.0


def make_corpus(n_docs: int, vocab: int, rng) -> list[dict]:
    """Zipf rank-frequency vocabulary + REAL-TEXT statistics the flat
    i.i.d. stream lacks:

      * doc lengths are lognormal (Wikipedia-like skew), not uniform;
      * term occurrences are BURSTY (Church & Gale): ~25% of body
        positions repeat an earlier token of the same document, so tf
        follows the heavy-tailed within-doc distribution of real prose
        instead of tf ~= 1 everywhere.

    Both properties drive per-(term, block) impact variance — without
    them block-max pruning (ours AND the reference's max_block_score,
    intersection.rs:2224) degenerates to full scans, which no real
    corpus exhibits."""
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = 1.0 / ranks
    probs /= probs.sum()
    words = np.array([f"w{i:05d}" for i in range(vocab)])
    title_len = rng.integers(3, 9, size=n_docs)
    body_len = np.clip(
        np.exp(rng.normal(np.log(35.0), 0.6, size=n_docs)), 8, 300
    ).astype(np.int64)
    total = int(title_len.sum() + body_len.sum())
    stream = rng.choice(vocab, size=total, p=probs).astype(np.int32)
    # burstiness: rewrite ~25% of positions with a copy of an earlier
    # token from the same document (vectorized urn approximation)
    doc_len = title_len + body_len
    starts = np.zeros(n_docs, np.int64)
    np.cumsum(doc_len[:-1], out=starts[1:])
    pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(starts, doc_len)
    burst = (rng.random(total) < 0.25) & (pos_in_doc > 0)
    src = (np.repeat(starts, doc_len)
           + (rng.random(total) * pos_in_doc).astype(np.int64))
    stream[burst] = stream[src[burst]]
    toks = words[stream]
    docs = []
    pos = 0
    for i in range(n_docs):
        tl = int(title_len[i])
        bl = int(body_len[i])
        docs.append({
            "title": " ".join(toks[pos : pos + tl]),
            "body": " ".join(toks[pos + tl : pos + tl + bl]),
        })
        pos += tl + bl
    return docs


def make_queries(n: int, rng) -> list[tuple[str, str]]:
    """(query, type) mix mirroring the search-benchmark-game workload:
    2-term unions/intersections over mid-frequency terms + single terms."""
    out = []
    for _ in range(n):
        r = rng.random()
        t1 = f"w{rng.integers(20, 3000):05d}"
        t2 = f"w{rng.integers(20, 3000):05d}"
        if r < 0.55:
            out.append((f"{t1} {t2}", "Union"))
        elif r < 0.85:
            out.append((f"{t1} {t2}", "Intersection"))
        else:
            out.append((t1, "Union"))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=5_000_000)
    ap.add_argument("--vocab", type=int, default=30_000)
    # 2048 queries/dispatch: the serving pipeline is host + link bound,
    # not device bound (scalar-reduced device measurement: the whole
    # phase-1/2/3 program is ~1 ms at Bq=128 on v5e; a dispatch costs
    # one ~27 ms link round trip + D2H bytes, and round trips do NOT
    # overlap across threads through this tunnel — measured 1.0x at
    # 8-way).  Per-batch wall = host work + RT + D2H, so batch size
    # amortizes the RT and threads only hide host work.  A co-located
    # PCIe host pays ~100 us RTs and would prefer smaller batches.
    # B=1 interactive latency is measured separately below.
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--shards", type=int, default=1)
    ap.add_argument("--index-dir", default=None,
                    help="persist/reuse the built index here (iteration "
                         "aid; the default builds fresh in a temp dir)")
    ap.add_argument("--result-type", choices=["Topk", "TopkCount"],
                    default="Topk",
                    help="TopkCount adds exact total-hit counting (full "
                         "coverage + per-block count accumulation)")
    # real-corpus mode (the reference's benchmark inputs: English
    # Wikipedia NDJSON with title/body/text fields + AOL-derived query
    # strings, reference README.md:273-274, server.rs:807).  This
    # environment has no egress to fetch them; when the files exist the
    # whole run is one command:
    #   python bench.py --ndjson wiki.ndjson --queries aol.txt
    ap.add_argument("--ndjson", default=None,
                    help="index this NDJSON corpus instead of the "
                         "synthetic one (fields: title + body/text)")
    ap.add_argument("--queries", default=None,
                    help="newline-separated query strings replacing the "
                         "synthetic mix (used with --ndjson)")
    args = ap.parse_args()

    import seekstorm_tpu as st
    from seekstorm_tpu.metrics import METRICS
    from seekstorm_tpu.ops.lexical import fast_mode

    import shutil
    import tempfile
    from pathlib import Path

    reuse = (args.index_dir is not None
             and (Path(args.index_dir) / "ix" / "index.json").exists())
    gen_s = index_s = commit_s = 0.0
    tmp = args.index_dir or tempfile.mkdtemp(prefix="seekstorm_bench_")
    try:
        if reuse:
            idx = st.open_index(f"{tmp}/ix")
        else:
            t0 = time.time()
            if args.ndjson:
                import json as _json

                docs = []
                with open(args.ndjson) as f:
                    for line in f:
                        if not line.strip():
                            continue
                        d = _json.loads(line)
                        docs.append({"title": str(d.get("title", "")),
                                     "body": str(d.get("body",
                                                       d.get("text", "")))})
                args.docs = len(docs)
            else:
                rng = np.random.default_rng(7)
                docs = make_corpus(args.docs, args.vocab, rng)
            gen_s = time.time() - t0
            schema = [
                st.SchemaField("title", st.FieldType.Text, indexed=True,
                               boost=10.0),
                st.SchemaField("body", st.FieldType.Text, indexed=True),
            ]
            idx = st.create_index(f"{tmp}/ix", schema,
                                  shard_count=args.shards)
            t0 = time.time()
            idx.index_documents(docs)
            index_s = time.time() - t0
            del docs
            t0 = time.time()
            idx.commit()
            commit_s = time.time() - t0

        if os.environ.get("SEEKSTORM_TPU_MESH"):
            # multi-chip: map shards onto the device mesh (one shard per
            # device; docs/MULTICHIP.md)
            idx.attach_mesh()
            print(f"# mesh attached: {idx._mesh.devices.size} devices")

        # pipelined serving: N worker threads each issuing batches — host
        # planning overlaps device execution and tunnel round trips
        import threading

        real_queries = None
        if args.queries:
            with open(args.queries) as f:
                real_queries = [(q.strip(), "Union")
                                for q in f if q.strip()]

        def _qset(t):
            if real_queries:
                qs = [real_queries[(t * args.batch + i) % len(real_queries)]
                      for i in range(args.batch)]
                return qs
            return make_queries(args.batch, np.random.default_rng(100 + t))

        req_sets = []
        for t in range(args.threads):
            qs = _qset(t)
            req_sets.append([
                st.SearchRequest(
                    query=q, length=10,
                    result_type=st.ResultType(args.result_type),
                    realtime=True, query_type_default=st.QueryType(ty),
                )
                for q, ty in qs
            ])
        # warmup compiles: all sets share padded plan shapes, so warming the
        # first set compiles for everyone; one cheap pass for the rest, then
        # one full untimed pass so the timed passes measure steady state
        # (the first batches also exercise the adaptive-pruning probe phase)
        st.search_batch(idx, req_sets[0])
        for r in req_sets[1:]:
            st.search_batch(idx, r)
        import threading

        # full untimed pass, capped so mega-batches don't spend minutes
        # warming (2 batches/thread stabilizes the adaptive gates)
        warm_iters = min(args.iters, max(2, 32768 // args.batch))
        warm_threads = [
            threading.Thread(target=lambda rs=r: [st.search_batch(idx, rs)
                                                  for _ in range(warm_iters)])
            for r in req_sets
        ]
        for th in warm_threads:
            th.start()
        for th in warm_threads:
            th.join()

        batch_lat_us: list[float] = []
        lat_lock = threading.Lock()

        def worker(reqs):
            for _ in range(args.iters):
                b0 = time.perf_counter()
                st.search_batch(idx, reqs)
                dt_us = (time.perf_counter() - b0) * 1e6
                with lat_lock:
                    batch_lat_us.append(dt_us)

        METRICS.reset()
        pass_qps = []
        t_all0 = time.time()
        for _pass in range(args.passes):
            t0 = time.time()
            threads = [threading.Thread(target=worker, args=(r,))
                       for r in req_sets]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            dt = time.time() - t0
            pass_qps.append(args.threads * args.batch * args.iters / dt)
        wall_s = time.time() - t_all0
        qps = float(np.mean(pass_qps))

        lat = np.array(batch_lat_us)
        n_queries = args.threads * args.batch * args.iters * args.passes
        # snapshot the serving-pass metrics BEFORE the B=1 section so the
        # busy/dispatch figures describe the batched passes only
        tm = METRICS.snapshot()

        # single-query (B=1) interactive latency — the reference's
        # headline shape (305 us avg standalone BM25 top-10,
        # README.md:268).  Measured honestly through this environment's
        # tunneled TPU: each dispatch carries the ~28 ms link round trip,
        # which a co-located host does not pay; b1_* report end-to-end
        # wall here, and the JSON carries the measured link floor
        # (b1_link_floor_us, median trivial-op round trip) so the
        # engine-side share is attributable.
        b1_qs = (real_queries[:64] if real_queries
                 else make_queries(64, np.random.default_rng(999)))
        b1_reqs = [
            st.SearchRequest(query=q, length=10,
                             result_type=st.ResultType(args.result_type),
                             realtime=True, query_type_default=st.QueryType(ty))
            for q, ty in b1_qs
        ]
        for r in b1_reqs[:8]:
            st.search_batch(idx, [r])  # warm the B=1 plan shapes
        b1_lat = []
        for r in b1_reqs * 3:
            t0 = time.perf_counter()
            st.search_batch(idx, [r])
            b1_lat.append((time.perf_counter() - t0) * 1e6)
        b1 = np.array(b1_lat)
        # link floor: trivial device op + scalar fetch, same path a B=1
        # dispatch takes
        import jax
        import jax.numpy as jnp
        _tiny = jax.jit(lambda x: (x * 2).sum())
        _x = jnp.ones((8, 128), jnp.float32)
        np.asarray(_tiny(_x))
        floors = []
        for _ in range(20):
            t0 = time.perf_counter()
            np.asarray(_tiny(_x))
            floors.append((time.perf_counter() - t0) * 1e6)
        b1_floor = float(np.median(floors))

        # index-memory accounting (north star: <= reference index.bin for
        # the same corpus).  HBM-resident scoring tensors + host stores.
        hbm = 0
        for sh in idx.shards:
            lex = sh.lexical
            for a in (lex.dev_docid, lex.dev_imp, lex.bitmaps, lex.sat1):
                if a is not None:
                    hbm += a.nbytes
        # derived artifacts (lexcache: rebuildable commit-time cache) are
        # excluded from the index-size figure compared against the
        # reference's index.bin
        disk = sum(
            f.stat().st_size
            for f in Path(tmp).rglob("*")
            if f.is_file() and not f.name.startswith("lexcache")
        )

        # engine-side breakdown + analytic device FLOPs (see search.py /
        # parallel/mesh.py instrumentation).  With pipelined worker threads
        # the per-thread device waits overlap, so device_s can exceed wall
        # time; the MFU estimate is therefore conservative.
        escalations = int(tm.get("plan_escalations_total", 0))
        dispatches = int(tm.get("device_dispatch_total", 0))
        wand_esc = int(tm.get("wand_escalations_total", 0))
        wand_fb = int(tm.get("wand_fallbacks_total", 0))
        wand_resets = int(tm.get("wand_resets_total", 0))
        wand_build_s = tm.get("wand_build_seconds_total", 0.0)
        wand_rescore_s = tm.get("wand_rescore_busy_seconds_total",
                                tm.get("wand_rescore_seconds_total", 0.0))
        # host exact-fallback cost (UB-saturated stragglers): busy seconds
        # + count, the single-core share that caps pipelined serving
        fb_busy_s = tm.get("wand_exact_fallback_busy_seconds_total",
                           tm.get("wand_exact_fallback_seconds_total", 0.0))
        # busy seconds (union of open intervals) — the plain sums double-
        # count queue waits across the worker threads
        plan_s = tm.get("lex_plan_busy_seconds_total",
                        tm.get("lex_plan_seconds_total", 0.0))
        dev_s = tm.get("lex_device_busy_seconds_total",
                       tm.get("lex_device_seconds_total", 0.0))
        fetch_s = 0.0  # folded into device_s (one D2H sync fetches results)
        flops = tm.get("device_flops", 0.0)
        prec = "bf16" if fast_mode() else "f32"
        tflops = flops / max(dev_s, 1e-9) / 1e12
        mfu = flops / max(dev_s, 1e-9) / PEAK_FLOPS[prec]
        # the WAND engine is bit-ops + thin reductions — bandwidth-bound by
        # design, so its honest utilization figure is HBM GB/s vs the v5e
        # peak (~819 GB/s), not MFU (analytic traffic, see ops/wand.py)
        wand_bytes = tm.get("wand_device_bytes", 0.0)
        hbm_gbps = wand_bytes / max(dev_s, 1e-9) / 1e9
        hbm_util = hbm_gbps / PEAK_HBM_GBPS

        print(
            f"# corpus={args.docs} docs gen={gen_s:.1f}s "
            f"index={index_s:.1f}s ({args.docs/max(index_s,1e-9):.0f} docs/s) "
            f"commit={commit_s:.1f}s batch={args.batch} "
            f"passes_qps={[round(q,1) for q in pass_qps]} "
            f"batch_lat p50={np.percentile(lat,50)/1e3:.2f}ms "
            f"p99={np.percentile(lat,99)/1e3:.2f}ms "
            f"breakdown plan={plan_s:.1f}s device={dev_s:.1f}s "
            f"fetch={fetch_s:.1f}s wall={wall_s:.1f}s "
            f"device={tflops:.2f}TFLOP/s ({prec}) mfu={mfu*100:.1f}% "
            f"wand_hbm={hbm_gbps:.0f}GB/s ({hbm_util*100:.1f}% of peak)",
            file=sys.stderr,
        )
        print(
            json.dumps(
                {
                    "metric": ("bm25_top10_qps_5m" if args.docs >= 5_000_000
                               else f"bm25_top10_qps_{args.docs}")
                    + ("_count" if args.result_type == "TopkCount" else ""),
                    "value": round(qps, 1),
                    "unit": "qps",
                    "vs_baseline": round(qps / BASELINE_QPS, 2),
                    "docs": args.docs,
                    "mean_batch_latency_us": round(float(lat.mean()), 1),
                    "p50_batch_latency_us": round(float(np.percentile(lat, 50)), 1),
                    "p99_batch_latency_us": round(float(np.percentile(lat, 99)), 1),
                    "per_query_latency_us": round(float(lat.mean()) / args.batch, 1),
                    "batch": args.batch,
                    "b1_p50_us": round(float(np.percentile(b1, 50)), 1),
                    "b1_p99_us": round(float(np.percentile(b1, 99)), 1),
                    "b1_link_floor_us": round(b1_floor, 1),
                    "pass_qps": [round(q, 1) for q in pass_qps],
                    "n_queries": n_queries,
                    "precision": prec,
                    "device_tflops": round(tflops, 2),
                    "mfu": round(mfu, 4),
                    "wand_hbm_gbps": round(hbm_gbps, 1),
                    "wand_hbm_util": round(hbm_util, 4),
                    "breakdown_s": {
                        "plan": round(plan_s, 2),
                        "device": round(dev_s, 2),
                        "fetch": round(fetch_s, 2),
                    },
                    "index_docs_per_s": round(args.docs / max(index_s, 1e-9), 0),
                    "commit_s": round(commit_s, 1),
                    "realtime": True,
                    "plan_escalations": escalations,
                    "device_dispatches": dispatches,
                    "wand_escalations": wand_esc,
                    "wand_fallbacks": wand_fb,
                    "wand_resets": wand_resets,
                    "wand_build_s": round(wand_build_s, 2),
                    "wand_rescore_s": round(wand_rescore_s, 2),
                    "wand_fallback_busy_s": round(fb_busy_s, 2),
                    "hbm_scoring_bytes": int(hbm),
                    "disk_index_bytes": int(disk),
                }
            )
        )
    finally:
        if args.index_dir is None:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
