"""Faceted / geo-sorted search benchmark at 1M docs (BASELINE row-3
class of workloads; the round-1 numbers were measured at 100K only).

Workloads over a 1M-doc corpus with brand (string facet), price
(numeric facet), and loc (geo point):
  * facet2:   TopkCount + 2 query facets (brand counts + price ranges)
              + a brand filter — the classic e-commerce query;
  * geosort:  Topk sorted by distance from a base point.

Prints ONE JSON line with qps + latency per workload.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time

import numpy as np

from bench import make_corpus


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--vocab", type=int, default=30_000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--index-dir", default="/tmp/bix_facet")
    args = ap.parse_args()

    import seekstorm_tpu as st

    from pathlib import Path

    brands = [f"brand{i:02d}" for i in range(24)]
    schema = [
        st.SchemaField("title", st.FieldType.Text, indexed=True, boost=10.0),
        st.SchemaField("body", st.FieldType.Text, indexed=True),
        st.SchemaField("brand", st.FieldType.String16, facet=True),
        st.SchemaField("price", st.FieldType.U16, facet=True),
        st.SchemaField("loc", st.FieldType.Point, facet=True),
    ]
    path = Path(args.index_dir)
    if (path / "ix" / "index.json").exists():
        idx = st.open_index(path / "ix")
        build_s = 0.0
    else:
        rng = np.random.default_rng(7)
        docs = make_corpus(args.docs, args.vocab, rng)
        fr = np.random.default_rng(8)
        bi = fr.integers(0, len(brands), size=args.docs)
        price = fr.integers(1, 500, size=args.docs)
        lat = fr.uniform(-60, 60, size=args.docs)
        lon = fr.uniform(-170, 170, size=args.docs)
        for i, d in enumerate(docs):
            d["brand"] = brands[int(bi[i])]
            d["price"] = int(price[i])
            d["loc"] = [float(lat[i]), float(lon[i])]
        idx = st.create_index(path / "ix", schema, shard_count=1)
        t0 = time.time()
        idx.index_documents(docs)
        idx.commit()
        build_s = time.time() - t0
        del docs

    qrng = np.random.default_rng(100)

    def mk_reqs(kind: str):
        out = []
        for _ in range(args.batch):
            t1 = f"w{qrng.integers(20, 3000):05d}"
            t2 = f"w{qrng.integers(20, 3000):05d}"
            q = f"{t1} {t2}"
            if kind == "facet2":
                ranges = st.Ranges(field="price", ranges=[
                    ("cheap", 0), ("mid", 100), ("lux", 300)])
                out.append(st.SearchRequest(
                    query=q, length=10, realtime=False,
                    result_type=st.ResultType.TopkCount,
                    query_facets=[st.QueryFacet(field="brand"),
                                  st.QueryFacet(field="price",
                                                ranges=ranges)],
                    facet_filter=[st.FacetFilter(
                        field="brand", values=brands[:6])],
                ))
            else:
                out.append(st.SearchRequest(
                    query=q, length=10, realtime=False,
                    result_type=st.ResultType.Topk,
                    result_sort=[st.ResultSort(
                        field="loc", order="Ascending",
                        base=[37.7, -122.4])],
                ))
        return out

    results = {}
    for kind in ("facet2", "geosort"):
        req_sets = [mk_reqs(kind) for _ in range(args.threads)]
        for r in req_sets:
            st.search_batch(idx, r)      # warmup compiles
        lat_us = []
        lock = threading.Lock()

        def worker(reqs):
            for _ in range(args.iters):
                t0 = time.perf_counter()
                st.search_batch(idx, reqs)
                with lock:
                    lat_us.append((time.perf_counter() - t0) * 1e6)

        t0 = time.time()
        ths = [threading.Thread(target=worker, args=(r,)) for r in req_sets]
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        dt = time.time() - t0
        n = args.threads * args.batch * args.iters
        results[kind] = {
            "qps": round(n / dt, 1),
            "p50_batch_ms": round(float(np.percentile(lat_us, 50)) / 1e3, 1),
        }
        print(f"# {kind}: {results[kind]}", file=sys.stderr)

    print(json.dumps({
        "metric": "facet_geo_qps_1m", "docs": args.docs,
        "build_s": round(build_s, 1), **results,
    }))


if __name__ == "__main__":
    main()
