"""Phrase benchmark at 1M docs: n-gram-accelerated phrase search vs the
positional-verification path (BASELINE row 10 — reference NGRAM_SEARCH.md
reports mean 2.18x / P99.9 7.63x speedup from n-gram posting lists on a
Wikipedia phrase workload).

Two indexes over the same corpus: one with NgramSet flags 1|2|4|8 (the
reference's frequent-bigram/trigram classes) and one without.  The query
set is real adjacent bigrams sampled from the corpus — stratified so a
share contains a frequent word (where n-gram lists matter most).

Prints ONE JSON line with qps for both indexes + the speedup.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

from bench import make_corpus


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--vocab", type=int, default=30_000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--index-dir", default="/tmp/bix_phrase")
    args = ap.parse_args()

    import seekstorm_tpu as st

    rng = np.random.default_rng(7)
    docs = make_corpus(args.docs, args.vocab, rng)

    # sample real adjacent bigrams from doc bodies
    qrng = np.random.default_rng(42)
    phrases = []
    while len(phrases) < args.queries:
        body = docs[int(qrng.integers(0, len(docs)))]["body"].split()
        if len(body) < 2:
            continue
        i = int(qrng.integers(0, len(body) - 1))
        if body[i] != body[i + 1]:
            phrases.append(f'"{body[i]} {body[i + 1]}"')

    schema = [
        st.SchemaField("title", st.FieldType.Text, indexed=True, boost=10.0),
        st.SchemaField("body", st.FieldType.Text, indexed=True),
    ]

    results = {}
    for tag, flags in (("ngram", 1 | 2 | 4 | 8), ("plain", 0)):
        path = Path(args.index_dir) / tag
        if (path / "ix" / "index.json").exists():
            idx = st.open_index(path / "ix")
            build_s = 0.0
        else:
            # frequent set = the corpus's top-100 zipf tokens — the
            # synthetic analog of the reference's English function-word
            # list (its n-gram classes only fire on frequent words)
            meta = st.IndexMeta(
                ngram_indexing=flags,
                frequent_words=st.FrequentwordType.Custom,
                custom_frequent_words=tuple(
                    f"w{i:05d}" for i in range(100)),
            )
            idx = st.create_index(path / "ix", schema, meta=meta,
                                  shard_count=1)
            t0 = time.time()
            idx.index_documents(docs)
            idx.commit()
            build_s = time.time() - t0
        reqs = [st.SearchRequest(
            query=q, length=10, result_type=st.ResultType.Topk,
            realtime=False, query_type_default=st.QueryType.Phrase,
        ) for q in phrases]
        # warmup + steady state
        for a in range(0, len(reqs), args.batch):
            st.search_batch(idx, reqs[a : a + args.batch])
        t0 = time.time()
        n = 0
        counts = []
        for _ in range(args.iters):
            for a in range(0, len(reqs), args.batch):
                out = st.search_batch(idx, reqs[a : a + args.batch])
                n += len(out)
                counts.extend(len(rs.results) for rs in out)
        dt = time.time() - t0
        results[tag] = {
            "qps": round(n / dt, 1),
            "mean_latency_us": round(dt / n * 1e6, 1),
            "build_s": round(build_s, 1),
            "mean_hits": round(float(np.mean(counts)), 2),
        }
        print(f"# {tag}: {results[tag]}", file=sys.stderr)
        del idx

    print(json.dumps({
        "metric": "phrase_qps_1m",
        "value": results["ngram"]["qps"],
        "unit": "qps",
        "docs": args.docs,
        "ngram": results["ngram"],
        "plain": results["plain"],
        "ngram_speedup": round(
            results["ngram"]["qps"] / max(results["plain"]["qps"], 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
