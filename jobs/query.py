#!/usr/bin/env python
"""spark-submit job: BM25 top-k query against a built index.

    spark-submit --py-files dist/searchengine_spark.zip jobs/query.py \
        --index /path/to/index --query "spark shuffle merge" -k 10

``--query`` is repeatable: with several queries the job serves them through
QueryEngine — one bucket-pruned prefetch collect warms every term, then
each query scores driver-side with no further Spark job (broker serving
shape).  A single query keeps the one-shot distributed path.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True, action="append",
                    help="repeatable; >1 query serves via prefetch+QueryEngine")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--store", default=None,
                    help="docs-store dir: emit full reference DTO rows "
                         "(site, uri, title, snippet, relevance)")
    ap.add_argument("--site", default=None,
                    help="scope to one repo (the reference's site= filter)")
    ap.add_argument("--offset", type=int, default=0,
                    help="pagination offset (the reference's offset=)")
    ap.add_argument("--mode", choices=["auto", "maxscore", "bmw", "exhaustive"],
                    default="maxscore")
    ap.add_argument("--conjunctive", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from searchengine_spark.index.serve import enrich_hits
    from searchengine_spark.index.wand import QueryEngine, bm25_topk
    from searchengine_spark.session import get_spark

    def _payload(q, hits):
        if args.store is None:
            return [{"doc_id": d, "score": round(s, 4)} for d, s in hits]
        return [r.asDict() for r in
                enrich_hits(spark, args.store, q, hits).collect()]

    spark = get_spark("query", cores=args.cores)
    if len(args.query) == 1:
        q = args.query[0]
        t0 = time.perf_counter()
        rows = bm25_topk(spark, args.index, q, args.k,
                         mode=args.mode, conjunctive=args.conjunctive,
                         site=args.site, offset=args.offset).collect()
        dt = (time.perf_counter() - t0) * 1000
        print(json.dumps({
            "query": q, "latency_ms": round(dt, 1),
            "hits": _payload(q, [(r["doc_id"], r["score"]) for r in rows]),
        }))
        return

    eng = QueryEngine(spark, args.index)
    t0 = time.perf_counter()
    n_terms = eng.prefetch(args.query)
    prefetch_ms = (time.perf_counter() - t0) * 1000
    print(json.dumps({"prefetched_terms": n_terms,
                      "prefetch_ms": round(prefetch_ms, 1)}))
    for q in args.query:
        t0 = time.perf_counter()
        hits = eng.topk_rows(q, args.k, mode=args.mode,
                             conjunctive=args.conjunctive,
                             site=args.site, offset=args.offset)
        dt = (time.perf_counter() - t0) * 1000
        print(json.dumps({
            "query": q, "latency_ms": round(dt, 1),
            "hits": _payload(q, hits),
        }))


if __name__ == "__main__":
    main()
