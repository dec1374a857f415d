#!/usr/bin/env python
"""spark-submit job: BM25 top-k query against a built index.

    spark-submit --py-files dist/searchengine_spark.zip jobs/query.py \
        --index /path/to/index --query "spark shuffle merge" -k 10
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
    ap.add_argument("--query", required=True)
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--mode", choices=["maxscore", "exhaustive"], default="maxscore")
    ap.add_argument("--conjunctive", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from searchengine_spark.index.wand import bm25_topk
    from searchengine_spark.session import get_spark

    spark = get_spark("query", cores=args.cores)
    t0 = time.perf_counter()
    rows = bm25_topk(spark, args.index, args.query, args.k,
                     mode=args.mode, conjunctive=args.conjunctive).collect()
    dt = (time.perf_counter() - t0) * 1000
    print(json.dumps({
        "query": args.query, "latency_ms": round(dt, 1),
        "hits": [{"doc_id": r["doc_id"], "score": round(r["score"], 4)} for r in rows],
    }))


if __name__ == "__main__":
    main()
