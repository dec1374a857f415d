#!/usr/bin/env python
"""spark-submit job: Structured-Streaming ingest front-door.

    spark-submit --py-files dist/searchengine_spark.zip jobs/stream_ingest.py \
        --landing /path/to/landing/'*' --store /path/to/docs_store \
        --index /path/to/index --checkpoint /path/to/ckpt

Drains the landing directory (``availableNow``): each micro-batch of
(repo, path, commit, lang, content) parquet merges into the kb-partitioned
docs store (O(batch) — only the kb partitions holding batch keys are read
and rewritten; new keys get append-ordered doc_ids) and rebuilds exactly
the dirty index segments.  Idempotent: the streaming checkpoint skips
already-processed files, and the index build resumes from manifests.

``--delete-repo R`` instead removes every doc of repo R from the store
(ids become holes, nothing rank-shifts) and rebuilds the segments that
carried them.
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
    ap.add_argument("--landing", help="landing dir glob of docs parquet")
    ap.add_argument("--store", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--checkpoint", help="streaming checkpoint dir")
    ap.add_argument("--delete-repo", help="delete this repo's docs instead")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from searchengine_spark.session import get_spark
    from searchengine_spark.streaming import store as dstore

    spark = get_spark("stream_ingest", cores=args.cores)
    t0 = time.perf_counter()

    if args.delete_repo:
        from searchengine_spark.streaming.incremental import rebuild_segments

        with open(f"{args.index}/meta.json") as fh:
            meta = json.load(fh)
        keys = dstore.read_store(spark, args.store).filter(
            F.col("repo") == args.delete_repo
        ).select("repo", "path")
        summary = dstore.delete_keys(keys, args.store,
                                     seg_size=int(meta["seg_size"]))
        # read_store tolerates a fully-emptied store (empty DF), and the
        # builder tolerates the empty corpus (drops all segments)
        rebuild_segments(dstore.read_store(spark, args.store), args.index,
                         summary["dirty_segments"])
        print(json.dumps({
            "mode": "delete", "repo": args.delete_repo,
            "n_removed": summary["n_removed"],
            "rebuilt_segments": summary["dirty_segments"],
            "seconds": round(time.perf_counter() - t0, 2),
        }))
        return

    if not args.landing or not args.checkpoint:
        ap.error("need --landing and --checkpoint (or --delete-repo)")

    from searchengine_spark.streaming.incremental import stream_ingest

    stream_ingest(spark, args.landing, args.store, args.index, args.checkpoint)
    smeta = dstore.store_meta(args.store)
    imeta = None
    meta_p = Path(args.index) / "meta.json"
    if meta_p.exists():
        with open(meta_p) as fh:
            m = json.load(fh)
        imeta = {k: m[k] for k in ("n_docs", "n_segments", "seg_size")}
    print(json.dumps({
        "mode": "ingest", "store": smeta,  # both None if zero batches drained
        "index": imeta,
        "seconds": round(time.perf_counter() - t0, 2),
    }))


if __name__ == "__main__":
    main()
