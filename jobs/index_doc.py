#!/usr/bin/env python
"""spark-submit job: upsert (or delete) ONE document and re-index only the
dirty segments — the analog of the reference's single-page endpoint
``POST /api/indexPage`` (ApiController.java:57-63; IndexingServiceImpl's
one-URL path), re-expressed as a store merge + segment-scoped rebuild.

    spark-submit --py-files dist/searchengine_spark.zip jobs/index_doc.py \
        --store /path/to/docs_store --index /path/to/index \
        --repo org0/proj0 --path src/new.py --commit abc123 --lang py \
        --content-file /path/to/file.py

Semantics follow streaming/store.py: greatest commit wins (a re-send of the
same commit with changed content is a correction); an updated key keeps its
doc_id, a new key appends past max_doc_id — nothing rank-shifts, so the
rebuild touches O(1 + appended tail) segments regardless of corpus size.
``--delete`` removes the key instead (S9 analog); the hole is reclaimed by
jobs/compact.py later.
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
    ap.add_argument("--store", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--repo", required=True)
    ap.add_argument("--path", dest="doc_path", required=True)
    ap.add_argument("--commit", default=None,
                    help="defaults to the key's CURRENT commit (so a plain "
                         "re-POST of a page wins the greatest-commit-wins "
                         "merge); '0' for a brand-new key")
    ap.add_argument("--lang", default="txt")
    ap.add_argument("--content", default=None)
    ap.add_argument("--content-file", default=None,
                    help="read content from a local file instead of --content")
    ap.add_argument("--delete", action="store_true",
                    help="remove the (repo, path) key instead of upserting")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from searchengine_spark.schema import DOCS_SCHEMA
    from searchengine_spark.session import get_spark
    from searchengine_spark.streaming import store as dstore
    from searchengine_spark.streaming.incremental import rebuild_segments

    meta_p = Path(args.index) / "meta.json"
    if not meta_p.exists():
        ap.error(f"no index meta.json under {args.index} — build it first "
                 "(jobs/build_index.py --store)")
    if dstore.store_meta(args.store) is None:
        ap.error(f"no docs store under {args.store} — init it first "
                 "(jobs/build_index.py --store)")
    with open(meta_p) as fh:
        seg_size = int(json.load(fh)["seg_size"])

    spark = get_spark("index_doc", cores=args.cores)
    t0 = time.perf_counter()

    if args.delete:
        keys = spark.createDataFrame(
            [(args.repo, args.doc_path)], "repo string, path string")
        summary = dstore.delete_keys(keys, args.store, seg_size=seg_size)
    else:
        if args.content_file is not None:
            content = Path(args.content_file).read_text()
        elif args.content is not None:
            content = args.content
        else:
            ap.error("need --content or --content-file (or --delete)")
        commit = args.commit
        if commit is None:
            # greatest-commit-wins merge: an unqualified upsert of an
            # existing key must TIE its stored commit (ties favor the
            # batch), not lose to it — one pushed-filter point lookup,
            # kb-pruned like every other store access (the key's kb dir is
            # the only partition that can hold it; a root read would list
            # and scan every kb= dir for one key)
            from pyspark.sql import functions as F

            n_kb = int(dstore.store_meta(args.store)["n_kb"])
            kb = int(spark.createDataFrame(
                [(args.repo, args.doc_path)], "repo string, path string"
            ).select(dstore._kb_col(n_kb).alias("kb")).collect()[0]["kb"])
            cur = (dstore.read_store(spark, args.store, kbs=[kb])
                   .filter((F.col("repo") == args.repo)
                           & (F.col("path") == args.doc_path))
                   .select("commit").collect())
            commit = cur[0]["commit"] if cur else "0"
        batch = spark.createDataFrame(
            [(args.repo, args.doc_path, commit, args.lang, content)],
            DOCS_SCHEMA,
        )
        summary = dstore.merge_batch(batch, args.store, seg_size=seg_size)

    dirty = summary.get("dirty_segments") or []
    if dirty:
        docs = dstore.read_store(spark, args.store).localCheckpoint()
        rebuild_segments(docs, args.index, dirty)

    print(json.dumps({
        "mode": "delete" if args.delete else "upsert",
        "repo": args.repo, "path": args.doc_path,
        **{k: v for k, v in summary.items() if k != "updated_segments"},
        "rebuilt_segments": dirty,
        "seconds": round(time.perf_counter() - t0, 2),
    }))


if __name__ == "__main__":
    main()
