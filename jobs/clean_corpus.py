#!/usr/bin/env python
"""spark-submit job: training-data cleaning pipeline over the corpus table.

    spark-submit --py-files dist/searchengine_spark.zip jobs/clean_corpus.py \
        --input /path/to/docs_parquet --out /path/to/cleaned

Runs the declarative quality/lang/token keep filter + exact near-dup
collapse (operators/pipeline.py) over the BASELINE.json input_hint shape
(repo, path, commit, lang, content), writes the surviving full-width rows
(with ingest's doc_id + sha256) as parquet partitioned by repo, and prints
one JSON line of pipeline stats.  ``--synthetic N`` generates the
deterministic corpus instead (bench/test).
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
    ap.add_argument("--input", help="parquet dir of (repo,path,commit,lang,content)")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-tokens", type=int, default=None)
    ap.add_argument("--min-quality", type=float, default=None)
    ap.add_argument("--keep-lang", default="any",
                    help="'en' gates on the stopword lang-id; 'any' (default"
                         " — source code has no English stopwords) skips it")
    ap.add_argument("--max-repetition", type=float, default=None,
                    help="drop docs whose duplicated-3-gram fraction "
                         "exceeds this (boilerplate/looped-generation "
                         "filter)")
    ap.add_argument("--mask-pii", action="store_true",
                    help="redact emails/URLs in the surviving content "
                         "(<EMAIL>/<URL>; URLs masked first)")
    ap.add_argument("--sample", type=float, default=None,
                    help="deterministic md5-threshold subsample fraction "
                         "applied AFTER cleaning (same rows on any rerun)")
    ap.add_argument("--decontaminate-from", default=None,
                    help="parquet dir of benchmark texts (content column): "
                         "drop survivors sharing any word 8-gram with it")
    ap.add_argument("--near-dup-threshold", type=float, default=None,
                    help="also collapse NEAR-duplicate clusters: MinHash+"
                         "LSH candidate pairs verified at this exact-"
                         "Jaccard threshold, connected components close "
                         "pair transitivity, one min-id representative "
                         "kept per cluster")
    ap.add_argument("--pack-budget", type=int, default=None,
                    help="token budget per training shard: survivors get a "
                         "contiguous-by-doc_id shard assignment (two-level "
                         "cumsum, no global sort) and the output is written "
                         "partitioned by shard= instead of repo= — the "
                         "trainer-ready layout (shard K streams as a unit)")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from searchengine_spark.corpus import corpus_df, ingest
    from searchengine_spark.operators import pipeline as P
    from searchengine_spark.session import get_spark

    spark = get_spark("clean_corpus", cores=args.cores)
    if args.synthetic:
        raw = corpus_df(spark, args.synthetic)
    elif args.input:
        raw = spark.read.parquet(args.input)
    else:
        ap.error("need --input or --synthetic")

    kw = dict(text_col="content", id_col="doc_id",
              lang=None if args.keep_lang == "any" else args.keep_lang)
    if args.min_tokens is not None:
        kw["min_tokens"] = args.min_tokens
    if args.min_quality is not None:
        kw["min_quality"] = args.min_quality

    t0 = time.perf_counter()
    docs = ingest(raw)  # checkpoints internally; scoring scans it twice max
    from pyspark.sql import functions as F

    # one distributed agg for the funnel stats (all map-side until the
    # single-row final combine)
    s = P._scored(docs, "content", "doc_id")
    mt = kw.get("min_tokens", P.MIN_TOKENS)
    mq = kw.get("min_quality", P.MIN_QUALITY)
    kl = kw["lang"]
    lang_fail = F.lit(False) if kl is None else (F.col("pred_lang") != kl)
    keep = P.keep_pred(mt, mq, kl)  # the pipeline's OWN predicate — the
    # funnel can never disagree with what clean_corpus_rows keeps
    funnel = s.agg(
        F.count("*").alias("n_in"),
        F.sum(keep.cast("long")).alias("n_kept_pre_dedup"),
        F.sum(lang_fail.cast("long")).alias("drop_lang"),
        F.sum((F.col("quality") < mq).cast("long")).alias("drop_quality"),
        F.sum((F.col("n_tokens") < mt).cast("long")).alias("drop_tokens"),
    ).collect()[0].asDict()

    cleaned = P.clean_corpus_rows(docs, **kw)
    stage_counts: dict[str, int] = {}
    extra_stages = (args.max_repetition is not None or args.sample is not None
                    or args.decontaminate_from
                    or args.near_dup_threshold is not None)
    if extra_stages:
        # per-stage funnel: materialize each counted stage ONCE
        # (localCheckpoint — the repo's eager-materialization discipline)
        # so a later stage's count and the final write never re-execute the
        # upstream dedup join / decontaminate explode
        cleaned = cleaned.localCheckpoint()
        stage_counts["n_post_dedup"] = cleaned.count()
    if args.near_dup_threshold is not None:
        from searchengine_spark.operators.dedup import (
            collapse_near_dups,
            minhash_lsh_pairs,
        )

        # near-dup cluster collapse AFTER exact dedup (exact dups are
        # gone, so pairs here are true near-dups): LSH candidates ->
        # exact-Jaccard verify -> connected components -> keep the min-id
        # representative per cluster
        pairs = minhash_lsh_pairs(cleaned, text_col="content",
                                  id_col="doc_id",
                                  threshold=args.near_dup_threshold)
        cleaned = collapse_near_dups(cleaned, pairs,
                                     id_col="doc_id").localCheckpoint()
        stage_counts["n_post_near_dup"] = cleaned.count()
    if args.max_repetition is not None:
        from searchengine_spark.functions.text import repetition_ratio

        cleaned = cleaned.filter(
            repetition_ratio(F.col("content")) <= args.max_repetition
        ).localCheckpoint()
        stage_counts["n_post_repetition"] = cleaned.count()
    if args.decontaminate_from:
        bench = spark.read.parquet(args.decontaminate_from)
        cleaned = P.decontaminate(cleaned, bench, n=8, text_col="content",
                                  id_col="doc_id").localCheckpoint()
        stage_counts["n_post_decontaminate"] = cleaned.count()
    if args.sample is not None:
        cleaned = P.sample_corpus(cleaned, args.sample, id_col="doc_id")
    if args.mask_pii:
        from searchengine_spark.functions.text import mask_pii

        # re-hash after redaction: the output must keep the per-row
        # sha256(content) invariant build_index enforces
        cleaned = (
            cleaned.withColumn("content", mask_pii(F.col("content")))
            .withColumn("sha256", F.sha2(F.col("content"), 256))
        )
    if args.pack_budget is not None:
        # packing runs LAST so n_tokens reflects the content the trainer
        # actually sees (post-masking); the shard column joins back onto
        # the full-width rows by doc_id and the write partitions by shard
        shards = P.pack_shards(cleaned, args.pack_budget,
                               text_col="content", id_col="doc_id")
        cleaned = cleaned.join(
            shards.select("doc_id", "n_tokens", "shard"), "doc_id")
        cleaned.write.mode("overwrite").partitionBy("shard").parquet(args.out)
    else:
        cleaned.write.mode("overwrite").partitionBy("repo").parquet(args.out)
    n_out = spark.read.parquet(args.out).count()
    if args.pack_budget is not None:
        stage_counts["n_shards"] = (
            spark.read.parquet(args.out).select("shard").distinct().count())
    dt = time.perf_counter() - t0

    funnel = {k: int(v or 0) for k, v in funnel.items()}
    n_dedup = stage_counts.get("n_post_dedup", n_out)
    print(json.dumps({
        **funnel,
        **stage_counts,
        "n_out": n_out,
        "dups_removed": funnel["n_kept_pre_dedup"] - n_dedup,
        "pct_kept": round(100.0 * n_out / max(funnel["n_in"], 1), 2),
        "seconds": round(dt, 2),
        "out": args.out,
    }))


if __name__ == "__main__":
    main()
