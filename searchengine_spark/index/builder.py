"""Physical index builder: salted-shuffle merge -> compressed posting lists.

SURVEY.md §3.2 (build lifecycle) + §4 items 1/3/4/5.  Pipeline:

  docs (ingested: doc_id, sha256)                       [narrow scan]
    -> analyzer tokenize -> tf (repo, doc_id, lemma, tf) [shuffle 1: hash agg]
    -> + dl (per-doc length) via map-side window-free join
    -> SALTED partial runs: groupBy(lemma, salt=doc_id % S)
       each run sorted by doc_id                         [shuffle 2, bounded keys]
    -> final merge: groupBy(segment, lemma), k-way merge of <= S sorted runs,
       delta+varbyte encode + block-max directory        [shuffle 3, S rows/key]
    -> write parquet partitioned by bucket(lemma)        [partition-pruned reads]

Why salted two-level merge (SURVEY.md §4 item 3): lemma frequency is Zipf —
a plain ``groupBy(lemma).collect_list`` sends the hottest term's entire
posting list through one reducer.  Salting bounds shuffle-2 key cardinality
(every (lemma, salt) holds ~1/S of a hot term) and shuffle 3 only moves S
pre-sorted, pre-encoded runs per lemma.  AQE skew handling fixes joins, not
wide aggregates, so this is explicit.

Doc-range SEGMENTS are the 10^12-file story: doc_id space is range-cut into
``n_segments``; each segment owns complete posting lists for its doc range,
so segment builds are independent (checkpoint/resume unit) and query-time
top-k runs per segment then merges (index/wand.py).  At 100 TB segments map
to executor-sized work units; here they also evidence resume.

Checkpoint manifests (§4 item 5): one JSON per segment with doc/term/posting
counts and a sha256-xor lineage fingerprint of its input rows; a resumed
build skips segments whose manifest says 'done' and whose fingerprint
matches (tests/test_resume.py proves byte-identical output).
"""

from __future__ import annotations

import json
import math
import os
from typing import TYPE_CHECKING

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.tf_df import term_frequencies

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

K1, B = 1.2, 0.75  # pinned BM25 params baked into block-max weights

INDEX_OUT_SCHEMA = T.StructType(
    [
        T.StructField("segment", T.IntegerType(), False),
        T.StructField("lemma", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("postings", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
        T.StructField(
            "blocks",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("first_doc", T.LongType(), False),
                        T.StructField("last_doc", T.LongType(), False),
                        T.StructField("n", T.IntegerType(), False),
                        T.StructField("doc_off", T.IntegerType(), False),
                        T.StructField("tf_off", T.IntegerType(), False),
                        T.StructField("dl_off", T.IntegerType(), False),
                        T.StructField("max_weight", T.DoubleType(), False),
                    ]
                )
            ),
            False,
        ),
        T.StructField("bucket", T.IntegerType(), False),
    ]
)


def _segment_expr(n_docs: int, n_segments: int):
    seg_size = max(1, math.ceil(n_docs / n_segments))
    return (F.col("doc_id") / seg_size).cast("int"), seg_size


def build_index(
    docs_ingested: DataFrame,
    out_dir: str,
    n_segments: int = 1,
    salt: int = 8,
    n_buckets: int = 16,
    block_size: int = 128,
    analyzer_impl: str = "jvm",
    resume: bool = True,
) -> dict:
    """Build (or resume) the physical index under ``out_dir``.

    Returns the build metadata dict (n_docs, avgdl, segments, timings are
    the caller's concern).  Layout:
      out_dir/meta.json
      out_dir/manifests/segment=K.json
      out_dir/data/segment=K/bucket=B/*.parquet
    """
    from .checkpoint import segment_done, write_manifest

    spark = docs_ingested.sparkSession
    docs_ingested = docs_ingested.select("repo", "doc_id", "content", "sha256")

    n_docs = docs_ingested.count()
    seg_col, seg_size = _segment_expr(n_docs, n_segments)

    tf = term_frequencies(docs_ingested, impl=analyzer_impl)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # avgdl over ALL docs (zero-lemma docs included) — matches the oracle.
    total_dl = dl.agg(F.sum("dl")).collect()[0][0] or 0
    avgdl = float(total_dl) / n_docs if n_docs else 1.0

    meta = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "n_segments": n_segments,
        "seg_size": seg_size,
        "salt": salt,
        "n_buckets": n_buckets,
        "block_size": block_size,
        "k1": K1,
        "b": B,
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(f"{out_dir}/meta.json", "w") as fh:
        json.dump(meta, fh, indent=1)

    postings = (
        tf.join(dl, "doc_id")
        .withColumn("segment", seg_col)
        .select("segment", "lemma", "doc_id", "tf", "dl")
    )

    built_segments = []
    for seg in range(n_segments):
        if resume and segment_done(out_dir, seg):
            built_segments.append(seg)
            continue
        seg_postings = postings.filter(F.col("segment") == seg)
        seg_docs = docs_ingested.filter(
            (F.col("doc_id") >= seg * seg_size) & (F.col("doc_id") < (seg + 1) * seg_size)
        )
        stats = _build_segment(
            spark, seg_postings, seg_docs, out_dir, seg, salt, n_buckets, block_size, avgdl
        )
        write_manifest(out_dir, seg, stats)
        built_segments.append(seg)
    return meta


def _build_segment(
    spark: SparkSession,
    seg_postings: DataFrame,
    seg_docs: DataFrame,
    out_dir: str,
    seg: int,
    salt: int,
    n_buckets: int,
    block_size: int,
    avgdl: float,
) -> dict:
    # ---- stage 1: salted partial runs (bounded reducer keys) --------------
    runs = (
        seg_postings.withColumn("_salt", F.pmod(F.col("doc_id"), F.lit(salt)).cast("int"))
        .groupBy("lemma", "_salt")
        .agg(
            F.sort_array(F.collect_list(F.struct("doc_id", "tf", "dl"))).alias("run")
        )
    )

    # ---- stage 2: k-way merge + encode per lemma (applyInPandas) ----------
    def _merge(pdf):
        import numpy as np
        import pandas as pd

        from .codec import encode_postings

        out = []
        for lemma, grp in pdf.groupby("lemma", sort=False):
            rows = [np.array([(r["doc_id"], r["tf"], r["dl"]) for r in run], dtype=np.int64)
                    for run in grp["run"] if len(run)]
            if not rows:
                continue
            allp = np.concatenate(rows)
            order = np.argsort(allp[:, 0], kind="mergesort")
            allp = allp[order]
            enc = encode_postings(
                allp[:, 0], allp[:, 1], allp[:, 2], avgdl, K1, B, block_size
            )
            out.append(
                {
                    "segment": seg,
                    "lemma": lemma,
                    "df": int(allp.shape[0]),
                    "postings": enc.docs,
                    "tfs": enc.tfs,
                    "dls": enc.dls,
                    "blocks": [tuple(b) for b in enc.blocks],
                    "bucket": hash_bucket(lemma, n_buckets),
                }
            )
        cols = ["segment", "lemma", "df", "postings", "tfs", "dls", "blocks", "bucket"]
        return pd.DataFrame(out, columns=cols)

    index_df = runs.groupBy("lemma").applyInPandas(_merge, schema=INDEX_OUT_SCHEMA)
    (
        index_df.drop("segment")  # segment lives in the directory name only
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{out_dir}/data/segment={seg}")
    )

    # lineage: bit_xor of input sha256 prefixes — order-independent, no overflow
    lineage = seg_docs.agg(
        F.count("*").alias("docs"),
        F.expr(
            "bit_xor(cast(conv(substring(sha256, 1, 15), 16, 10) as bigint))"
        ).alias("sha_sum"),
    ).collect()[0]
    written = spark.read.parquet(f"{out_dir}/data/segment={seg}")
    agg = written.agg(
        F.count("*").alias("terms"), F.sum("df").alias("postings")
    ).collect()[0]
    return {
        "segment": seg,
        "doc_count": int(lineage["docs"]),
        "term_count": int(agg["terms"] or 0),
        "posting_count": int(agg["postings"] or 0),
        "input_sha_sum": int(lineage["sha_sum"] or 0),
        "status": "done",
    }


def hash_bucket(lemma: str, n_buckets: int) -> int:
    """Deterministic, Python/JVM-agreeing bucket: md5-based (not Python's
    salted builtin hash)."""
    import hashlib

    return int.from_bytes(hashlib.md5(lemma.encode()).digest()[:4], "big") % n_buckets


def read_index(spark: SparkSession, out_dir: str, lemmas: list[str] | None = None) -> DataFrame:
    """Read the index; with ``lemmas`` given, prune to their buckets
    (partition pruning on bucket=) and filter exact terms."""
    with open(f"{out_dir}/meta.json") as fh:
        meta = json.load(fh)
    base = f"{out_dir}/data"
    segs = [f"{base}/segment={s}" for s in range(meta["n_segments"])]
    df = spark.read.option("basePath", base).parquet(*segs)  # segment/bucket from path
    if lemmas is not None:
        buckets = sorted({hash_bucket(x, meta["n_buckets"]) for x in lemmas})
        df = df.filter(F.col("bucket").isin(buckets)).filter(F.col("lemma").isin(lemmas))
    return df
