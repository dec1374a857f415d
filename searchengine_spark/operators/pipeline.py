"""End-to-end training-data cleaning pipeline (scale extension, no
reference analog — the reference indexes everything it crawls; an LLM-data
pipeline FILTERS first).

One declarative plan composing the text-analysis family
(``functions/text.py``): quality scoring + stopword lang-id + token budget
→ keep filter → exact near-dup collapse on the normalized content
fingerprint.  100 TB shape: the score/filter stage is a single
whole-stage-codegen projection fused into the scan (zero Python, filters
evaluated map-side so rejected docs never shuffle); the ONLY shuffle is the
final partial+final hash-agg on the md5 fingerprint, whose input is already
cut to the surviving fraction.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from ..functions.text import (
    fingerprint,
    lang_id_en,
    quality_score,
    token_count,
)

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

# Pinned keep thresholds (mirrored in the gate oracle SQL).
MIN_TOKENS = 10
MIN_QUALITY = 0.5
KEEP_LANG = "en"


def _scored(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        fingerprint(F.col(text_col)).alias("fp"),
        token_count(F.col(text_col)).alias("n_tokens"),
        quality_score(F.col(text_col)).alias("quality"),
        lang_id_en(F.col(text_col)).alias("pred_lang"),
    )


def keep_pred(min_tokens: int = MIN_TOKENS, min_quality: float = MIN_QUALITY,
              lang: str | None = KEEP_LANG):
    """THE keep predicate over `_scored` columns — the single definition
    shared by the pipeline and the funnel diagnostics (jobs/clean_corpus.py),
    so reported drop counts can never drift from what is actually kept.
    ``lang=None`` skips the language gate (code corpora have no English
    stopwords; quality/token gates still apply)."""
    pred = (F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    if lang is not None:
        pred = (F.col("pred_lang") == lang) & pred
    return pred


def _kept(docs: DataFrame, text_col: str, id_col: str,
          min_tokens: int, min_quality: float, lang: str | None) -> DataFrame:
    return _scored(docs, text_col, id_col).filter(
        keep_pred(min_tokens, min_quality, lang))


def clean_corpus_summary(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", min_tokens: int = MIN_TOKENS,
                         min_quality: float = MIN_QUALITY,
                         lang: str | None = KEEP_LANG) -> DataFrame:
    """Survivor summary per fingerprint group: the kept doc (min id), its
    token/quality stats, and the duplicate count it absorbed."""
    return (
        _kept(docs, text_col, id_col, min_tokens, min_quality, lang)
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.min_by("n_tokens", "doc_id").alias("n_tokens"),
            F.min_by("quality", "doc_id").alias("quality"),
            F.count("*").alias("n_dups"),
        )
    )


def clean_corpus_rows(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", min_tokens: int = MIN_TOKENS,
                      min_quality: float = MIN_QUALITY,
                      lang: str | None = KEEP_LANG) -> DataFrame:
    """The cleaned corpus itself: full-width surviving rows (one per
    fingerprint group, the min-id member), via a left-semi join of the
    source against the survivor ids — the wide content column is scanned
    once and never shuffled (the semi-join build side is ids only)."""
    keep_ids = (
        clean_corpus_summary(docs, text_col, id_col,
                             min_tokens, min_quality, lang)
        .select(F.col("keep_id").alias(id_col))
    )
    return docs.join(keep_ids, id_col, "left_semi").select(*docs.columns)


def hex_threshold(fraction: float) -> str:
    """``fraction`` as a cut point over the md5-prefix space: a row
    survives iff its 8-hex md5 prefix sorts BELOW this literal.  Computed
    driver-side so BOTH engines (Spark and the DuckDB oracle) compare the
    same lowercase-hex strings lexicographically — lexicographic order on
    fixed-width lowercase hex IS numeric order, and no engine needs a
    hex-to-int primitive.  ``fraction >= 1`` returns ``'g'`` (sorts above
    every hex string) so a keep-everything stratum really keeps EVERY row
    — an 'ffffffff' cap would drop a prefix-all-f row, one-in-2^32 but a
    real row at corpus scale."""
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * (1 << 32)), "08x")


def sample_corpus(docs: DataFrame, fraction: float,
                  id_col: str = "doc_id", salt: str = "s42",
                  by: str | None = None,
                  fractions: dict[str, float] | None = None) -> DataFrame:
    """Deterministic, engine-portable corpus (sub)sampling: keep rows whose
    md5(salt || id) 8-hex prefix falls under :func:`hex_threshold`
    (``fraction``) — or, with ``by`` + ``fractions``, under that row's
    GROUP threshold (stratified sampling: keep 100% of rare languages, 5%
    of the dominant one).  Reproducibility is the contract: rerunning a
    100 TB sample yields the SAME corpus on any engine with md5.  A plain
    map-side filter — no shuffle, no RNG state."""
    mark = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8)
    if by is None:
        return docs.filter(mark < hex_threshold(fraction))
    thr = F.lit(hex_threshold(fraction))
    for key, f in sorted((fractions or {}).items()):
        thr = F.when(F.col(by) == key,
                     hex_threshold(f)).otherwise(thr)
    return docs.filter(mark < thr)


def pack_shards(docs: DataFrame, budget_tokens: int,
                text_col: str = "text", id_col: str = "doc_id",
                bucket_size: int = 1 << 20) -> DataFrame:
    """Assign each doc to a contiguous token-budget shard: docs are laid
    out in ``id_col`` order and cut every ``budget_tokens`` tokens —
    (id, n_tokens, shard).  The training-data packing step: shard K is
    the unit a trainer streams.

    Shape (two-level cumulative sum — no global window): the id space is
    cut into ``bucket_size``-wide buckets (``floor(id / bucket_size)`` is
    monotone in id, so bucket order IS id order); a windowed cumsum runs
    WITHIN each bucket in parallel, the per-bucket token totals (one long
    per bucket — ~10^6 rows at 10^12 docs) are collected, their exclusive
    prefix sums are computed driver-side and broadcast back, and each
    row's GLOBAL running total is ``bucket_offset + local_cum``.  Output
    is row-identical to a single global window cumsum, but the plan is
    wide: every exchange hash-partitions on the bucket key, no task ever
    holds more than one bucket's sort.  The second pass over ``docs``
    (totals job + final select) recomputes ``token_count`` — two narrow
    pruned scans beat serializing 100 TB through one window task."""
    from pyspark.sql import Window

    nt = token_count(F.col(text_col))
    scored = docs.select(
        F.col(id_col),
        nt.alias("n_tokens"),
        F.floor(F.col(id_col) / F.lit(int(bucket_size)))
        .cast("long").alias("_bkt"),
    )
    totals = {
        r["_bkt"]: int(r["t"])
        for r in scored.groupBy("_bkt").agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    run = 0
    offsets = []
    for bkt in sorted(totals):
        offsets.append((bkt, run))
        run += totals[bkt]
    spark = docs.sparkSession
    off_df = spark.createDataFrame(offsets, schema="_bkt long, _off long")
    w = (Window.partitionBy("_bkt").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    return (
        scored
        .withColumn("_cum", F.sum("n_tokens").over(w))
        .join(F.broadcast(off_df), "_bkt")
        .select(
            id_col, "n_tokens",
            F.floor((F.col("_off") + F.col("_cum") - F.col("n_tokens"))
                    / F.lit(int(budget_tokens))).cast("long").alias("shard"),
        )
    )


def benchmark_ngrams(bench: DataFrame, n: int = 8,
                     text_col: str = "text") -> DataFrame:
    """Distinct word n-grams of a benchmark/eval set — the contamination
    probe list.  Benchmarks are tiny next to a training corpus, so this
    side is broadcastable by construction."""
    from ..functions.text import word_ngrams

    return (
        bench.select(F.explode(word_ngrams(F.col(text_col), n))
                     .alias("gram"))
        .distinct()
    )


def decontaminate(docs: DataFrame, bench: DataFrame, n: int = 8,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str | None = None) -> DataFrame:
    """Drop every training doc sharing ANY word ``n``-gram with the
    benchmark set (the eval-decontamination step every serious training
    pipeline runs before the corpus ships).

    100 TB shape: the benchmark gram list is distinct-ed and BROADCAST
    (forced — it is bounded by the benchmark's size, not the corpus);
    corpus grams explode map-side and meet it in a broadcast semi-join,
    so the corpus is scanned once and only contaminated ids (a small set)
    ever aggregate.  The survivors come back full-width via anti-join on
    ids — the wide content column never shuffles."""
    from ..functions.text import word_ngrams

    grams = benchmark_ngrams(bench, n, bench_text_col or text_col)
    contaminated = (
        docs.select(id_col, F.explode(word_ngrams(F.col(text_col), n))
                    .alias("gram"))
        .join(F.broadcast(grams), "gram", "left_semi")
        .select(id_col)
        .distinct()
    )
    return docs.join(contaminated, id_col, "left_anti")
