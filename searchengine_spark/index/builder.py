"""Physical index builder: salted-shuffle merge -> compressed posting lists.

SURVEY.md §3.2 (build lifecycle) + §4 items 1/3/4/5.  Pipeline (ONE pass
over all segments that still need building):

  docs (ingested: doc_id, sha256)                       [narrow scan]
    -> fused Arrow analyzer: (repo, doc_id, lemma, tf, dl) computed
       entirely MAP-SIDE in one mapInPandas — a doc's tokens never leave
       its partition, so tf/dl need NO shuffle           [narrow]
    -> SALTED partial runs: groupBy(segment, lemma, salt=doc_id % S),
       runs sorted by doc_id, shipped as aligned
       primitive arrays (struct-field extraction)        [shuffle 1, bounded keys]
    -> final merge: groupBy(segment, BUCKET), per-lemma k-way merge of
       <= S sorted runs in numpy, delta+varbyte encode +
       block-max directory                               [shuffle 2, coarse groups]
    -> ONE write, partitionBy(segment, bucket(lemma)), dynamic partition
       overwrite (already-done segments untouched)       [partition-pruned reads]

(``analyzer_impl='jvm'`` swaps the first stage for the pure-Catalyst
tokenizer + two hash-agg shuffles — same output, tested equal.)

Why salted two-level merge (SURVEY.md §4 item 3): lemma frequency is Zipf —
a plain ``groupBy(lemma).collect_list`` sends the hottest term's entire
posting list through one reducer.  Salting bounds shuffle-3 key size (every
(lemma, salt) holds ~1/S of a hot term) and shuffle 4 only moves S
pre-sorted runs per lemma.  AQE skew handling fixes joins, not wide
aggregates, so this is explicit.

Doc-range SEGMENTS are the 10^12-file story: doc_id space is range-cut into
``n_segments``; each segment owns complete posting lists for its doc range,
so segments build independently (the checkpoint/resume unit) and query-time
top-k runs per segment then merges (index/wand.py).  At 100 TB segments map
to executor-sized work units.

Checkpoint manifests (§4 item 5): one JSON per segment with doc/term/posting
counts and an order-independent sha256 lineage fingerprint; a resumed build
filters the plan to segments without a 'done' manifest — the expensive
stages never touch finished doc ranges.  tests/test_physical_index.py
proves resumed output is byte-identical.
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

DICT_SCHEMA = T.StructType(
    [
        T.StructField("lemma", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("segment", T.IntegerType(), False),
        T.StructField("bucket", T.IntegerType(), False),
    ]
)

SITES_SCHEMA = T.StructType(
    [
        T.StructField("segment", T.IntegerType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("lo", T.LongType(), False),
        T.StructField("hi", T.LongType(), False),
    ]
)

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


def seg_ranges_filter(missing: list[int], seg_size: int):
    """``doc_id``-range predicate equivalent to ``seg.isin(missing)`` but
    PUSHABLE: ``floor(doc_id/seg_size) IN (...)`` is an expression parquet
    can't evaluate against row-group stats, while ``doc_id >= lo AND
    doc_id < hi`` prunes row groups — and the docs store writes its files
    sorted by doc_id exactly so this filter skips them (store.py).
    Contiguous missing segments collapse into single ranges."""
    if not missing:
        return F.lit(False)
    runs: list[tuple[int, int]] = []
    start = prev = missing[0]
    for s in missing[1:]:
        if s == prev + 1:
            prev = s
            continue
        runs.append((start, prev))
        start = prev = s
    runs.append((start, prev))
    cond = None
    for lo, hi in runs:
        c = (F.col("doc_id") >= lo * seg_size) & (F.col("doc_id") < (hi + 1) * seg_size)
        cond = c if cond is None else (cond | c)
    return cond


def hash_bucket(lemma: str, n_buckets: int) -> int:
    """Deterministic, Python/JVM-agreeing bucket: first 4 bytes of md5, big
    endian (not Python's salted builtin hash).  The JVM twin is
    :func:`hash_bucket_col`; tests assert they agree."""
    import hashlib

    return int.from_bytes(hashlib.md5(lemma.encode()).digest()[:4], "big") % n_buckets


def hash_bucket_col(lemma_col, n_buckets: int):
    """JVM column expression computing exactly :func:`hash_bucket`."""
    return F.pmod(
        F.conv(F.substring(F.md5(lemma_col), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    ).cast("int")


_ANALYZER_CACHE: dict[tuple[str, str],
                      tuple[str, dict[str, tuple[str, ...]] | None]] = {}


def index_analyzer(spark, index_dir: str, meta: dict | None = None,
                   ) -> tuple[str, dict[str, tuple[str, ...]] | None]:
    """(normalizer, forms) for analyzing QUERIES against this index.

    The index's morphology is an index property (``meta.normalizer`` +
    the ``dict_forms`` sidecar), so every serving path must analyze with
    the same table the build used — the reference's per-process morphology
    singleton (LemmaFinderImpl.java:25-31).  The dictionary is collected
    once per (index_dir, dict_sha) and cached process-wide; it is a
    bounded vocabulary artifact (MBs at any corpus size)."""
    if meta is None:
        with open(f"{index_dir}/meta.json") as fh:
            meta = json.load(fh)
    norm = meta.get("normalizer", "pinned")
    if norm not in ("dict", "dict_porter"):
        return norm, None
    key = (index_dir, str(meta.get("dict_sha", "")))
    hit = _ANALYZER_CACHE.get(key)
    if hit is None or hit[0] != norm:
        rows = spark.read.parquet(f"{index_dir}/dict_forms").collect()
        hit = (norm, {r["token"]: tuple(r["forms"]) for r in rows})
        _ANALYZER_CACHE[key] = hit
    return hit


def build_index(
    docs_ingested: DataFrame,
    out_dir: str,
    n_segments: int = 1,
    salt: int = 8,
    n_buckets: int = 16,
    block_size: int = 128,
    analyzer_impl: str = "arrow",
    resume: bool = True,
    fixed_avgdl: float | None = None,
    normalizer: str = "pinned",
    forms: dict[str, tuple[str, ...]] | None = None,
    positions: bool = False,
) -> dict:
    """Build (or resume) the physical index under ``out_dir``.

    Layout:
      out_dir/meta.json
      out_dir/manifests/segment=K.json
      out_dir/data/segment=K/bucket=B/*.parquet
      out_dir/dict_forms/  (normalizer='dict' only: the morphology table)

    ``normalizer``/``forms`` select the analyzer's normal-forms table
    ('pinned' fixture table, or 'dict' + an arbitrary dictionary — e.g.
    ``functions.english.ENGLISH_FORMS``); the choice is an INDEX PROPERTY
    pinned like seg_size: resumed/incremental builds reuse the stored
    normalizer and its persisted ``dict_forms`` sidecar, and every query
    path analyzes with the same table via :func:`index_analyzer` (the
    reference ships its morphology inside the index the same way —
    LemmaFinderImpl.java:25-31 singleton).

    ``positions=True`` builds the positional sidecar IN THE SAME corpus
    scan (fused union kernel, ``positions.doc_stats_and_positions_arrow``):
    the two-pass route (build_index + build_positions) tokenizes and
    normalizes every document twice — at 100 TB the second full analysis
    pass is the largest avoidable cost in a positional build.  Output is
    byte-identical to the two-pass route (parity-tested)."""
    import shutil

    from .checkpoint import segment_done, write_manifest

    spark = docs_ingested.sparkSession
    narrow = docs_ingested.select("repo", "doc_id", "content", "sha256")

    # seg_size is a PINNED index property: once an index exists, its doc-range
    # boundaries must never move under non-rebuilt segments (doc_ids are
    # global ranks; a grown corpus ADDS segments, it never resizes them).
    # salt/n_buckets/block_size are pinned with it — codec layout must agree
    # across segments.  The n_segments argument only shapes a FRESH build.
    old_meta: dict | None = None
    if resume and os.path.exists(f"{out_dir}/meta.json"):
        with open(f"{out_dir}/meta.json") as fh:
            old_meta = json.load(fh)
    if old_meta is not None:
        # the normalizer is pinned with the index (postings encode ITS
        # lemmas); a resumed build must analyze with the stored table
        normalizer = old_meta.get("normalizer", "pinned")
        if normalizer in ("dict", "dict_porter"):
            _, forms = index_analyzer(spark, out_dir, old_meta)
    if normalizer not in ("pinned", "dict", "dict_porter", "porter", "stem"):
        raise ValueError(
            "build_index supports normalizer in ('pinned', 'dict', "
            f"'dict_porter', 'porter', 'stem'), got {normalizer!r}")
    if normalizer == "dict" and analyzer_impl != "arrow":
        raise ValueError("normalizer='dict' requires analyzer_impl='arrow'")
    if positions and analyzer_impl != "arrow":
        raise ValueError(
            "positions=True (fused single-scan sidecar) requires "
            "analyzer_impl='arrow'; build with arrow or run "
            "build_positions separately")
    if normalizer in ("dict", "dict_porter") and forms is None:
        raise ValueError(f"normalizer={normalizer!r} needs a forms mapping")
    if normalizer in ("dict", "dict_porter") and old_meta is None:
        # validate user dictionaries ONCE, before the expensive build: a
        # duplicate form in a value tuple would crash the positional
        # sidecar deep inside an executor (strictly-increasing delta
        # assert), and uppercase keys are silently dead (the analyzer
        # lowercases before lookup)
        for key, vals in forms.items():
            if not vals:
                raise ValueError(f"forms[{key!r}] is empty")
            if len(set(vals)) != len(vals):
                raise ValueError(f"forms[{key!r}] has duplicate forms: "
                                 f"{tuple(vals)}")
            if key != key.lower():
                raise ValueError(
                    f"forms key {key!r} is not lowercase — the analyzer "
                    "lowercases tokens before lookup, so it can never fire")

    # n_docs (the BM25 idf/avgdl base) is the ROW count; the segment span
    # derives from max(doc_id)+1 — they differ once deletes leave id holes
    # (streaming/store.py delete_keys): a hole must not shrink the segment
    # range or the stale-segment cleanup below would drop live tail
    # segments.  Dense corpora: span == n_docs, behavior unchanged.
    # the sha256 per-row invariant (BASELINE.json input_hint) rides the SAME
    # aggregation: checkpointed rows are full-width anyway (no column
    # pruning to lose).  On a RESUMED build the sha2 CPU is scoped to the
    # doc ranges actually being (re)built — rows in 'done' segments were
    # verified when their segment was built, and any content change flows
    # through the dirty-segment discipline (manifest dropped), so a 1-doc
    # micro-batch pays O(batch) hashing, not O(corpus).  The count/max
    # still scan every row (they are global statistics regardless).
    _bad = (F.sha2(F.col("content"), 256) != F.col("sha256")).cast("int")
    if resume and old_meta is not None:
        _ss = int(old_meta["seg_size"])
        _old_n = int(old_meta["n_segments"])
        _known = [s for s in range(_old_n) if not segment_done(out_dir, s)]
        _bad = F.when(
            seg_ranges_filter(_known, _ss)
            | (F.col("doc_id") >= _old_n * _ss),
            _bad,
        ).otherwise(F.lit(0))
    _c = narrow.agg(
        F.count("*").alias("n"), F.max("doc_id").alias("mx"),
        F.sum(_bad).alias("bad_sha"),
    ).collect()[0]
    if int(_c["bad_sha"] or 0):
        raise ValueError(
            f"sha256 per-row invariant violated on {_c['bad_sha']} rows")
    n_docs = int(_c["n"])
    id_span = (int(_c["mx"]) + 1) if _c["mx"] is not None else 0
    if old_meta is not None:
        seg_size = int(old_meta["seg_size"])
        salt = int(old_meta["salt"])
        n_buckets = int(old_meta["n_buckets"])
        block_size = int(old_meta["block_size"])
        n_segments = max(1, math.ceil(id_span / seg_size))
    else:
        seg_size = max(1, math.ceil(id_span / n_segments))
    seg_col = (F.col("doc_id") / seg_size).cast("int")

    # corpus shrank: doc ranges beyond the new segment count are stale
    # everywhere (data, dict, manifest)
    if os.path.isdir(f"{out_dir}/data"):
        for name in os.listdir(f"{out_dir}/data"):
            if name.startswith("segment=") and int(name.split("=")[1]) >= n_segments:
                shutil.rmtree(f"{out_dir}/data/{name}", ignore_errors=True)
                shutil.rmtree(f"{out_dir}/dict/{name}", ignore_errors=True)
                shutil.rmtree(f"{out_dir}/sites/{name}", ignore_errors=True)
                shutil.rmtree(f"{out_dir}/positions/{name}", ignore_errors=True)
                p = f"{out_dir}/manifests/{name}.json"
                if os.path.exists(p):
                    os.unlink(p)

    # resume short-circuit: same corpus size and every segment 'done'
    if (
        old_meta is not None
        and int(old_meta.get("n_docs", -1)) == n_docs
        and all(segment_done(out_dir, s) for s in range(n_segments))
    ):
        if positions and not old_meta.get("has_positions"):
            # index data is current but the sidecar was never built (or a
            # previous refresh was interrupted): FULL standalone pass — a
            # cleared flag means leftover positions dirs are untrustworthy
            # (a crash mid-write leaves a dir with a subset of its
            # buckets), so the documented recovery is to rebuild them all
            # (incremental.rebuild_segments docstring)
            from .positions import build_positions

            return build_positions(docs_ingested, out_dir)
        return old_meta

    import time as _time

    timings: dict[str, float] = {}
    _t = _time.perf_counter()

    missing = [s for s in range(n_segments) if not (resume and segment_done(out_dir, s))]

    # The stored avgdl is reused on every PARTIAL rebuild: block-max upper
    # bounds must share one avgdl with the untouched segments (MaxScore
    # safety), and reusing it lets us prune the analyzer input to ONLY the
    # doc ranges being rebuilt — the expensive stage then costs O(rebuilt
    # range), not O(corpus).  A full rebuild refreshes it.
    avgdl: float | None = float(fixed_avgdl) if fixed_avgdl is not None else None
    if avgdl is None and old_meta is not None and 0 < len(missing) < n_segments:
        avgdl = float(old_meta["avgdl"])

    analyzed = narrow.select("repo", "doc_id", "content")
    if avgdl is not None and len(missing) < n_segments:
        # doc_id-range form of seg.isin(missing): pushed to the parquet scan
        # (row-group pruning against doc_id-sorted store files)
        analyzed = analyzed.filter(seg_ranges_filter(missing, seg_size))

    if analyzer_impl == "arrow":
        # fused Arrow analyzer: (tf, dl) computed entirely map-side in one
        # mapInArrow (a doc's tokens never leave its partition) — the first
        # shuffle of the whole build is the salted posting merge itself.
        # EVERY normalizer routes here (r5): the stemmer family stems the
        # batch's UNIQUE tokens via dictionary-encode inside the same
        # kernel, so 'porter'/'dict_porter' builds no longer pay the
        # unfused tokenize path's full per-occurrence shuffle (40k docs:
        # 46 s -> pinned-class).
        # MATERIALIZE stats once (localCheckpoint, not .cache()): both the
        # avgdl action and the merge pipeline consume it, and the SQL
        # cache's compressed-columnar form measured ~3x slower to re-scan
        # into Arrow batches than checkpointed rows on this host.  At
        # cluster scale this materialization is a staging write to durable
        # storage.
        if positions:
            # fused single-scan build: ONE analysis pass yields both the
            # (tf, dl) stat rows and the positional occurrence stream as a
            # union; both merges below consume filtered views of one
            # checkpoint (pos IS NULL <=> stat row)
            from .positions import doc_stats_and_positions_arrow

            combined = doc_stats_and_positions_arrow(
                analyzed, normalizer=normalizer, forms=forms,
            ).localCheckpoint()
            stats = combined.filter(F.col("pos").isNull()).drop("pos")
            posflat = combined.filter(F.col("pos").isNotNull()).select(
                "doc_id", "lemma", "pos")
        else:
            from ..analyzer import doc_term_stats_arrow

            stats = doc_term_stats_arrow(analyzed, normalizer=normalizer,
                                         forms=forms).localCheckpoint()
    else:
        tf = term_frequencies(analyzed, impl=analyzer_impl,
                              normalizer=normalizer, forms=forms)
        dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        stats = tf.join(dl, "doc_id").localCheckpoint()
    timings["analyze_plan_s"] = round(_time.perf_counter() - _t, 2)
    _t = _time.perf_counter()

    if avgdl is None:
        # avgdl over ALL docs (zero-lemma docs included) — matches the oracle.
        # Σ tf over every (doc, lemma) row == Σ dl over docs, so this is a
        # pure map-side partial aggregation of the persisted stats — no
        # distinct shuffle of the full posting stream (which at 160k docs
        # was a measurable slice of the build).
        total_dl = stats.agg(F.sum("tf")).collect()[0][0] or 0
        avgdl = float(total_dl) / n_docs if n_docs else 1.0
    timings["avgdl_s"] = round(__import__("time").perf_counter() - _t, 2)
    _t = __import__("time").perf_counter()

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
        "normalizer": normalizer,
    }
    os.makedirs(out_dir, exist_ok=True)
    if normalizer in ("dict", "dict_porter"):
        # persist the morphology table WITH the index (bounded vocabulary
        # artifact): serving analyzes queries with exactly the table that
        # produced the postings.  dict_sha keys the process-wide cache.
        import hashlib

        items = sorted((k, tuple(v)) for k, v in forms.items())
        dict_sha = hashlib.sha256(repr(items).encode()).hexdigest()[:16]
        meta["dict_sha"] = dict_sha
        if (old_meta is None
                or old_meta.get("dict_sha") != dict_sha
                or not os.path.isdir(f"{out_dir}/dict_forms")):
            (spark.createDataFrame(
                [(k, list(v)) for k, v in items],
                "token string, forms array<string>")
             .coalesce(1).write.mode("overwrite")
             .parquet(f"{out_dir}/dict_forms"))
    with open(f"{out_dir}/meta.json", "w") as fh:
        json.dump(meta, fh, indent=1)

    if not missing:
        if positions:
            # the meta rewrite above cleared has_positions.  If the OLD
            # flag was on, every untouched dir is part of a known-complete
            # sidecar: segments=[] is a pure bookkeeping repair.  If it was
            # off, leftover dirs are untrustworthy (interrupted write) —
            # full rebuild, the documented recovery path.
            from .positions import build_positions

            trust = bool(old_meta and old_meta.get("has_positions"))
            return build_positions(docs_ingested, out_dir,
                                   segments=[] if trust else None)
        # (no unpersist: stats is localCheckpoint()'d, not persist()'d — its
        # blocks are freed when the checkpointed RDD is driver-GC'd)
        return meta

    postings = (
        stats.withColumn("segment", seg_col)
        .filter(F.col("segment").isin(missing))
        .select("segment", "lemma", "doc_id", "tf", "dl")
    )

    # ---- stage 1: salted partial runs (bounded reducer keys) --------------
    # Runs travel as three ALIGNED primitive arrays (struct-field extraction
    # after sort_array, JVM-side): Arrow then hands numpy arrays to the
    # merge UDF directly — no per-posting Python dict handling.
    runs = (
        postings.withColumn("_salt", F.pmod(F.col("doc_id"), F.lit(salt)).cast("int"))
        .groupBy("segment", "lemma", "_salt")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "tf", "dl"))).alias("run"))
        .select(
            "segment",
            "lemma",
            hash_bucket_col(F.col("lemma"), n_buckets).alias("bucket"),
            F.col("run.doc_id").alias("r_docs"),
            F.col("run.tf").alias("r_tfs"),
            F.col("run.dl").alias("r_dls"),
        )
    )

    # ---- stage 2: k-way merge + encode, grouped by (segment, BUCKET) ------
    # Grouping by (segment, lemma) would mean one applyInPandas invocation
    # per term (tens of thousands of tiny Arrow batches — measured to
    # dominate the build); (segment, bucket) gives n_segments x n_buckets
    # well-sized groups and the per-lemma loop runs in pandas inside.
    def _merge(pdf):
        import numpy as np
        import pandas as pd

        from .codec import encode_postings_many

        cols = ["segment", "lemma", "df", "postings", "tfs", "dls", "blocks", "bucket"]
        if pdf.empty:
            return pd.DataFrame([], columns=cols)
        # One group == one (segment, bucket).  Instead of a per-lemma Python
        # loop, concatenate EVERY lemma's runs into flat arrays, sort once by
        # (lemma, doc_id) (runs are disjoint by salt so ids stay strict), and
        # batch-encode all lemmas in a single vectorized codec pass.
        seg = int(pdf["segment"].iloc[0])
        bucket = int(pdf["bucket"].iloc[0])
        lens = np.fromiter((len(a) for a in pdf["r_docs"]), dtype=np.int64,
                           count=len(pdf))
        codes, lemmas = pd.factorize(pdf["lemma"], sort=True)
        rid = np.repeat(codes, lens)
        docs = np.concatenate([np.asarray(a, dtype=np.int64) for a in pdf["r_docs"]])
        tfs = np.concatenate([np.asarray(a, dtype=np.int64) for a in pdf["r_tfs"]])
        dls = np.concatenate([np.asarray(a, dtype=np.int64) for a in pdf["r_dls"]])
        order = np.lexsort((docs, rid))
        docs, tfs, dls, rid = docs[order], tfs[order], dls[order], rid[order]
        counts = np.bincount(rid, minlength=len(lemmas))
        offsets = np.concatenate([[0], np.cumsum(counts)])
        encs = encode_postings_many(docs, tfs, dls, offsets, avgdl, K1, B, block_size)
        out = [
            {
                "segment": seg,
                "lemma": lemmas[t],
                "df": int(counts[t]),
                "postings": enc.docs,
                "tfs": enc.tfs,
                "dls": enc.dls,
                "blocks": [tuple(b) for b in enc.blocks],
                "bucket": bucket,
            }
            for t, enc in enumerate(encs)
        ]
        return pd.DataFrame(out, columns=cols)

    # Drop the rebuilt segments' directories wholesale BEFORE the write:
    # dynamic partition overwrite only replaces (segment, bucket) partitions
    # that receive rows, so a rebuilt segment that no longer produces rows
    # for a previously-populated bucket would silently keep serving the old
    # parquet (deleted content's postings).  Same for its dict partition.
    for s in missing:
        shutil.rmtree(f"{out_dir}/data/segment={s}", ignore_errors=True)
        shutil.rmtree(f"{out_dir}/dict/segment={s}", ignore_errors=True)
        shutil.rmtree(f"{out_dir}/sites/segment={s}", ignore_errors=True)
        # rebuilt ranges' positions are stale the moment the data changes;
        # meta.has_positions is also cleared by this build's meta rewrite —
        # build_positions(segs) refreshes both (rebuild_segments wires it)
        shutil.rmtree(f"{out_dir}/positions/segment={s}", ignore_errors=True)

    index_df = runs.groupBy("segment", "bucket").applyInPandas(_merge, schema=INDEX_OUT_SCHEMA)
    (
        index_df.repartition("segment", "bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")  # done segments untouched
        .partitionBy("segment", "bucket")
        .parquet(f"{out_dir}/data")
    )
    timings["merge_write_s"] = round(__import__("time").perf_counter() - _t, 2)
    _t = __import__("time").perf_counter()

    # An emptied corpus (store-level deletes removed everything) writes no
    # partitions at all: skip the read-backs that would fail inference
    import glob as _glob

    has_data = bool(_glob.glob(f"{out_dir}/data/segment=*"))

    # ---- dictionary: per-segment df per lemma, (segment, bucket)-partitioned
    # ≙ the reference's `lemma` table as a physical artifact.  Query-time
    # lookups read the term's bucket= dirs and sum df across segments (a few
    # rows per term).  Storing it per segment makes the dict rebuild
    # O(rebuilt segments) — a column-pruned read-back of the fresh index
    # partitions (parquet never touches the postings bytes) under the same
    # dynamic-overwrite discipline as the data itself.
    # Direct segment-path read with the explicit schema: no root listing,
    # no footer inference, scan restricted to the rebuilt dirs by PATH (the
    # same O(touched) discipline as the store's read_store(kbs=...)).  No
    # repartition either — scan tasks already align with (segment, bucket)
    # dirs, so the write needs no shuffle stage.
    seg_paths = [p for s in missing
                 for p in _glob.glob(f"{out_dir}/data/segment={s}")]
    if has_data and seg_paths:
        (
            spark.read.schema(INDEX_OUT_SCHEMA)
            .option("basePath", f"{out_dir}/data")
            .parquet(*seg_paths)
            .select("lemma", "df", "segment", "bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("segment", "bucket")
            .parquet(f"{out_dir}/dict")
        )
    timings["dict_s"] = round(__import__("time").perf_counter() - _t, 2)
    _t = __import__("time").perf_counter()

    # ---- sites sidecar: per-segment (repo, lo, hi) doc_id islands ---------
    # Because ingest ranks doc_ids by (repo, path, commit), a repo's docs are
    # contiguous runs in id space (the fresh-build prefix is ONE run per
    # repo; each streaming append adds at most one tail run per repo per
    # batch) — so the reference's `site=` search filter becomes an interval
    # mask on candidate doc_ids at query time (wand.py), with NO join
    # against a docs table.  Gaps-and-islands per (segment, repo):
    # doc_id - row_number is constant exactly on a contiguous run.  Same
    # O(rebuilt segments) dynamic-overwrite discipline as data/dict.
    from pyspark.sql import Window as _W

    sites = (
        narrow.filter(seg_ranges_filter(missing, seg_size))
        .withColumn("segment", seg_col)
        .select("segment", "repo", "doc_id")
        .withColumn(
            "island",
            F.col("doc_id") - F.row_number().over(
                _W.partitionBy("segment", "repo").orderBy("doc_id")),
        )
        .groupBy("segment", "repo", "island")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .select("segment", "repo", "lo", "hi")
    )
    (
        sites.repartition("segment")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("segment")
        .parquet(f"{out_dir}/sites")
    )
    timings["sites_s"] = round(__import__("time").perf_counter() - _t, 2)
    _t = __import__("time").perf_counter()

    # ---- manifests: one grouped agg per side, single job each -------------
    lineage = {
        r["segment"]: r
        for r in narrow.filter(seg_ranges_filter(missing, seg_size))
        .withColumn("segment", seg_col)
        .groupBy("segment")
        .agg(
            F.count("*").alias("docs"),
            F.expr(
                "bit_xor(cast(conv(substring(sha256, 1, 15), 16, 10) as bigint))"
            ).alias("sha_xor"),
        )
        .collect()
    }
    written = {
        r["segment"]: r
        for r in (
            spark.read.parquet(f"{out_dir}/data")
            .filter(F.col("segment").isin(missing))
            .groupBy("segment")
            .agg(
                F.count("*").alias("terms"), F.sum("df").alias("postings"),
                F.sum(
                    F.length("postings") + F.length("tfs") + F.length("dls")
                ).alias("bytes"),
            )
            .collect()
        )
    } if has_data else {}
    for seg in missing:
        lin = lineage.get(seg)
        wrt = written.get(seg)
        write_manifest(
            out_dir,
            seg,
            {
                "segment": seg,
                "doc_count": int(lin["docs"]) if lin else 0,
                "term_count": int(wrt["terms"]) if wrt else 0,
                "posting_count": int(wrt["postings"]) if wrt else 0,
                "posting_bytes": int(wrt["bytes"]) if wrt else 0,
                "input_sha_xor": int(lin["sha_xor"]) if lin and lin["sha_xor"] is not None else 0,
                "status": "done",
            },
        )
    # bytes-per-posting estimate for the serving broker: with it, a term's
    # driver-side working-set size is predictable from its dictionary df
    # ALONE (est = gdf * bytes_per_posting), so QueryEngine can route an
    # over-threshold term to the distributed path WITHOUT first collecting
    # its posting bytes (the r3 fetch-before-guard hole).  Summed over every
    # 'done' manifest so partial rebuilds keep the estimate index-wide;
    # pre-r4 manifests without posting_bytes simply don't contribute.
    from .checkpoint import all_manifests

    tot_b = tot_p = 0
    complete = True  # every done manifest contributed byte stats?
    for m in all_manifests(out_dir):
        if "posting_bytes" in m:
            tot_b += int(m["posting_bytes"])
            tot_p += int(m["posting_count"])
        else:
            complete = False  # pre-r4 manifest: its bytes are unknown
    if tot_p:
        # the RATIO is a sound estimate even from a subset of segments...
        meta["bytes_per_posting"] = round(tot_b / tot_p, 3)
        # ...but the whole-index byte TOTAL (QueryEngine's skip-the-guard
        # short-circuit: index <= threshold => no term can exceed it) is
        # only sound when EVERY manifest contributed — an undercounted
        # total on a mixed-generation index would reopen the
        # fetch-before-guard hole for exactly the big indexes it protects.
        if complete:
            meta["posting_bytes"] = int(tot_b)
        with open(f"{out_dir}/meta.json", "w") as fh:
            json.dump(meta, fh, indent=1)
    timings["manifests_s"] = round(_time.perf_counter() - _t, 2)
    _t = _time.perf_counter()

    if positions and has_data:
        # positional sidecar from the SAME analysis pass (no second corpus
        # scan): merge-encode the fused occurrence stream for the rebuilt
        # segments.  Runs after the manifests exist — the positional stats
        # ride them (estimate-before-fetch discipline).
        from .positions import _merge_write_positions, build_positions

        # A partially-resumed build over an index whose flag was OFF
        # leaves the untouched segments without a trustworthy sidecar
        # (never built, or an interrupted write left partial dirs) — their
        # text was not analyzed by this job, so cover them with the
        # standalone pass first.  Indexes whose flag was ON don't hit
        # this: only the rebuilt segments' dirs were cleared above, and
        # the untouched ones belong to a known-complete sidecar.  The
        # fused merge runs LAST so its bookkeeping flips has_positions
        # only once every segment is covered (the flip itself also
        # requires all dirs present — positions._positions_bookkeeping).
        trust = bool(old_meta and old_meta.get("has_positions"))
        rest = ([] if trust
                else [s for s in range(n_segments) if s not in set(missing)])
        if rest:
            build_positions(docs_ingested, out_dir, segments=rest)
        meta = _merge_write_positions(posflat, out_dir, meta, missing)
        timings["positions_s"] = round(_time.perf_counter() - _t, 2)

    meta["timings"] = timings
    return meta


def read_index(spark: SparkSession, out_dir: str, lemmas: list[str] | None = None) -> DataFrame:
    """Read the index; with ``lemmas`` given, prune to their buckets
    (partition pruning on bucket=) and filter exact terms.  An index built
    over an emptied corpus (no segment= dirs) reads as empty."""
    import glob as _glob

    with open(f"{out_dir}/meta.json") as fh:
        meta = json.load(fh)
    if not _glob.glob(f"{out_dir}/data/segment=*"):
        return spark.createDataFrame([], INDEX_OUT_SCHEMA)
    # explicit schema: partition discovery still lists dirs, but no parquet
    # footer sampling for schema inference (O(1) planning per read)
    df = spark.read.schema(INDEX_OUT_SCHEMA).parquet(f"{out_dir}/data")
    if lemmas is not None:
        buckets = sorted({hash_bucket(x, meta["n_buckets"]) for x in lemmas})
        df = df.filter(F.col("bucket").isin(buckets)).filter(F.col("lemma").isin(lemmas))
    return df


def read_site_ranges(spark: SparkSession, out_dir: str,
                     site: str) -> list[tuple[int, int]]:
    """Doc_id intervals owned by ``site`` (repo), merged across segments —
    the reference's `site=` search scope (SearchServiceImpl.java filters
    hits to one site's pages) resolved to id ranges.  A site absent from
    the sidecar (or an emptied index) returns [] — no pages, no hits.
    The sites table is O(repos + append batches) rows: driver-collectable
    by construction, one pruned read per (engine, site)."""
    import glob as _glob

    if not _glob.glob(f"{out_dir}/sites/segment=*"):
        return []
    rows = (
        spark.read.schema(SITES_SCHEMA).parquet(f"{out_dir}/sites")
        .filter(F.col("repo") == site)
        .select("lo", "hi")
        .collect()
    )
    merged: list[tuple[int, int]] = []
    for lo, hi in sorted((int(r["lo"]), int(r["hi"])) for r in rows):
        if merged and lo == merged[-1][1] + 1:  # runs split only by the
            merged[-1] = (merged[-1][0], hi)    # segment boundary: rejoin
        else:
            merged.append((lo, hi))
    return merged
