"""Physical-plan quality regressions: the plans we designed for must be the
plans Catalyst actually picks (broadcasts, pushdown, codegen, no stray
Python/shuffles).  Guard rails for the 100 TB story."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dictionary_join_is_broadcast(spark, docs, logical_index):
    from searchengine_spark.operators.search import conjunctive_candidates, matched_lemmas

    tf, lemmas = logical_index
    m = matched_lemmas(spark, lemmas, ["tamok", "velsor"], threshold=50)
    plan = _plan(conjunctive_candidates(tf, m))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # query side must never sort-merge


def test_point_lookup_pushes_filters(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") == 42)
        .select("doc_id", "source")
    )
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "IsNotNull(doc_id)" in plan
    # column pruning: text column not read
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and all("text" not in ln for ln in scan)


def test_jvm_analyzer_has_no_python_stage(spark, docs):
    from searchengine_spark.analyzer import tokenize_jvm

    plan = _plan(tokenize_jvm(docs.select("doc_id", "content")))
    assert "EvalPython" not in plan  # neither Batch- nor ArrowEvalPython
    assert "MapInPandas" not in plan
    assert "Generate explode" in plan  # JVM-side explode of the token array


def test_arrow_analyzer_uses_arrow_not_pickle(spark, docs):
    from searchengine_spark.analyzer import tokenize_arrow

    plan = _plan(tokenize_arrow(docs.select("doc_id", "content")))
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan  # never row-pickled Python


def test_exact_dedup_single_shuffle(spark):
    from searchengine_spark.operators.dedup import exact_dedup

    # plain scan input so the plan shows only the operator's own exchanges
    # (the ingest lineage adds its own); dedup itself must be exactly one
    # partial+final hash-agg shuffle
    raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(exact_dedup(raw, "text", "doc_id"))
    assert plan.count("Exchange") == 1


def test_topk_compiles_to_take_ordered(spark, docs):
    df = docs.select("doc_id", "repo").orderBy(F.desc("doc_id")).limit(5)
    assert "TakeOrderedAndProject" in _plan(df)


def test_index_read_prunes_buckets(spark, tmp_path, docs):
    from searchengine_spark.index.builder import build_index, hash_bucket, read_index

    out = str(tmp_path / "idx")
    build_index(docs, out, n_segments=2, salt=2, n_buckets=8)
    pruned = read_index(spark, out, ["tamok"])
    plan = _plan(pruned)
    bucket = hash_bucket("tamok", 8)
    # partition pruning on the bucket= dir must reach the scan
    assert f"bucket#" in plan or "PartitionFilters" in plan
    rows = pruned.select("bucket").distinct().collect()
    assert [r["bucket"] for r in rows] == [bucket]
