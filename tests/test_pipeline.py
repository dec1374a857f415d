"""clean_corpus training-data pipeline (operators/pipeline.py): keep-filter
semantics against the planted corpus markers, dedup keep-min-id, full-width
output contract, and the 100 TB plan shape (map-side filter, single agg
shuffle, no Python)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from searchengine_spark.operators.pipeline import (
    clean_corpus_rows,
    clean_corpus_summary,
)


def test_clean_corpus_rows_markers_and_dedup(spark, docs, corpus_rows):
    n = len(corpus_rows)
    out = clean_corpus_rows(docs, text_col="content", id_col="doc_id",
                            lang=None)
    got = {r["doc_id"]: r for r in out.collect()}

    by_key = {r["doc_id"]: r for r in docs.collect()}
    empty_ids = [d for d, r in by_key.items() if r["content"] == ""]
    assert empty_ids and not any(d in got for d in empty_ids)

    # the planted duplicate pair (doc 0's content in another repo) collapses
    # to the min doc_id member
    fp = {}
    for d, r in by_key.items():
        key = hashlib.md5(" ".join(r["content"].lower().split()).encode()
                          ).hexdigest()
        fp.setdefault(key, []).append(d)
    dup_groups = [sorted(v) for v in fp.values() if len(v) > 1 and
                  by_key[v[0]]["content"]]
    assert dup_groups  # the corpus plants one
    for grp in dup_groups:
        assert grp[0] in got and not any(d in got for d in grp[1:])

    # full-width contract: original columns + ingest's doc_id/sha256
    assert out.columns == docs.columns
    assert 0 < len(got) < n


def test_clean_corpus_summary_counts(spark, docs):
    summ = {r["fp"]: r for r in
            clean_corpus_summary(docs, text_col="content", id_col="doc_id",
                                 lang=None).collect()}
    dups = [r for r in summ.values() if r["n_dups"] > 1]
    assert dups and all(r["keep_id"] >= 0 for r in dups)
    rows = clean_corpus_rows(docs, text_col="content", id_col="doc_id",
                             lang=None).count()
    assert rows == len(summ)


def test_clean_corpus_plan_shape(spark, docs):
    """Scale contract: no Python eval anywhere, exactly ONE exchange for the
    summary (the fingerprint hash-agg — filters stay map-side), and the
    keep-ids side of the rows join is broadcast."""
    summ = clean_corpus_summary(docs, text_col="content", id_col="doc_id",
                                lang=None)
    plan = summ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") == 1


def test_repetition_ratio_planted_values(spark):
    """Exact duplicated-3-gram fractions on planted texts (the gate twin
    checks Spark==DuckDB; this pins the VALUES both agree on)."""
    from searchengine_spark.functions.text import repetition_ratio

    df = spark.createDataFrame(
        [(1, "a b c a b c a b c"),   # 7 grams, 3 distinct -> 1 - 3/7
         (2, "one two"),             # < 3 tokens -> 0
         (3, "w1 w2 w3 w4"),         # all grams distinct -> 0
         (4, "")],                   # empty -> 0
        "doc_id int, text string")
    got = {r["doc_id"]: r["rep"] for r in df.select(
        "doc_id", repetition_ratio(F.col("text")).alias("rep")).collect()}
    assert got[1] == round(1 - 3 / 7, 4)
    assert got[2] == 0.0 and got[3] == 0.0 and got[4] == 0.0


def test_pii_mask_and_counts(spark):
    from searchengine_spark.functions.text import (
        email_count,
        mask_pii,
        url_count,
    )

    df = spark.createDataFrame(
        [(1, "mail bob@x.io or visit https://a.example/c?u=eve@y.io now"),
         (2, "no pii here")],
        "doc_id int, text string")
    out = {r["doc_id"]: r for r in df.select(
        "doc_id",
        email_count(F.col("text")).alias("ne"),
        url_count(F.col("text")).alias("nu"),
        mask_pii(F.col("text")).alias("m"),
    ).collect()}
    # counts run on raw text: both emails counted, one URL
    assert out[1]["ne"] == 2 and out[1]["nu"] == 1
    # mask applies URLs FIRST: the query-string email vanishes inside <URL>
    assert out[1]["m"] == "mail <EMAIL> or visit <URL> now"
    assert out[2]["ne"] == 0 and out[2]["nu"] == 0
    assert out[2]["m"] == "no pii here"


def test_sample_corpus_deterministic_and_stratified(spark):
    from searchengine_spark.operators.pipeline import sample_corpus

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = {r["doc_id"] for r in sample_corpus(docs, 0.3).select("doc_id").collect()}
    b = {r["doc_id"] for r in sample_corpus(docs, 0.3).select("doc_id").collect()}
    assert a == b and a  # identical rows on rerun — the whole contract
    n = docs.count()
    assert 0.2 < len(a) / n < 0.4  # ~30%
    # stratified: zh kept whole, en cut hard
    s = sample_corpus(docs, 0.3, by="lang", fractions={"zh": 1.0, "en": 0.05})
    got = {r["lang"]: r["n"] for r in
           s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    tot = {r["lang"]: r["n"] for r in
           docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got["zh"] == tot["zh"]
    assert got.get("en", 0) < 0.15 * tot["en"]
    # a different salt is a different (still deterministic) sample
    c = {r["doc_id"] for r in
         sample_corpus(docs, 0.3, salt="other").select("doc_id").collect()}
    assert c != a


def test_pack_shards_budget_invariant(spark):
    from searchengine_spark.operators.pipeline import pack_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = pack_shards(docs, budget_tokens=3000).orderBy("doc_id").collect()
    assert len(rows) == docs.count()
    # shards are contiguous, start at 0, and never skip
    shards = [r["shard"] for r in rows]
    assert shards[0] == 0 and shards == sorted(shards)
    assert set(shards) == set(range(max(shards) + 1))
    # a shard's PRECEDING total stays under budget (each doc starts in the
    # shard its cumulative start position falls in)
    cum = 0
    for r in rows:
        assert r["shard"] == cum // 3000
        cum += r["n_tokens"]


def test_pack_shards_two_level_identity_and_plan(spark):
    """r4 VERDICT item 1: the two-level cumsum (per-bucket window +
    broadcast exclusive prefix offsets) is row-identical to a global
    cumsum, and the window's exchange hash-partitions on the bucket key —
    no single-partition global sort anywhere in the plan."""
    from searchengine_spark.operators.pipeline import pack_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = pack_shards(docs, budget_tokens=3000, bucket_size=7)
    got = out.orderBy("doc_id").collect()
    # one giant bucket degenerates to the old single global cumsum
    ref = (pack_shards(docs, budget_tokens=3000, bucket_size=1 << 62)
           .orderBy("doc_id").collect())
    assert got == ref
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "hashpartitioning(_bkt" in plan
    assert "SinglePartition" not in plan


def test_clean_corpus_job_pack_budget_end_to_end(spark, tmp_path, capsys,
                                                 monkeypatch):
    """r4 VERDICT item 6: the cleaning job's --pack-budget stage ends the
    funnel in trainer-ready shards — output partitioned by shard=, the
    printed JSON carries the funnel counts + n_shards, and the shard
    assignment satisfies the contiguous token-budget invariant over the
    job's own n_tokens column (computed AFTER --mask-pii)."""
    import jobs.clean_corpus as job

    out = str(tmp_path / "cleaned")
    budget = 3000
    monkeypatch.setattr("sys.argv", [
        "clean_corpus.py", "--synthetic", "200", "--out", out,
        "--pack-budget", str(budget), "--mask-pii", "--cores", "8",
        "--near-dup-threshold", "0.3",
    ])
    job.main()
    stats = __import__("json").loads(capsys.readouterr().out.strip()
                                     .splitlines()[-1])
    assert stats["n_in"] == 200 and stats["n_out"] > 0
    assert stats["n_shards"] >= 1
    # the near-dup collapse stage reports its funnel count and never grows
    assert 0 < stats["n_post_near_dup"] <= stats["n_post_dedup"]
    assert stats["n_out"] == stats["n_post_near_dup"]

    rows = (spark.read.parquet(out)
            .select("doc_id", "n_tokens", "shard", "content", "sha256")
            .orderBy("doc_id").collect())
    assert len(rows) == stats["n_out"]
    shards = {r["shard"] for r in rows}
    assert len(shards) == stats["n_shards"]
    cum = 0
    for r in rows:  # contiguous budget cuts over the post-mask token counts
        assert r["shard"] == cum // budget
        cum += r["n_tokens"]
    # the mask-pii re-hash invariant survives the pack join + shard write
    import hashlib
    for r in rows[:20]:
        assert r["sha256"] == hashlib.sha256(
            r["content"].encode()).hexdigest()


def test_decontaminate_planted_overlap(spark):
    """A doc copying an 8-gram from the benchmark is dropped; unrelated
    docs and sub-8-token docs survive; the gram join is a broadcast."""
    from searchengine_spark.operators.pipeline import decontaminate

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "prefix words alpha beta gamma delta epsilon zeta eta theta "
             "suffix"),                                   # copies an 8-gram
         (2, "alpha beta gamma delta epsilon zeta eta"),  # only 7 shared
         (3, "completely unrelated content of honest provenance here"),
         (4, "tiny doc")],
        "doc_id long, text string")
    out = decontaminate(docs, bench, n=8)
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 3, 4]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
