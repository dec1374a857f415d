"""Corpus determinism, planted markers, ingest invariants (SURVEY.md §5.2-3)."""

from __future__ import annotations

from searchengine_spark.corpus import (
    DF_THRESHOLD_FIXTURE,
    gen_corpus_local,
    ingest,
    sha256_invariant_ok,
)
from searchengine_spark.schema import DOCS_SCHEMA


def test_generation_deterministic(corpus_rows):
    again = gen_corpus_local(len(corpus_rows))
    assert again == corpus_rows


def test_markers(corpus_rows):
    n = len(corpus_rows)
    rare = [r for r in corpus_rows if "kw_rare_xyzzy" in r[4]]
    assert len(rare) == 3
    common = [r for r in corpus_rows if "kw_common_foo" in r[4]]
    assert len(common) > DF_THRESHOLD_FIXTURE
    assert corpus_rows[n - 1][4] == ""  # empty doc
    assert all(len(t) <= 3 or not t.isalpha()
               for t in corpus_rows[n - 2][4].split())  # punct-only doc
    # duplicated doc across two repos (same content, different repo)
    dup = corpus_rows[n - 3]
    assert dup[4] == corpus_rows[0][4] and dup[0] != corpus_rows[0][0]


def test_repo_skew(corpus_rows):
    from collections import Counter

    sizes = Counter(r[0] for r in corpus_rows)
    ordered = sorted(sizes.values(), reverse=True)
    assert ordered[0] > 3 * ordered[-1]  # Zipf skew present


def test_distributed_generation_matches_local(spark, corpus_rows):
    from searchengine_spark.corpus import corpus_df

    dist = corpus_df(spark, len(corpus_rows), partitions=7)
    got = sorted(tuple(r) for r in dist.collect())
    assert got == sorted(corpus_rows)


def test_ingest_docid_stable_across_partitioning(spark, corpus_rows):
    df = spark.createDataFrame(corpus_rows, DOCS_SCHEMA)
    a = {(r["repo"], r["path"]): r["doc_id"]
         for r in ingest(df, key_partitions=3).collect()}
    b = {(r["repo"], r["path"]): r["doc_id"]
         for r in ingest(df.repartition(13), key_partitions=11).collect()}
    assert a == b
    # doc_id = global rank of (repo, path, commit)
    n = len(corpus_rows)
    assert sorted(a.values()) == list(range(n))


def test_ingest_matches_oracle_ids(docs, oracle):
    got = {r["doc_id"]: (r["repo"], r["path"]) for r in docs.collect()}
    want = {d: (v["repo"], v["path"]) for d, v in oracle.docs.items()}
    assert got == want


def test_sha256_invariant(docs):
    assert sha256_invariant_ok(docs)
    import hashlib

    row = docs.filter("doc_id = 0").collect()[0]
    assert row["sha256"] == hashlib.sha256(row["content"].encode()).hexdigest()
