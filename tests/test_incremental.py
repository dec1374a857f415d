"""Incremental re-index + streaming ingest (reference POST /api/indexPage
analog, SURVEY.md §2.9/§3.3)."""

from __future__ import annotations

import json

from searchengine_spark.corpus import gen_corpus_local, ingest
from searchengine_spark.index.builder import build_index, read_index
from searchengine_spark.index.checkpoint import all_manifests, read_manifest
from searchengine_spark.index.wand import bm25_topk
from searchengine_spark.schema import DOCS_SCHEMA
from searchengine_spark.streaming.incremental import (
    affected_segments,
    incremental_reindex,
)


def test_incremental_rebuilds_only_touched_segment(spark, tmp_path):
    rows = gen_corpus_local(120)
    docs = ingest(spark.createDataFrame(rows, DOCS_SCHEMA))
    out = str(tmp_path / "idx")
    build_index(docs, out, n_segments=3, salt=4, n_buckets=4)
    before = {m["segment"]: m for m in all_manifests(out)}

    # mutate one doc's content (same (repo, path, commit) key -> same doc_id)
    target = docs.filter("doc_id = 5").collect()[0]
    rows2 = [
        (r[0], r[1], r[2], r[3],
         r[4] + " zz_incremental_marker" if (r[0], r[1]) == (target["repo"], target["path"]) else r[4])
        for r in rows
    ]
    docs2 = ingest(spark.createDataFrame(rows2, DOCS_SCHEMA))
    rebuilt = incremental_reindex(docs2, out, [5])
    assert rebuilt == affected_segments(out, [5]) and len(rebuilt) == 1

    after = {m["segment"]: m for m in all_manifests(out)}
    for s, m in after.items():
        if s in rebuilt:
            assert m["input_sha_xor"] != before[s]["input_sha_xor"]
        else:
            assert m == before[s]  # untouched segments keep their manifests

    # the new term is findable; avgdl preserved in meta
    hits = bm25_topk(spark, out, "incremental marker", 10, conjunctive=True).collect()
    assert [r["doc_id"] for r in hits] == [5]
    with open(f"{out}/meta.json") as fh:
        assert json.load(fh)["avgdl"] > 0


def test_stream_ingest_availablenow(spark, tmp_path):
    from searchengine_spark.streaming.incremental import stream_ingest

    landing = tmp_path / "landing"
    landing.mkdir()
    rows = gen_corpus_local(40)
    spark.createDataFrame(rows[:30], DOCS_SCHEMA).write.parquet(str(landing / "b0"))

    store = str(tmp_path / "store")
    idx = str(tmp_path / "sidx")
    ckpt = str(tmp_path / "ckpt")
    stream_ingest(spark, str(landing) + "/*", store, idx, ckpt)

    assert spark.read.parquet(store).count() == 30
    assert read_manifest(idx, 0) is not None
    n_terms_1 = read_index(spark, idx).count()
    assert n_terms_1 > 0

    # second micro-batch: 10 more docs drained by a fresh availableNow run
    spark.createDataFrame(rows[30:], DOCS_SCHEMA).write.parquet(str(landing / "b1"))
    stream_ingest(spark, str(landing) + "/*", store, idx, ckpt)
    assert spark.read.parquet(store).count() == 40
