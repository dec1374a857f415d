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


def test_changed_segments_rank_shift(spark, tmp_path):
    """Insert/remove shifts later ranks: every segment containing a shifted,
    added, removed, or content-changed id must be flagged — on either side
    of the diff — and nothing else."""
    from searchengine_spark.streaming.incremental import changed_segments

    rows = gen_corpus_local(60)
    old = ingest(spark.createDataFrame(rows, DOCS_SCHEMA))

    # content-only change of doc_id 7: exactly its segment is dirty
    t = old.filter("doc_id = 7").collect()[0]
    rows_c = [(r[0], r[1], r[2], r[3], r[4] + " zz")
              if (r[0], r[1]) == (t["repo"], t["path"]) else r for r in rows]
    new_c = ingest(spark.createDataFrame(rows_c, DOCS_SCHEMA))
    assert changed_segments(old, new_c, seg_size=20) == [0]

    # remove the doc ranked 7: ids 8.. all shift down one -> every segment
    # from 7's upward is dirty (here: all three)
    key7 = (t["repo"], t["path"])
    rows_r = [r for r in rows if (r[0], r[1]) != key7]
    new_r = ingest(spark.createDataFrame(rows_r, DOCS_SCHEMA))
    assert changed_segments(old, new_r, seg_size=20) == [0, 1, 2]

    # unchanged corpus: nothing dirty
    new_same = ingest(spark.createDataFrame(rows, DOCS_SCHEMA))
    assert changed_segments(old, new_same, seg_size=20) == []


def test_stream_ingest_additive_batch_index_correct(spark, tmp_path):
    """The ADVICE r1 scenario: an additive micro-batch grows the corpus
    (30 -> 40 docs).  seg_size must stay PINNED (segments appended, not
    resized), rank-shifted docs must be re-indexed, and the final index
    must equal a from-scratch build over the merged corpus — checked by
    querying it and by comparing the full postings surface."""
    from searchengine_spark.streaming.incremental import stream_ingest

    landing = tmp_path / "landing"
    landing.mkdir()
    rows = gen_corpus_local(40)
    spark.createDataFrame(rows[:30], DOCS_SCHEMA).write.parquet(str(landing / "b0"))
    store = str(tmp_path / "store")
    idx = str(tmp_path / "sidx")
    stream_ingest(spark, str(landing) + "/*", store, idx, str(tmp_path / "ckpt"))
    with open(f"{idx}/meta.json") as fh:
        seg_size_1 = json.load(fh)["seg_size"]

    spark.createDataFrame(rows[30:], DOCS_SCHEMA).write.parquet(str(landing / "b1"))
    stream_ingest(spark, str(landing) + "/*", store, idx, str(tmp_path / "ckpt"))

    with open(f"{idx}/meta.json") as fh:
        meta = json.load(fh)
    assert meta["seg_size"] == seg_size_1  # pinned across the grow
    assert meta["n_docs"] == 40
    assert spark.read.parquet(store).count() == 40

    # the incremental index must carry EXACTLY the postings of a fresh
    # build over the merged corpus (same doc_ids: ingest is deterministic).
    # Segment boundaries legitimately differ (pinned seg_size 15 vs a fresh
    # ceil(40/2)=20), so compare the LOGICAL surface: decoded per-lemma
    # (doc_id, tf) sets across all segments.
    fresh_dir = str(tmp_path / "fresh")
    merged = ingest(spark.createDataFrame(rows, DOCS_SCHEMA))
    build_index(merged, fresh_dir, n_segments=2, resume=False)

    def surface(d):
        from searchengine_spark.index.wand import TermPostings

        out: dict[str, set] = {}
        for r in read_index(spark, d).collect():
            tp = TermPostings(bytes(r["postings"]), bytes(r["tfs"]),
                              bytes(r["dls"]), r["blocks"], r["df"])
            ids, tfs, _ = tp.decode_all()
            out.setdefault(r["lemma"], set()).update(
                zip(ids.tolist(), tfs.tolist()))
        return out

    assert surface(idx) == surface(fresh_dir)

    # and it answers queries over docs from BOTH batches
    hits = {r["doc_id"] for r in bm25_topk(spark, idx, "kw_rare_xyzzy", 10).collect()}
    fresh_hits = {r["doc_id"] for r in bm25_topk(spark, fresh_dir, "kw_rare_xyzzy", 10).collect()}
    assert hits == fresh_hits and hits
