"""Fused single-scan positional build (builder.build_index(positions=True)):

The two-pass route (build_index + build_positions) tokenizes and normalizes
every document TWICE — at 100 TB the second full analysis pass is the
largest avoidable cost in a positional build.  The fused route analyzes
once (positions.doc_stats_and_positions_arrow, a union kernel emitting both
the (tf, dl) stat rows and the positional occurrence stream) and must be
BYTE-IDENTICAL in every artifact: postings, dictionary, sites, manifests,
positional sidecar, meta.  These tests pin that contract, the kernel's
value-parity with both parent kernels under every normalizer, and the
resume/flag edge cases."""

from __future__ import annotations

import json
import os

import pytest

from searchengine_spark.analyzer import doc_term_stats_arrow
from searchengine_spark.corpus import gen_corpus_local
from searchengine_spark.index.builder import build_index, read_index
from searchengine_spark.index.phrase import phrase_topk
from searchengine_spark.index.positions import (
    build_positions,
    doc_lemma_positions,
    doc_lemma_positions_stemmed,
    doc_stats_and_positions_arrow,
    read_positions,
)
from searchengine_spark.schema import DOCS_SCHEMA
from searchengine_spark.streaming.store import init_store, read_store

# camelCase splits, punctuation strips, stopwords, short tokens, digits,
# pinned multi-lemma keys (норма, geese), porter suspects, empties
TEXTS = [
    "getUserNameFromDB returns the userName quickly",
    "норма check: geese fly; the goose remains",
    "x = foo_bar(1, 2); // leaves rational disagreement",
    "   ",
    "",
    "ALLCAPS lower MixedCaseToken del2digits 42 a bb ccc",
    "running runner ran leaves leaving geese норма geese",
    "tamok velsor veltadrolix tamok",
    "punct!!!---###strip    tabs\tand\nnewlines here",
    "повторить повторить повторить норма",
]

NORMALIZERS = [
    ("pinned", None),
    ("dict", {"geese": ("goose", "geese"), "leaves": ("leave", "leaf")}),
    ("porter", None),
    ("stem", None),
    ("dict_porter", {"geese": ("goose", "geese"),
                     "leaves": ("leave", "leaf")}),
]


def _texts_df(spark):
    rows = [("r%d" % (i % 3), i, t) for i, t in enumerate(TEXTS)]
    return spark.createDataFrame(
        rows, "repo string, doc_id long, content string")


@pytest.mark.parametrize("norm,forms", NORMALIZERS,
                         ids=[n for n, _ in NORMALIZERS])
def test_fused_kernel_parity(spark, norm, forms):
    """The union kernel's two halves must be value-identical to the kernels
    they fuse: stat rows == doc_term_stats_arrow, occurrence rows ==
    doc_lemma_positions(_stemmed) — per normalizer family."""
    docs = _texts_df(spark)
    combined = doc_stats_and_positions_arrow(
        docs, normalizer=norm, forms=forms).collect()
    stats = sorted((r["doc_id"], r["lemma"], r["tf"], r["dl"])
                   for r in combined if r["pos"] is None)
    occ = sorted((r["doc_id"], r["lemma"], r["pos"])
                 for r in combined if r["pos"] is not None)

    want_stats = sorted(
        (r["doc_id"], r["lemma"], r["tf"], r["dl"])
        for r in doc_term_stats_arrow(docs, normalizer=norm,
                                      forms=forms).collect())
    if norm in ("pinned", "dict"):
        ref_pos = doc_lemma_positions(docs, normalizer=norm, forms=forms)
    else:
        ref_pos = doc_lemma_positions_stemmed(docs, "content", norm, forms)
    want_occ = sorted((r["doc_id"], r["lemma"], r["pos"])
                      for r in ref_pos.collect())
    assert stats == want_stats
    assert occ == want_occ
    # internal consistency: tf per (doc, lemma) == its occurrence count,
    # dl per doc == Σ tf (the invariant that makes the fusion sound)
    from collections import Counter

    occ_tf = Counter((d, lm) for d, lm, _ in occ)
    assert {(d, lm): tf for d, lm, tf, _ in stats} == dict(occ_tf)


def _artifact_snapshot(spark, idx):
    data = sorted(
        (r["segment"], r["lemma"], r["df"], bytes(r["postings"]),
         bytes(r["tfs"]), bytes(r["dls"]), tuple(map(tuple, r["blocks"])),
         r["bucket"])
        for r in read_index(spark, idx).collect())
    pos = sorted(
        (r["segment"], r["lemma"], r["df"], bytes(r["pdocs"]),
         bytes(r["pcounts"]), bytes(r["pstream"]), r["nbytes"], r["bucket"])
        for r in read_positions(spark, idx).collect())
    with open(f"{idx}/meta.json") as fh:
        meta = json.load(fh)
    return data, pos, meta


@pytest.mark.parametrize("norm,forms", [
    ("pinned", None),
    ("dict_porter", {"tamok": ("tamok", "tamokal"),
                     "velsor": ("velsorium",)}),
], ids=["pinned", "dict_porter"])
def test_fused_build_byte_identical(spark, tmp_path, norm, forms):
    rows = gen_corpus_local(240)
    store = str(tmp_path / "store")
    init_store(spark.createDataFrame(rows, DOCS_SCHEMA), store)
    docs = read_store(spark, store).localCheckpoint()

    two = str(tmp_path / "two_pass")
    build_index(docs, two, n_segments=3, salt=4, n_buckets=8, resume=False,
                normalizer=norm, forms=forms)
    build_positions(docs, two)
    fused = str(tmp_path / "fused")
    build_index(docs, fused, n_segments=3, salt=4, n_buckets=8, resume=False,
                normalizer=norm, forms=forms, positions=True)

    d1, p1, m1 = _artifact_snapshot(spark, two)
    d2, p2, m2 = _artifact_snapshot(spark, fused)
    assert d2 == d1
    assert p2 == p1
    assert p1  # non-vacuous: the sidecar actually has rows
    for k in ("n_docs", "avgdl", "n_segments", "seg_size", "normalizer",
              "has_positions", "pos_bytes_per_posting", "pos_posting_bytes",
              "bytes_per_posting", "posting_bytes"):
        assert m2.get(k) == m1.get(k), k
    assert m2["has_positions"] is True

    # and the artifacts actually serve: phrase results identical
    got = sorted(
        (r["doc_id"], r["phrase_tf"])
        for r in phrase_topk(spark, fused, None,
                             "tamok velsor", k=10).collect())
    want = sorted(
        (r["doc_id"], r["phrase_tf"])
        for r in phrase_topk(spark, two, None,
                             "tamok velsor", k=10).collect())
    assert got == want


def test_fused_requires_arrow(spark, tmp_path):
    from pyspark.sql import functions as F

    docs = _texts_df(spark).withColumn("sha256", F.sha2("content", 256))
    with pytest.raises(ValueError, match="arrow"):
        build_index(docs, str(tmp_path / "x"),
                    analyzer_impl="jvm", positions=True)


def test_positions_true_on_done_index_builds_sidecar(spark, tmp_path):
    """Resume short-circuit: data current, sidecar absent -> positions=True
    must still produce it (standalone pass), and a second call is a no-op
    that keeps the flag."""
    rows = gen_corpus_local(120)
    store = str(tmp_path / "store")
    init_store(spark.createDataFrame(rows, DOCS_SCHEMA), store)
    docs = read_store(spark, store).localCheckpoint()
    idx = str(tmp_path / "idx")
    build_index(docs, idx, n_segments=2, salt=4, n_buckets=8, resume=False)
    with open(f"{idx}/meta.json") as fh:
        assert not json.load(fh).get("has_positions")

    meta = build_index(docs, idx, positions=True)  # resume path
    assert meta["has_positions"] is True
    assert os.path.isdir(f"{idx}/positions/segment=0")
    assert os.path.isdir(f"{idx}/positions/segment=1")

    # idempotent: all dirs present, flag already set
    meta = build_index(docs, idx, positions=True)
    assert meta["has_positions"] is True


def test_fused_partial_rebuild_refreshes_only_touched(spark, tmp_path):
    """Drop one segment's manifest (the dirty-segment discipline) and
    resume with positions=True: only that segment re-analyzes, and the
    whole index — data AND sidecar — ends byte-identical to a fresh fused
    build."""
    rows = gen_corpus_local(240)
    store = str(tmp_path / "store")
    init_store(spark.createDataFrame(rows, DOCS_SCHEMA), store)
    docs = read_store(spark, store).localCheckpoint()

    idx = str(tmp_path / "idx")
    build_index(docs, idx, n_segments=3, salt=4, n_buckets=8, resume=False,
                positions=True)
    d0, p0, m0 = _artifact_snapshot(spark, idx)

    os.unlink(f"{idx}/manifests/segment=1.json")
    meta = build_index(docs, idx, positions=True)
    assert meta["has_positions"] is True
    d1, p1, m1 = _artifact_snapshot(spark, idx)
    assert d1 == d0
    assert p1 == p0
    assert m1["pos_posting_bytes"] == m0["pos_posting_bytes"]


def test_build_job_positions_is_fused_and_serves(spark, tmp_path,
                                                 monkeypatch, capsys):
    """jobs/build_index.py --positions under the arrow analyzer: ONE build
    call produces data + sidecar (timings carry the fused positions_s, no
    separate pass), meta flags set, and a phrase query serves from it."""
    import jobs.build_index as job

    out = str(tmp_path / "idx")
    monkeypatch.setattr("sys.argv", [
        "build_index.py", "--synthetic", "400", "--out", out,
        "--segments", "2", "--positions", "--cores", "8",
    ])
    job.main()
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_docs"] == 400
    assert stats["meta"]["has_positions"] is True
    # fused: positions_s recorded by build_index itself, alongside the
    # analyzer timing (the two-pass route would re-report it in the job)
    assert "positions_s" in stats["meta"]["timings"]
    assert os.path.isdir(f"{out}/positions/segment=0")

    got = phrase_topk(spark, out, None, "tamok velsor", k=5).collect()
    assert got  # organic adjacency of common corpus terms


def test_interrupted_sidecar_not_trusted(spark, tmp_path):
    """Crash-recovery soundness: a positions dir left by an INTERRUPTED
    write (flag off, some bucket files missing) must not be trusted —
    positions=True on current data rebuilds the whole sidecar and the
    artifacts end identical to an uncorrupted build.  Also: the flag may
    never flip on while a data-bearing segment lacks its sidecar dir."""
    import glob as _glob
    import shutil

    rows = gen_corpus_local(160)
    store = str(tmp_path / "store")
    init_store(spark.createDataFrame(rows, DOCS_SCHEMA), store)
    docs = read_store(spark, store).localCheckpoint()
    idx = str(tmp_path / "idx")
    build_index(docs, idx, n_segments=2, salt=4, n_buckets=8, resume=False,
                positions=True)
    _, p0, m0 = _artifact_snapshot(spark, idx)

    # simulate the crash: flag cleared, one segment's sidecar half-written
    with open(f"{idx}/meta.json") as fh:
        meta = json.load(fh)
    meta["has_positions"] = False
    with open(f"{idx}/meta.json", "w") as fh:
        json.dump(meta, fh)
    victims = sorted(_glob.glob(f"{idx}/positions/segment=0/bucket=*"))
    assert len(victims) > 1
    shutil.rmtree(victims[0])

    meta = build_index(docs, idx, positions=True)  # data current: recovery
    assert meta["has_positions"] is True
    _, p1, m1 = _artifact_snapshot(spark, idx)
    assert p1 == p0
    assert m1["pos_posting_bytes"] == m0["pos_posting_bytes"]

    # flag soundness: with a data-bearing segment's dir missing, the
    # bookkeeping refuses to flip the flag on
    shutil.rmtree(f"{idx}/positions/segment=1")
    from searchengine_spark.index.positions import _positions_bookkeeping

    m = _positions_bookkeeping(None, idx, [])
    assert m["has_positions"] is False
