"""Incremental re-index — the analog of ``POST /api/indexPage``.

The reference's single-page upsert (IndexingServiceImpl.java:56-84) deletes
the page's postings, decrements per-site df, and re-indexes one document
(``:229-250`` + ``:109-123``); its quirk of writing fresh ``frequency=1``
lemma rows without merging (``:143-149``) is deliberately NOT replicated
(SURVEY.md §7): this engine recomputes the affected doc-range SEGMENT
exactly — delete-and-rebuild beats in-place decrement at every scale
because a segment rebuild is one bounded, idempotent, checkpointed job.

``incremental_reindex``: invalidate the manifests of segments containing
the changed doc_ids, then resume the build — only those segments recompute
(builder filters the plan to missing segments).  The ORIGINAL corpus-level
avgdl is kept (``fixed_avgdl``): block-max upper bounds and query scores
must share one avgdl or MaxScore pruning would lose its safety proof;
a full rebuild refreshes it.

``stream_ingest``: Structured Streaming front-door — ``readStream`` over a
landing directory of doc parquet, ``foreachBatch`` merges each micro-batch
into the docs store and triggers the incremental rebuild of exactly the
touched segments.  ``availableNow`` drains the backlog and stops (batch
parity with the reference's on-demand endpoint; a continuous trigger is the
same code path).
"""

from __future__ import annotations

import json
import pathlib
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


def affected_segments(index_dir: str, changed_doc_ids: list[int]) -> list[int]:
    with open(f"{index_dir}/meta.json") as fh:
        meta = json.load(fh)
    seg_size = meta["seg_size"]
    return sorted({int(d) // seg_size for d in changed_doc_ids})


def incremental_reindex(docs_ingested: DataFrame, index_dir: str,
                        changed_doc_ids: list[int]) -> list[int]:
    """Rebuild only the segments containing ``changed_doc_ids``.

    ``docs_ingested`` is the UPDATED corpus (post-upsert).  Returns the list
    of rebuilt segments.  Assumes doc_ids are stable (deterministic rank of
    (repo, path, commit) — corpus.ingest); a changed content at the same key
    keeps its doc_id, an added/removed doc shifts ids after it, in which
    case callers pass every shifted id (or simply rebuild all — the build is
    checkpoint-resumable either way).
    """
    from ..index.builder import build_index

    with open(f"{index_dir}/meta.json") as fh:
        meta = json.load(fh)
    segs = affected_segments(index_dir, changed_doc_ids)
    for s in segs:
        p = pathlib.Path(f"{index_dir}/manifests/segment={s}.json")
        if p.exists():
            p.unlink()
    build_index(
        docs_ingested,
        index_dir,
        n_segments=meta["n_segments"],
        salt=meta["salt"],
        n_buckets=meta["n_buckets"],
        block_size=meta["block_size"],
        resume=True,
        fixed_avgdl=meta["avgdl"],
    )
    return segs


def stream_ingest(spark: SparkSession, landing_dir: str, docs_store: str,
                  index_dir: str, checkpoint_dir: str) -> None:
    """Structured-Streaming ingest: drain ``landing_dir`` (availableNow),
    merge each micro-batch into ``docs_store`` (latest commit wins), rebuild
    the touched segments."""
    from pyspark.sql import functions as F

    from ..corpus import ingest
    from ..schema import DOCS_SCHEMA

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        from pyspark.sql import Window

        s = batch_df.sparkSession
        if not batch_df.take(1):
            return
        store = pathlib.Path(docs_store)
        if store.exists():
            base = s.read.parquet(docs_store)
            w = Window.partitionBy("repo", "path").orderBy(F.desc("commit"))
            merged = (
                base.unionByName(batch_df)
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            merged = batch_df
        tmp = docs_store + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)  # cannot overwrite own input
        shutil.rmtree(docs_store, ignore_errors=True)
        shutil.move(tmp, docs_store)

        updated = ingest(s.read.parquet(docs_store))
        changed_keys = [(r["repo"], r["path"]) for r in batch_df.select("repo", "path").collect()]
        changed_ids = [
            r["doc_id"]
            for r in updated.select("repo", "path", "doc_id").collect()
            if (r["repo"], r["path"]) in set(changed_keys)
        ]
        if pathlib.Path(f"{index_dir}/meta.json").exists():
            incremental_reindex(updated, index_dir, changed_ids)
        else:
            from ..index.builder import build_index

            build_index(updated, index_dir, n_segments=2)

    (
        spark.readStream.schema(DOCS_SCHEMA)
        .parquet(landing_dir)
        .writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
