"""tf / df aggregation — the logical inverted index.

Reference semantics (SURVEY.md §2.4):

- A1 per-doc term frequency: ``LemmaFinderImpl.collectLemmas`` counts every
  emitted lemma per page (LemmaFinderImpl.java:34-47); stored as
  ``index_table.index_rank`` (IndexingServiceImpl.java:182-185).
- A2 per-site document frequency: +1 per page containing the lemma
  (IndexingServiceImpl.java:162-189) — i.e. ``count(*)`` over distinct
  (doc, lemma) pairs per repo.

Spark shape: ``explode(tokens)`` -> one hash-aggregate per level.  Partial
(map-side) aggregation makes the Zipf-skewed lemma key distribution a
non-issue for these counts: each map task pre-combines, so the shuffle
carries at most (#partitions x #distinct keys) rows, not raw postings.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def term_frequencies(docs: DataFrame, text_col: str = "content",
                     impl: str = "jvm", normalizer: str = "pinned",
                     forms: dict[str, tuple[str, ...]] | None = None,
                     ) -> DataFrame:
    """docs(repo, doc_id, content) -> tf(repo, doc_id, lemma, tf).

    ≙ reference ``index_table`` rows (model/IndexTable.java:7-30).
    One shuffle on (repo, doc_id, lemma) with map-side combine.
    """
    from ..analyzer import tokenize_arrow, tokenize_jvm

    if impl not in ("jvm", "arrow"):
        raise ValueError(f"unknown analyzer impl: {impl!r}")
    fn = tokenize_jvm if impl == "jvm" else tokenize_arrow
    toks = fn(docs, text_col=text_col, id_cols=["repo", "doc_id"],
              normalizer=normalizer, forms=forms)
    return (
        toks.groupBy("repo", "doc_id", "lemma")
        .agg(F.count("*").cast("int").alias("tf"))
    )


def doc_frequencies(tf: DataFrame) -> DataFrame:
    """tf -> lemmas(repo, lemma, df).

    ≙ reference ``lemma`` table (model/LemmaTable.java:9-34): df = number of
    docs in the repo containing the lemma.  Each tf row is a distinct
    (doc, lemma) pair, so a plain count suffices (no countDistinct —
    SURVEY.md A2).
    """
    return tf.groupBy("repo", "lemma").agg(F.count("*").alias("df"))


def global_doc_frequencies(tf: DataFrame) -> DataFrame:
    """Corpus-wide df (used by BM25 idf when scoring globally)."""
    return tf.groupBy("lemma").agg(F.count("*").alias("df"))


def doc_lengths(tf: DataFrame) -> DataFrame:
    """Per-doc lemma-stream length (BM25 ``dl``): Σ tf per doc."""
    return tf.groupBy("repo", "doc_id").agg(F.sum("tf").alias("dl"))


def build_logical_index(docs_ingested: DataFrame, impl: str = "jvm",
                        text_col: str = "content") -> tuple[DataFrame, DataFrame]:
    """Ingested docs -> (tf, lemmas).  The §7-step-2 logical index."""
    tf = term_frequencies(
        docs_ingested.select("repo", "doc_id", text_col), text_col=text_col, impl=impl
    )
    return tf, doc_frequencies(tf)
