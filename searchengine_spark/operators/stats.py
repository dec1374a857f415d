"""Statistics — ≙ GET /api/statistics (StatisticsServiceImpl.java:26-58).

Per-repo page and distinct-lemma counts (``:39-40``, PageRepository.java:15,
LemmaRepository.java:15) plus running totals (``:46-47``) and the repo count
(``:32``).  The reference's hard-coded ``indexing=true`` flag
(StatisticsServiceImpl.java:31) is NOT replicated (SURVEY.md §7 quirk list).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def per_repo_stats(docs: DataFrame, lemmas: DataFrame) -> DataFrame:
    """(repo, pages, lemmas) — A6 + A7.  Two map-side-combined counts and a
    small equi-join on repo (at most thousands of repos -> broadcast-able)."""
    pages = docs.groupBy("repo").agg(F.count("*").alias("pages"))
    lem = lemmas.groupBy("repo").agg(F.count("*").alias("lemmas"))
    return pages.join(lem, "repo", "left").fillna(0, subset=["lemmas"])


def totals(stats: DataFrame) -> DataFrame:
    """(sites, pages, lemmas) — A8 (TotalStatistics analog)."""
    return stats.agg(
        F.count("*").alias("sites"),
        F.sum("pages").alias("pages"),
        F.sum("lemmas").alias("lemmas"),
    )
