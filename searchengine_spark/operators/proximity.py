"""F11 proximity predicate — exact port of the reference rule.

SearchServiceImpl.java:231-264: a candidate page survives iff

- every raw query word (``query.toLowerCase().split("\\s+")``) occurs as a
  substring of the lowercased page text (``:248-253``), and
- after sorting the first-occurrence positions, every consecutive gap obeys
  ``sorted_pos[i+1] - sorted_pos[i] <= maxDistance + len(words[i])``
  (``:257-261``) — note the reference pairs the *i-th sorted position* with
  the *i-th original query word's* length; that quirk is replicated verbatim
  (the oracle pins it).

Jsoup ``.text()`` is identity for source-code content (SURVEY.md C6).

Spark shape: join content to the candidates and evaluate the predicate as
ONE vectorized pandas UDF — per-word ``Series.str.find`` + a numpy
sort/diff, no per-row Python.  The candidate side is deliberately NOT
force-broadcast: for common query terms the post-AND candidate set is
unbounded (not <=k), so the join strategy is left to AQE — only the final
<=limit page join in operators/search.py broadcasts.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def proximity_ok_series(content: pd.Series, words: list[str], max_distance: int) -> pd.Series:
    """Vectorized reference predicate over a batch of page texts."""
    import numpy as np

    text = content.fillna("").str.lower()
    if not words:
        return pd.Series(True, index=content.index)
    pos = np.column_stack([text.str.find(w).to_numpy() for w in words])
    found = (pos >= 0).all(axis=1)
    if len(words) == 1:
        return pd.Series(found, index=content.index)
    spos = np.sort(pos, axis=1)
    gaps = np.diff(spos, axis=1)  # gaps[:, i] = spos[i+1] - spos[i]
    allow = np.array([max_distance + len(words[i]) for i in range(len(words) - 1)])
    ok = (gaps <= allow).all(axis=1)
    return pd.Series(found & ok, index=content.index)


def proximity_filter(cand: DataFrame, docs: DataFrame, query: str,
                     max_distance: int = 5) -> DataFrame:
    """Filter (repo, doc_id, ...) candidates by the proximity rule."""
    words = [w for w in query.lower().split() if w]
    if not words:
        return cand

    @pandas_udf("boolean")
    def _ok(content: pd.Series) -> pd.Series:
        return proximity_ok_series(content, words, max_distance)

    with_content = docs.select("repo", "doc_id", "content").join(
        cand, ["repo", "doc_id"]
    )
    return with_content.filter(_ok(F.col("content"))).drop("content")
