"""C7 title + C8 snippet — exact port of the reference result materialization.

SearchServiceImpl.java:190-215 (snippet): first case-insensitive match of the
alternation of ``Pattern.quote``-d raw query words over the page text; window
``[pos-100, pos+100]`` clamped to the text, ``"..."`` appended, then every
match wrapped in ``<b>…</b>``.  If nothing matches, ``pos = -1`` and the
window degenerates to ``[0, min(99, len))`` — replicated verbatim.

SearchServiceImpl.java:226-229 (title): ``Jsoup.parse(html).title()``; the
code-payload analog is the basename of ``path`` (SURVEY.md C7), computed
JVM-side.

Runs only over the final <= limit rows; the find/highlight steps are
pandas-vectorized (the alternation's first match equals the min over
per-word literal first positions because the words are regex-quoted).
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

SNIPPET_RADIUS = 100  # chars either side (SearchServiceImpl.java:207-208)


def snippet_series(content: pd.Series, query: str) -> pd.Series:
    """Vectorized snippet generation for a batch of page texts."""
    import numpy as np

    words = [w for w in query.split() if w]
    text = content.fillna("")
    if not words:
        return text.str.slice(0, SNIPPET_RADIUS - 1) + "..."
    lower = text.str.lower()
    pos_cols = np.column_stack([lower.str.find(w.lower()).to_numpy() for w in words])
    masked = np.where(pos_cols < 0, np.iinfo(np.int64).max, pos_cols)
    first = masked.min(axis=1)
    first = np.where(first == np.iinfo(np.int64).max, -1, first)

    lens = text.str.len().to_numpy()
    start = np.maximum(first - SNIPPET_RADIUS, 0)
    end = np.minimum(first + SNIPPET_RADIUS, lens)

    # per-row slice (bounded by page limit, <= ~100 rows)
    vals = text.to_numpy()
    sliced = [vals[i][start[i]:end[i]] + "..." for i in range(len(vals))]
    out = pd.Series(sliced, index=content.index)

    pat = "(?i)(" + "|".join(re.escape(w) for w in words) + ")"
    return out.str.replace(pat, r"<b>\1</b>", regex=True)


def with_snippet_and_title(enriched: DataFrame, query: str) -> DataFrame:
    """Add ``snippet`` (pandas UDF) and ``title`` (JVM basename) columns."""

    @pandas_udf("string")
    def _snip(content: pd.Series) -> pd.Series:
        return snippet_series(content, query)

    return enriched.withColumn("snippet", _snip(F.col("content"))).withColumn(
        "title", F.element_at(F.split(F.col("path"), "/"), -1)
    )
