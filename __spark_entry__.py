"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship conjunctive-search query at
sf0.001; ``queries()``/``oracle_sql()`` expose one entry per implemented
operator family from SURVEY.md §2 (plus the training-data dedup/ANN/text
extensions), each paired with DuckDB oracle SQL where SQL-expressible.
Implementations live in ``searchengine_spark.gate``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from searchengine_spark.gate import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["search_sumtf"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for EVERY query in ``queries()``.

    The sketch operators use a portable md5-based universal hash family and
    literal LSH hyperplanes so DuckDB runs the identical pipelines
    value-for-value; the hourly window is compared in epoch microseconds.
    """
    return dict(ORACLE)
