"""Table sources and sinks (SURVEY.md §2.1).

The reference's web-crawl source (ParseHtml.java:23-77, S1) is replaced by a
table scan over the already-materialized corpus — the Iceberg-shaped
``input_hint`` table; MySQL batch sinks (S3-S5, ``saveAll``) become columnar
writes.  Point lookups (S7) and prefix scans rely on Catalyst predicate
pushdown into the parquet reader (check ``.explain`` → ``PushedFilters``).

Iceberg note: the runtime here has no Iceberg catalog jar, so
``load_docs(..., fmt='iceberg')`` attempts ``spark.read.format('iceberg')``
and falls back to parquet with the identical schema contract — the calling
code is format-agnostic either way (DataSourceV2 handles both).
"""

from __future__ import annotations

import logging
from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from ..schema import DOCS_SCHEMA

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


def load_docs(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """S1-replacement scan of the input_hint table, schema-checked."""
    if fmt == "iceberg":
        try:
            df = spark.read.format("iceberg").load(path)
        except Exception as exc:  # no catalog in sandbox — identical parquet layout
            logging.getLogger(__name__).warning(
                "iceberg read of %s failed (%s: %s); falling back to parquet "
                "with the identical schema contract", path, type(exc).__name__, exc,
            )
            df = spark.read.schema(DOCS_SCHEMA).parquet(path)
    else:
        df = spark.read.schema(DOCS_SCHEMA).parquet(path)
    missing = set(f.name for f in DOCS_SCHEMA.fields) - set(df.columns)
    if missing:
        raise ValueError(f"docs table missing columns: {sorted(missing)}")
    return df


def write_docs(docs: DataFrame, path: str, mode: str = "append") -> None:
    """S3 page sink analog (batch insert -> columnar append), partitioned by
    repo so repo-scoped scans prune files."""
    docs.select(*[f.name for f in DOCS_SCHEMA.fields]).write.mode(mode).partitionBy(
        "repo"
    ).parquet(path)


def point_lookup(docs: DataFrame, repo: str, path: str) -> DataFrame:
    """S7 findByPath analog — equality predicates pushed to the scan."""
    return docs.filter((F.col("repo") == repo) & (F.col("path") == path))


def repo_scan(docs: DataFrame, repo: str) -> DataFrame:
    """S8 findAllBySiteId analog — partition-pruned when written via
    write_docs (partitionBy repo)."""
    return docs.filter(F.col("repo") == repo)


def delete_repo(spark: SparkSession, store_path: str, repo: str) -> None:
    """S9 deleteByUrl analog: rebuild-partition delete (preferred over row
    deletes, SURVEY.md S9) — with partitionBy(repo) layout this is a
    directory drop."""
    import pathlib
    import shutil
    import urllib.parse

    # Spark escapes partition values Hive-style (e.g. '/' -> '%2F')
    target = pathlib.Path(store_path) / f"repo={urllib.parse.quote(repo, safe='')}"
    if target.exists():
        shutil.rmtree(target)
