"""The query path: dictionary lookup -> conjunctive AND -> score -> paginate.

Pins the reference read path (SURVEY.md §3.1, SearchServiceImpl.java):

1. query analysis reuses the build analyzer (``:51-52``);
2. dictionary lookup keeps per-repo lemma rows with df < threshold
   (``:34``, ``:217-220``; LemmaRepository.java:17) — note one query term can
   match several per-repo rows, and the threshold applies per repo;
3. conjunctive retrieval is per-repo: a doc matches iff it contains EVERY
   query lemma that survives (2) *on its own repo* (``:98-143``,
   filterLemmasForSite ``:145-149``);
4. optional proximity filter over raw query words (``:231-264``);
5. absolute score = Σ tf over the surviving lemmas (``:152-163``), normalized
   by the max over candidates and rounded to 4 dp HALF_UP (``:171-185``);
6. sort desc by score (tie-break doc_id asc — pinned; the reference's tie
   order is storage-accidental, SURVEY.md O2), clamp offset/limit, slice
   (``:62-73``).

Spark shape: the query side is tiny -> broadcast joins everywhere; the only
wide operations are the hash aggregate over matching postings and the final
top-k (TakeOrderedAndProject).  `content` is touched ONLY by the proximity /
snippet stages, joined back for candidates / the final page respectively —
it never enters the scoring shuffle.

BM25 (axis-B capability, BASELINE.json north_star): same retrieval, score =
Σ idf(t) · tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)) with idf = ln(1+(N-df+0.5)/
(df+0.5)).  The degenerate mode (k1→∞, b=0, idf≡1) is exactly Σtf, the
reference's ranking — asserted in tests.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from ..analyzer import analyze

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

FREQUENCY_THRESHOLD = 200  # SearchServiceImpl.java:34
MAX_DISTANCE_BETWEEN_WORDS = 5  # SearchServiceImpl.java:35
DEFAULT_LIMIT = 20  # ApiController.java:71-72


def query_lemmas(query: str) -> list[str]:
    """Distinct analyzed lemmas of the query (counts unused downstream —
    SearchServiceImpl.java:218 uses only the key set)."""
    return sorted(set(analyze(query)))


def matched_lemmas(spark: SparkSession, lemmas: DataFrame, qlemmas: list[str],
                   threshold: int = FREQUENCY_THRESHOLD,
                   repo: str | None = None) -> DataFrame:
    """J1 + F6: per-repo dictionary rows for the query terms with df below
    the stop-term threshold.  Broadcast semi-join shape: the query side is a
    handful of literals, so this compiles to an ``IN`` filter pushed into the
    dictionary scan."""
    m = lemmas.filter(F.col("lemma").isin(qlemmas)).filter(F.col("df") < threshold)
    if repo is not None:
        m = m.filter(F.col("repo") == repo)
    return m


def conjunctive_candidates(tf: DataFrame, matched: DataFrame) -> DataFrame:
    """J4a: per-repo conjunctive AND via count-equality hash aggregate.

    A doc qualifies iff it matches ALL surviving lemmas of its repo
    (findPagesForLemmasOnSite, SearchServiceImpl.java:122-143).  Returns
    (repo, doc_id, abs_score) where abs_score = Σ tf (A3, ``:156-163``).

    The reference's rarest-first early-exit loop (O1) is an optimization of
    this same semantics; the physical WAND path (index/wand.py) is where we
    keep that idea — for the DataFrame path the hash-agg formulation lets
    Catalyst do partial aggregation instead.
    """
    n_req = matched.groupBy("repo").agg(F.countDistinct("lemma").alias("_n_req"))
    return (
        tf.join(F.broadcast(matched.select("repo", "lemma")), ["repo", "lemma"])
        .groupBy("repo", "doc_id")
        .agg(F.count("*").alias("_n_match"), F.sum("tf").alias("abs_score"))
        .join(F.broadcast(n_req), "repo")
        .filter(F.col("_n_match") == F.col("_n_req"))
        .select("repo", "doc_id", "abs_score")
    )


def normalize_scores(cand: DataFrame) -> DataFrame:
    """A4 + C10: relative score = abs/max, 4 dp HALF_UP
    (SearchServiceImpl.java:171-185; Spark ``round`` is HALF_UP)."""
    mx = cand.agg(F.max("abs_score").alias("_mx"))
    return (
        cand.crossJoin(F.broadcast(mx))
        .withColumn("score", F.round(F.col("abs_score") / F.col("_mx"), 4))
        .drop("_mx")
    )


def bm25_scores(cand_tf: DataFrame, dfs: DataFrame, dls: DataFrame, n_docs: int,
                k1: float = 1.2, b: float = 0.75, idf: str = "lucene") -> DataFrame:
    """BM25 over matching (repo, doc_id, lemma, tf) rows.

    ``dfs``: (lemma, df) in the chosen scope; ``dls``: (repo, doc_id, dl).
    avgdl = Σdl / n_docs over the WHOLE corpus (docs with zero lemmas count).
    ``idf='one'`` is the degenerate parity mode (with k1→∞, b=0 the score
    reduces to Σtf, the reference's ranking).  All arithmetic is JVM-side
    column math inside one whole-stage-codegen aggregate.
    """
    avgdl = dls.agg((F.sum("dl") / F.lit(float(n_docs))).alias("_avgdl"))
    if idf == "one":
        idf_col = F.lit(1.0)
    else:
        idf_col = F.log(
            F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
    denom = F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl"))
    term_score = idf_col * (F.col("tf") * F.lit(k1 + 1.0)) / denom
    return (
        cand_tf.join(F.broadcast(dfs), "lemma")
        .join(dls, ["repo", "doc_id"])
        .crossJoin(F.broadcast(avgdl))
        .withColumn("_ts", term_score)
        .groupBy("repo", "doc_id")
        .agg(F.sum("_ts").alias("abs_score"))
    )


def paginate(scored: DataFrame, offset: int = 0, limit: int = DEFAULT_LIMIT) -> DataFrame:
    """O2 + O3: desc score, doc_id asc tie-break, clamped offset/limit
    (SearchServiceImpl.java:62-73).  offset=0 compiles to
    TakeOrderedAndProject (global top-k without a full sort)."""
    offset = max(offset, 0)
    limit = max(limit, 1)
    out = scored.orderBy(F.desc("score"), F.asc("doc_id"))
    if offset:
        out = out.offset(offset)
    return out.limit(limit)


def search(
    spark: SparkSession,
    docs: DataFrame,
    tf: DataFrame,
    lemmas: DataFrame,
    query: str,
    repo: str | None = None,
    offset: int = 0,
    limit: int = DEFAULT_LIMIT,
    threshold: int = FREQUENCY_THRESHOLD,
    proximity: bool = True,
    snippets: bool = True,
    scoring: str = "reference",
    k1: float = 1.2,
    b: float = 0.75,
    idf: str = "lucene",
) -> tuple[DataFrame, int]:
    """Full read path; returns (result page DataFrame, total_count).

    Result schema mirrors the reference search DTO (dto/search/Data.java):
    (doc_id, repo, path, title, snippet, score).
    """
    from .proximity import proximity_filter
    from .snippet import with_snippet_and_title

    qlem = query_lemmas(query)
    empty = spark.createDataFrame(
        [], "doc_id long, repo string, path string, title string, snippet string, score double"
    )
    if not qlem:
        return empty, 0

    m = matched_lemmas(spark, lemmas, qlem, threshold, repo)
    cand = conjunctive_candidates(tf, m)

    if proximity:
        cand = proximity_filter(cand, docs, query, MAX_DISTANCE_BETWEEN_WORDS)

    if scoring == "bm25":
        cand_tf = tf.join(F.broadcast(m.select("repo", "lemma")), ["repo", "lemma"]).join(
            cand.select("repo", "doc_id"), ["repo", "doc_id"]
        )
        scope_docs = docs.filter(F.col("repo") == repo) if repo else docs
        n_docs = scope_docs.count()
        dfs = (
            lemmas.filter(F.col("repo") == repo).select("lemma", "df")
            if repo
            else tf.groupBy("lemma").agg(F.count("*").alias("df"))
        )
        dls = tf.groupBy("repo", "doc_id").agg(F.sum("tf").alias("dl"))
        scored = bm25_scores(cand_tf, dfs, dls, n_docs, k1, b, idf)
        scored = scored.withColumn("score", F.col("abs_score"))
    else:
        scored = normalize_scores(cand)

    # total_count before pagination (SearchServiceImpl.java:65,94).  This is
    # one extra action over the (small) candidate set; the page itself stays
    # a single TakeOrderedAndProject job.
    scored = scored.cache()
    total = scored.count()
    if total == 0:
        return empty, 0

    page = paginate(scored.select("repo", "doc_id", "score"), offset, limit)

    # join content back ONLY for the final <=limit rows (broadcast the page)
    enriched = docs.select("repo", "doc_id", "path", "content").join(
        F.broadcast(page), ["repo", "doc_id"]
    )
    if snippets:
        enriched = with_snippet_and_title(enriched, query)
    else:
        enriched = enriched.withColumn("snippet", F.lit(None).cast("string")).withColumn(
            "title", F.element_at(F.split(F.col("path"), "/"), -1)
        )
    out = enriched.select("doc_id", "repo", "path", "title", "snippet", "score").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return out, total
