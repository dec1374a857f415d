"""Text-analysis column functions for training-data pipelines.

Scale extensions over the ``documents`` table (no reference analog beyond
the C1-C3 tokenize shape): token counting, quality scoring, stopword-based
language ID, content fingerprinting.  Pure Catalyst expressions — these run
inside whole-stage codegen at 100 TB with zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Pinned English stopword probe set for the lang-id heuristic (mirrored
# verbatim in the DuckDB oracle SQL).
EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def tokens_col(text_col: Column) -> Column:
    """Whitespace tokens, empties removed."""
    return F.filter(F.split(text_col, r"\s+"), lambda t: t != "")


def token_count(text_col: Column) -> Column:
    return F.size(tokens_col(text_col)).cast("long")


# BPE-ish pre-tokenizer split (GPT-2 family), restricted to the regex
# subset Java regex and RE2 evaluate identically (no lookahead — RE2 has
# none): contraction suffixes, space-prefixed letter runs, digit runs,
# punctuation runs, residual whitespace.  A real BPE vocab merge would run
# on top of these pieces; the PIECE COUNT is the cheap token estimator a
# training pipeline budgets with.
BPE_SPLIT_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count_bpe(text_col: Column) -> Column:
    """BPE-ish token count: number of pre-tokenizer pieces under
    :data:`BPE_SPLIT_RE` — single codegen'd regexp pass, zero Python."""
    return F.size(F.regexp_extract_all(text_col, F.lit(BPE_SPLIT_RE), F.lit(0))).cast("long")


def _nt1(text_col: Column) -> Column:
    """Token count clamped to >=1: zero-token docs (empty content) must
    yield a ratio, not an ANSI DIVIDE_BY_ZERO — they are dropped by the
    pipeline's token gate anyway.  Mirrored in every oracle SQL twin."""
    return F.greatest(token_count(text_col), F.lit(1))


def chars_per_token(text_col: Column) -> Column:
    return F.round(F.length(text_col).cast("double") / _nt1(text_col), 4)


def stopword_ratio(text_col: Column, stops: tuple[str, ...] = EN_STOPWORDS) -> Column:
    stop_arr = F.array(*[F.lit(s) for s in stops])
    n_stop = F.size(F.filter(tokens_col(text_col), lambda t: F.array_contains(stop_arr, t)))
    return F.round(n_stop.cast("double") / _nt1(text_col), 4)


def punct_ratio(text_col: Column) -> Column:
    stripped = F.regexp_replace(text_col, r"[\p{Punct}]", "")
    return F.round(
        (F.length(text_col) - F.length(stripped)).cast("double")
        / F.greatest(F.length(text_col), F.lit(1)),
        4,
    )


def quality_score(text_col: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, low punct noise,
    plausible word lengths.  Weights pinned (mirrored in the oracle SQL)."""
    len_ok = F.least(F.length(text_col).cast("double") / 200.0, F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text_col) * 5.0, F.lit(1.0))
    cpt = F.length(text_col).cast("double") / _nt1(text_col)
    word_ok = F.when((cpt >= 3.0) & (cpt <= 12.0), 1.0).otherwise(0.5)
    return F.round(0.4 * len_ok + 0.3 * punct_ok + 0.3 * word_ok, 4)


def lang_id_en(text_col: Column, threshold: float = 0.04) -> Column:
    """'en' if the English stopword ratio clears the threshold else 'other'
    — the n-gram-free heuristic (real models plug in as pandas UDFs)."""
    return F.when(stopword_ratio(text_col) >= threshold, F.lit("en")).otherwise(
        F.lit("other")
    )


def fingerprint(text_col: Column) -> Column:
    """Deterministic content fingerprint: md5 of lowercased
    whitespace-normalized text (md5 matches across Spark and DuckDB)."""
    return F.md5(F.regexp_replace(F.lower(text_col), r"\s+", " "))


def word_ngrams(text_col: Column, n: int = 3) -> Column:
    """Array of word ``n``-grams (space-joined) over the whitespace tokens;
    empty array when the doc has fewer than ``n`` tokens.  The CASE guard
    matters: ``sequence(1, count)`` DESCENDS when count < 1."""
    toks = tokens_col(text_col)
    count = F.size(toks) - (n - 1)
    return F.when(
        count >= 1,
        F.transform(F.sequence(F.lit(1), count),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def repetition_ratio(text_col: Column, n: int = 3) -> Column:
    """Fraction of DUPLICATED word n-grams within the doc
    (1 - distinct/total; 0 for docs shorter than ``n`` tokens) — the
    classic training-data repetition filter (boilerplate banners, looped
    generations score high).  Pure Catalyst; the n-gram materialization is
    per-row and map-side, nothing wide ever shuffles."""
    grams = word_ngrams(text_col, n)
    total = F.size(grams)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(grams)).cast("double") / total,
            4,
        )
    )


# Email/URL detection + masking: the redaction step of a cleaning pipeline.
# Both patterns use the regex subset Java and RE2 (DuckDB) evaluate
# identically — no lookahead, no backreferences.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"


def email_count(text_col: Column) -> Column:
    return F.size(F.regexp_extract_all(text_col, F.lit(EMAIL_RE), F.lit(0))).cast("long")


def url_count(text_col: Column) -> Column:
    return F.size(F.regexp_extract_all(text_col, F.lit(URL_RE), F.lit(0))).cast("long")


def mask_pii(text_col: Column) -> Column:
    """Replace every email with ``<EMAIL>`` and every URL with ``<URL>``
    (URLs FIRST — pinned order, so an email inside a URL's query string
    disappears as part of the ``<URL>`` mask rather than splitting it)."""
    return F.regexp_replace(
        F.regexp_replace(text_col, URL_RE, "<URL>"), EMAIL_RE, "<EMAIL>")
