"""The pinned analyzer: tokenize -> normalize -> stop-filter.

Reference semantics (SURVEY.md §2.8, C1-C5): the reference lemmatizer
(``services/morphology/LemmaFinderImpl.java:34-75``) lowercases (C1, :35,38),
strips a punctuation class to spaces (C2, regex at :21), splits on whitespace
(C3, :38), expands each surviving token to >=1 "normal forms" all of which are
counted (C4, :40-44 — one surface token may emit multiple lemmas), and drops
service words (C5, :62-75 — stop tags or short morph info).

The reference's analyzer is a Russian-only Lucene artifact
(``LemmaFinderImpl.java:27``) that drops every non-Cyrillic token — useless for
a source-code corpus — so per FIXTURES.md §6 the analyzer *shape* is pinned
here (shared verbatim by the pure-Python oracle in ``tests/oracle.py``):

1. identifier split: camelCase boundaries -> space (snake_case splits anyway
   because ``_`` is in the punct class);
2. lowercase;
3. strip ``[\\p{Punct}0-9№©◄«»—…]`` -> space (the reference's class verbatim,
   ``LemmaFinderImpl.java:21``);
4. split on ``\\s+``;
5. drop token if ``len(token) <= 3`` (C5 analog of the short-morph-info rule,
   ``LemmaFinderImpl.java:70``) or token in the pinned stop-set (C5 stop-tag
   rule, ``:64-69``);
6. normal forms: pinned exception table (else identity), every form counted
   (C4 multi-lemma rule, ``LemmaFinderImpl.java:40-44``).

Any change here invalidates all golden fixtures.

Two executions of the SAME pinned definition:

- ``tokenize_jvm``    pure Catalyst expressions (regexp_replace / split /
  explode / broadcast-join for the exception table).  Whole-stage codegen,
  zero Python in the hot path.  This is the default build path.
- ``tokenize_arrow``  ``mapInPandas`` over Arrow batches, vectorized pandas
  string ops (no per-row Python).  The shape mandated by BASELINE.json
  ``input_hint``; also the extension point where a real morphology /
  tree-sitter analyzer would plug in.

``tests/test_analyzer.py`` asserts the two agree row-for-row.

MAINTENANCE: the per-batch tokenize preamble (steps 1-5 + expansion) is
additionally materialized in three fused Arrow kernels whose value each
parity test pins back to this definition — ``doc_term_stats_arrow`` /
``doc_term_stats_pandas`` (below), ``index/positions.py``
``_positions_kernel`` and ``doc_stats_and_positions_arrow``.  A change to
the pinned shape must land in ALL of them; the agreement tests
(test_analyzer.py, test_phrase_positions.py, test_fused_build.py) fail on
any drift.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterator
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    import pandas as pd
    from pyspark.sql import DataFrame

# --- pinned definition ------------------------------------------------------

# camelCase boundaries (applied before lowercasing)
_CAMEL_1 = ("([a-z0-9])([A-Z])", "$1 $2")  # fooBar -> foo Bar
_CAMEL_2 = ("([A-Z]+)([A-Z][a-z])", "$1 $2")  # HTTPServer -> HTTP Server

# The reference's strip class (LemmaFinderImpl.java:21) verbatim.  Java regex
# (JVM path) can use \p{Punct}; the Python mirror expands it to the ASCII
# punctuation block explicitly so both engines strip identical characters.
_STRIP_JAVA = r"[\p{Punct}0-9№©◄«»—…]"
_STRIP_PY = r"[!-/:-@\[-`{-~0-9№©◄«»—…]"

MIN_TOKEN_LEN = 4  # tokens of length <= 3 are dropped (C5 analog)

# Pinned stop-set: English service words (>=4 chars; shorter ones die on the
# length rule) + source-code keywords per the fixture langs {py,java,js,md}.
STOP_WORDS: frozenset[str] = frozenset(
    {
        # english service words
        "the", "and", "for", "with", "this", "that", "from", "are", "was",
        "were", "has", "have", "had", "not", "but", "you", "all", "can",
        "will", "into", "then", "than", "when", "where", "which", "while",
        "your", "their", "there", "what", "been", "being", "over", "under",
        # code keywords (py / java / js)
        "def", "return", "import", "class", "public", "private", "protected",
        "static", "void", "function", "const", "else", "elif", "true",
        "false", "null", "none", "self", "super", "new", "try", "except",
        "catch", "finally", "throw", "throws", "raise", "lambda", "yield",
        "async", "await", "break", "continue", "pass", "global", "nonlocal",
        "interface", "extends", "implements", "package", "final", "abstract",
        "boolean", "double", "float", "long", "short", "byte", "char",
    }
)

# Pinned normal-forms exception table (C4): token -> tuple of lemmas, each
# counted.  Everything not listed maps to itself.
NORMAL_FORMS: dict[str, tuple[str, ...]] = {
    "норма": ("норма", "нормаль"),   # the FIXTURES.md multi-lemma marker
    "geese": ("goose", "geese"),     # an ASCII multi-lemma case for tests
}

# --- optional normalizer: 'stem' (suffix stemmer) ---------------------------
# A REAL normalizer exercising the pluggable analyzer slot (the slot the
# reference fills with RussianLuceneMorphology, LemmaFinderImpl.java:49-60)
# WITHOUT touching the pinned default — golden fixtures stay valid.  With
# ``normalizer='stem'`` the exception-table stage is replaced by a
# deterministic porter-lite suffix stripper; the pure-Python, Catalyst and
# pandas executions below are asserted equal in tests/test_analyzer.py.
#
# Rules (first match wins; a rule only fires if the guard holds):
#   1. -sses -> -ss
#   2. -ies  -> -y
#   3. -ing  -> ''   if len(token) >= 6
#   4. -ed   -> ''   if len(token) >= 5
#   5. -s    -> ''   unless token ends in -ss or -us
#   6. otherwise unchanged


def stem_token(tok: str) -> str:
    if tok.endswith("sses"):
        return tok[:-2]
    if tok.endswith("ies"):
        return tok[:-3] + "y"
    if tok.endswith("ing") and len(tok) >= 6:
        return tok[:-3]
    if tok.endswith("ed") and len(tok) >= 5:
        return tok[:-2]
    if tok.endswith("s") and not tok.endswith("ss") and not tok.endswith("us"):
        return tok[:-1]
    return tok


def stem_col(tok_col):
    """Catalyst twin of :func:`stem_token` (whole-stage codegen, first
    match wins via the when-chain)."""
    from pyspark.sql import functions as F

    c = tok_col
    drop = lambda n: c.substr(F.lit(1), F.length(c) - n)  # noqa: E731
    return (
        F.when(c.endswith("sses"), F.concat(drop(4), F.lit("ss")))
        .when(c.endswith("ies"), F.concat(drop(3), F.lit("y")))
        .when(c.endswith("ing") & (F.length(c) >= 6), drop(3))
        .when(c.endswith("ed") & (F.length(c) >= 5), drop(2))
        .when(c.endswith("s") & ~c.endswith("ss") & ~c.endswith("us"), drop(1))
        .otherwise(c)
    )


def stem_series(s):
    """Vectorized pandas twin of :func:`stem_token`."""
    import numpy as np

    ln = s.str.len()
    conds = [
        s.str.endswith("sses"),
        s.str.endswith("ies"),
        s.str.endswith("ing") & (ln >= 6),
        s.str.endswith("ed") & (ln >= 5),
        s.str.endswith("s") & ~s.str.endswith("ss") & ~s.str.endswith("us"),
    ]
    outs = [
        s.str[:-2],
        s.str[:-3] + "y",
        s.str[:-3],
        s.str[:-2],
        s.str[:-1],
    ]
    return s.where(~np.logical_or.reduce(conds), np.select(conds, outs, default=s))

# --- pure-Python core (shared with tests/oracle.py) -------------------------

_camel1_re = re.compile(_CAMEL_1[0])
_camel2_re = re.compile(_CAMEL_2[0])
_strip_re = re.compile(_STRIP_PY)


def analyze(text: str, normalizer: str = "pinned",
            forms: dict[str, tuple[str, ...]] | None = None) -> list[str]:
    """text -> lemma stream (with repetition).  ``normalizer='pinned'`` is
    the fixture contract (exception table); ``'stem'`` swaps in the suffix
    stemmer (the pluggable-slot exercise); ``'porter'`` the full five-step
    Porter stemmer (functions/porter.py — the slot's complete English
    normalizer); ``'dict'`` a DICTIONARY morphology: ``forms`` maps a
    surface token to its tuple of normal forms, EVERY form counted — the
    reference's RussianLuceneMorphology shape
    (LemmaFinderImpl.java:40-44/49-60), where one inflected token may emit
    several lemmas.  The pinned exception table is exactly this mechanism
    with a 2-entry dictionary; 'dict' opens the slot to an arbitrary-size
    one without touching the golden fixtures."""
    return [f for fs in analyze_positions(text, normalizer, forms)
            for f in fs]


def analyze_positions(text: str, normalizer: str = "pinned",
                      forms: dict[str, tuple[str, ...]] | None = None,
                      ) -> list[tuple[str, ...]]:
    """Positional variant of :func:`analyze`: one entry per SURVIVING source
    token, holding the tuple of its normal forms.  Where :func:`analyze`
    flattens a multi-lemma token into several stream entries (each counted
    for tf — the indexing contract), phrase matching needs them at ONE
    position: "норма tamok" must match the source "норма tamok" even though
    the flat stream is [норма, нормаль, tamok].  This function IS the single
    pinned pipeline — :func:`analyze` is exactly its flattening, so the two
    views cannot drift apart (the parity contract has one implementation)."""
    if not text:
        return []
    s = _camel1_re.sub(r"\1 \2", text)
    s = _camel2_re.sub(r"\1 \2", s)
    s = _strip_re.sub(" ", s.lower())
    norm = None
    fallback = None
    table = NORMAL_FORMS
    if normalizer == "porter":
        from .functions.porter import porter_stem

        norm = porter_stem
    elif normalizer == "stem":
        norm = stem_token
    elif normalizer == "dict":
        if forms is None:
            raise ValueError("normalizer='dict' needs a forms mapping")
        table = forms
    elif normalizer == "dict_porter":
        # the LAYERED full English normalizer (the reference's own shape:
        # a dictionary morphology layered over the tokenizer) — the
        # dictionary answers irregular/ambiguous forms with ALL their
        # lemmas, and every token it does not know falls through to the
        # Porter stemmer for the regular -s/-ed/-ing inflections
        from .functions.porter import porter_stem

        table = dict_porter_table(forms)
        fallback = porter_stem
    out: list[tuple[str, ...]] = []
    for tok in s.split():
        if len(tok) < MIN_TOKEN_LEN or tok in STOP_WORDS:
            continue
        if norm is not None:
            out.append((norm(tok),))
        elif fallback is not None:
            hit = table.get(tok)
            out.append(hit if hit is not None else (fallback(tok),))
        else:
            out.append(tuple(table.get(tok, (tok,))))
    return out


def collect_lemmas(text: str) -> dict[str, int]:
    """Per-document lemma -> count map (LemmaFinderImpl.collectLemmas analog,
    LemmaFinderImpl.java:34-47)."""
    return dict(Counter(analyze(text)))


def dict_porter_table(forms: dict[str, tuple[str, ...]] | None,
                      ) -> dict[str, tuple[str, ...]]:
    """The dictionary as the LAYERED normalizer consumes it: every output
    lemma projected into porter space (stemmed, deduped, sorted).  Under
    'dict_porter' raw tokens are stemmed, so dictionary outputs must live
    in the same lemma space or they can never meet — left -> ('leave',
    'left') raw would sit beside a surface 'leave' that porters to
    'leav' and the flagship irregular pairing would return zero hits.
    Tuples are rebuilt here, so values are hashable regardless of what
    the caller loaded from JSON."""
    from .functions.porter import porter_stem

    if forms is None:
        raise ValueError("normalizer='dict_porter' needs a forms mapping")
    return {k: tuple(sorted({porter_stem(f) for f in v}))
            for k, v in forms.items()}


def stem_vocab_map(tokens_df: DataFrame, series) -> DataFrame:
    """(token) DF -> (token, lemma) mapping via ONE vectorized pass over
    the DISTINCT vocabulary (mapInPandas) — the shared O(vocabulary)
    normalization-join building block for every stemmer execution path."""

    def _stem_vocab(it):
        for pdf in it:
            pdf["lemma"] = series(pdf["token"])
            yield pdf

    return tokens_df.select("token").distinct().mapInPandas(
        _stem_vocab, schema="token string, lemma string")


def _forms_table(normalizer: str,
                 forms: dict[str, tuple[str, ...]] | None,
                 ) -> dict[str, tuple[str, ...]]:
    """Resolve the normal-forms table for a TABLE-DRIVEN normalizer:
    'pinned' -> the fixture exception table, 'dict' -> the caller's
    dictionary.  The stemmer normalizers ('stem'/'porter') are not
    table-driven and are rejected here — the fused map-side analyzer
    stages support exactly the table mechanism (the reference's
    LemmaFinderImpl shape)."""
    if normalizer == "pinned":
        return NORMAL_FORMS
    if normalizer == "dict":
        if forms is None:
            raise ValueError("normalizer='dict' needs a forms mapping")
        return forms
    raise ValueError(
        f"table-driven analyzer stage supports normalizer in "
        f"('pinned', 'dict'), got {normalizer!r}")


# --- JVM path (default): pure Catalyst expressions --------------------------


def _jvm_token_col(text_col):
    """Column expr: text -> array<string> of raw tokens (pre normal-forms)."""
    from pyspark.sql import functions as F

    c = F.regexp_replace(text_col, _CAMEL_1[0], _CAMEL_1[1])
    c = F.regexp_replace(c, _CAMEL_2[0], _CAMEL_2[1])
    c = F.regexp_replace(F.lower(c), _STRIP_JAVA, " ")
    return F.split(F.trim(c), r"\s+")


def tokenize_jvm(docs: DataFrame, text_col: str = "content",
                 id_cols: str | list[str] = "doc_id",
                 normalizer: str = "pinned",
                 forms: dict[str, tuple[str, ...]] | None = None) -> DataFrame:
    """(ids..., text) -> (ids..., lemma) one row per lemma occurrence.

    Entirely whole-stage-codegen: regexp_replace/lower/split/explode, a
    length/stop filter, and a broadcast left join against the (tiny) pinned
    exception table for multi-lemma expansion.  At 100 TB this is the path
    that matters: no Python, no Arrow transfer, content column never
    shuffled (explode happens map-side before any exchange).
    """
    from pyspark.sql import functions as F

    ids = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    spark = docs.sparkSession
    stop_arr = F.array(*[F.lit(w) for w in sorted(STOP_WORDS)])

    toks = (
        docs.select(*ids, F.explode(_jvm_token_col(F.col(text_col))).alias("token"))
        .filter(F.length("token") >= MIN_TOKEN_LEN)
        .filter(~F.array_contains(stop_arr, F.col("token")))
    )
    if normalizer == "stem":
        return toks.select(*ids, stem_col(F.col("token")).alias("lemma"))
    if normalizer == "dict_porter":
        # layered: ONE combined vocabulary mapping — the broadcast
        # dictionary answers its tokens with ALL forms (projected into
        # porter space, one lemma space for both layers), and every
        # DISTINCT token the dictionary does not know is porter-stemmed
        # once (anti-join against the dict keys, then the shared
        # O(vocabulary) mapInPandas) and unioned in as a 1-form entry.
        # The token stream then takes a SINGLE FORCED-BROADCAST join +
        # explode against that mapping — O(dictionary) broadcast +
        # O(unknown vocabulary) python, never O(corpus) python, and
        # (unlike the first cut of this path) no O(corpus tokens)
        # localCheckpoint of the joined stream: the only re-run of the
        # tokenizer is the narrow distinct pass, the same cost the plain
        # 'porter' path accepts.  The broadcast is forced (not left to
        # AQE) so the token stream NEVER takes an exchange — an unhinted
        # join materializes the whole (ids, token) stream as shuffle
        # files before AQE's runtime conversion, an O(corpus tokens)
        # write this path exists to avoid.  The mapping side is the
        # bounded dictionary artifact plus the corpus's DISTINCT unknown
        # vocabulary (MBs–low GBs at any realistic corpus; the same
        # object the 'porter' path joins); a corpus with a pathological
        # vocabulary should use the (default) arrow build path.
        from .functions.porter import porter_series

        exc = spark.createDataFrame(
            [(k, list(v)) for k, v in dict_porter_table(forms).items()],
            "token string, forms array<string>")
        miss_vocab = stem_vocab_map(
            toks.join(F.broadcast(exc.select("token")), "token", "left_anti"),
            porter_series)
        vocab = exc.unionByName(
            miss_vocab.select("token", F.array("lemma").alias("forms")))
        return (toks.join(F.broadcast(vocab), "token")
                .select(*ids, F.explode("forms").alias("lemma")))
    if normalizer == "porter":
        # vocabulary normalization: stem each DISTINCT token once (a tiny
        # mapInPandas over the deduped vocabulary), join the mapping back to
        # the token stream.  O(vocabulary) normalizer work regardless of
        # corpus size; the mapping side is small, AQE broadcasts it.
        from .functions.porter import porter_series

        vocab = stem_vocab_map(toks, porter_series)
        return toks.join(vocab, "token").select(*ids, "lemma")
    # dictionary morphology: surface token -> ALL normal forms, every form
    # counted (LemmaFinderImpl.java:40-44).  The pinned path is this exact
    # mechanism with the 2-entry fixture table; 'dict' takes an arbitrary
    # dictionary.  Broadcast left join + explode: the dictionary is a
    # bounded vocabulary artifact (MBs at any corpus size — the reference
    # holds its whole morphology in one singleton,
    # LemmaFinderImpl.java:25-31), so broadcasting is the right call even
    # where forced broadcasts are otherwise banned.
    if normalizer == "dict":
        if forms is None:
            raise ValueError("normalizer='dict' needs a forms mapping")
        table = forms
    else:
        table = NORMAL_FORMS
    if table:
        exc = spark.createDataFrame(
            [(k, list(v)) for k, v in table.items()], "token string, forms array<string>"
        )
        toks = (
            toks.join(F.broadcast(exc), "token", "left")
            .select(
                *ids,
                F.explode(
                    F.coalesce(F.col("forms"), F.array(F.col("token")))
                ).alias("lemma"),
            )
        )
    else:
        toks = toks.select(*ids, F.col("token").alias("lemma"))
    return toks


# --- Arrow path: mapInPandas, vectorized pandas string ops ------------------


def tokenize_arrow(docs: DataFrame, text_col: str = "content",
                   id_cols: str | list[str] = "doc_id",
                   normalizer: str = "pinned",
                   forms: dict[str, tuple[str, ...]] | None = None) -> DataFrame:
    """Same contract as :func:`tokenize_jvm`, executed as a vectorized
    pandas/Arrow UDF (``mapInPandas``) — the BASELINE.json ``input_hint``
    shape, and the hook where a real (non-regex) analyzer would live.

    All operations are pandas-vectorized over each Arrow batch: no per-row
    Python function calls.
    """
    import pandas as pd  # noqa: F401 (runtime import keeps module import light)

    ids = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    id_fields = ", ".join(
        f"{c} {docs.schema[c].dataType.simpleString()}" for c in ids
    )
    out_schema = f"{id_fields}, lemma string"
    narrowed = docs.select(*ids, text_col)
    if normalizer == "dict_porter":
        table = {k: list(v) for k, v in dict_porter_table(forms).items()}
    elif normalizer == "dict":
        if forms is None:
            raise ValueError("normalizer='dict' needs a forms mapping")
        table = {k: list(v) for k, v in forms.items()}
    else:
        table = {k: list(v) for k, v in NORMAL_FORMS.items()}

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        forms = table  # closure: pinned fixture table or the user dictionary
        for pdf in it:
            if pdf.empty:
                continue
            s = pdf[text_col].fillna("")
            s = s.str.replace(_CAMEL_1[0], r"\1 \2", regex=True)
            s = s.str.replace(_CAMEL_2[0], r"\1 \2", regex=True)
            s = s.str.lower().str.replace(_STRIP_PY, " ", regex=True)
            tokens = s.str.split()
            flat = tokens.explode().dropna()
            keep = (flat.str.len() >= MIN_TOKEN_LEN) & ~flat.isin(STOP_WORDS)
            flat = flat[keep]
            if normalizer in ("stem", "porter"):
                if normalizer == "porter":
                    from .functions.porter import porter_series as _norm
                else:
                    _norm = stem_series
                yield (
                    pdf[ids].reindex(flat.index)
                    .assign(lemma=_norm(flat).values)
                    .reset_index(drop=True)
                )
                continue
            base = pdf[ids].reindex(flat.index)
            base = base.assign(lemma=flat.values)
            # multi-lemma expansion: exception tokens -> list of forms, explode
            has_exc = base["lemma"].isin(forms.keys())
            exc_rows = None
            if has_exc.any():
                exc_rows = base[has_exc].copy()
                exc_rows["lemma"] = exc_rows["lemma"].map(forms)
                exc_rows = exc_rows.explode("lemma")
                base = base[~has_exc]
            if normalizer == "dict_porter" and len(base):
                # layered fallback: tokens the dictionary does not know go
                # through the porter stemmer (vectorized over the batch)
                from .functions.porter import porter_series

                base = base.assign(lemma=porter_series(base["lemma"]).values)
            if exc_rows is not None:
                base = pd.concat([base, exc_rows], ignore_index=True)
            yield base.reset_index(drop=True)

    return narrowed.mapInPandas(_batches, schema=out_schema)


def tokenize(docs: DataFrame, text_col: str = "content",
             id_cols: str | list[str] = "doc_id", impl: str = "jvm") -> DataFrame:
    """Dispatch: impl in {'jvm', 'arrow'}."""
    if impl == "jvm":
        return tokenize_jvm(docs, text_col, id_cols)
    if impl == "arrow":
        return tokenize_arrow(docs, text_col, id_cols)
    raise ValueError(f"unknown analyzer impl: {impl!r}")


_STEM_MEMO: dict = {}
_STEM_MEMO_MAX = 2_000_000  # ~tens of MB of worker memory at the cap


def _stem_arrow(tokens, stem_fn, pa, pc):
    """Stem an arrow string array via dictionary-encode: Python touches
    only the batch's UNIQUE tokens, the per-occurrence mapping is an
    arrow ``take`` over contiguous buffers.  Returns a plain Array.

    Stems memoize per worker process (keyed (stem_fn, token)): Spark
    reuses python workers across batches and tasks, and a corpus's hot
    vocabulary repeats in every batch — without the memo each batch
    re-stems the same tokens.  Bounded: a pathological vocabulary clears
    the memo rather than growing without limit."""
    enc = tokens.dictionary_encode()
    memo = _STEM_MEMO
    if len(memo) > _STEM_MEMO_MAX:
        memo.clear()
    fid = id(stem_fn)
    stems = []
    for u in enc.dictionary.to_pylist():
        k = (fid, u)
        s = memo.get(k)
        if s is None:
            s = stem_fn(u)
            memo[k] = s
        stems.append(s)
    stemmed = pa.array(stems, type=pa.string())
    out = pc.take(stemmed, enc.indices)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def doc_term_stats_arrow(docs: DataFrame, text_col: str = "content",
                         normalizer: str = "pinned",
                         forms: dict[str, tuple[str, ...]] | None = None,
                         ) -> DataFrame:
    """(repo, doc_id, text) -> (repo, doc_id, lemma, tf, dl) with ZERO
    shuffle: a document's tokens all live in its own input row, so per-doc
    term frequencies and the doc length are computable entirely map-side
    inside one Arrow batch — where explode+groupBy would exchange every
    posting.  This is the index build's preferred analyzer stage: the first
    shuffle in the whole build is then the salted posting merge itself.

    Executed via ``mapInArrow`` + pyarrow compute kernels (RE2 regex, C++
    hash aggregation) over CONTIGUOUS Arrow buffers: tokens never become
    per-string Python objects.  Measured ~2.4x the pandas-object path per
    core and markedly less DRAM traffic — on the oversubscribed sandbox
    host the pandas path's object materialization was the phase that capped
    multi-core scaling (isolated 1->4-core probe: pandas 1.3x vs
    CPU-bound python work 3.4x).  :func:`doc_term_stats_pandas` keeps the
    pandas execution for the equivalence test.
    """
    from pyspark.sql import functions as F  # noqa: F401

    schema = "repo string, doc_id long, lemma string, tf int, dl long"
    narrowed = docs.select("repo", "doc_id", text_col)
    # EVERY normalizer runs through this fused stage (r5): table-driven
    # ones ('pinned'/'dict') as pure arrow-kernel work; the stemmer family
    # ('porter'/'stem', and 'dict_porter' for its dictionary MISSES) adds
    # one dictionary-encode per batch — Python touches only the batch's
    # UNIQUE tokens, and the O(corpus tokens) stream still never leaves
    # its partition.  Before r5 the stemmer normalizers fell back to the
    # unfused tokenize path, paying a full per-occurrence shuffle: a
    # 40k-doc dict_porter build measured 46 s vs 17 s pinned; fused it is
    # back in the pinned cost class.
    if normalizer == "dict_porter":
        from .functions.porter import porter_stem as _stem_fn

        table = dict_porter_table(forms)
    elif normalizer in ("porter", "stem"):
        if normalizer == "porter":
            from .functions.porter import porter_stem as _stem_fn
        else:
            _stem_fn = stem_token
        table = {}
    else:
        table = _forms_table(normalizer, forms)
        _stem_fn = None

    def _batches(it):
        import pyarrow as pa
        import pyarrow.compute as pc

        stop_set = pa.array(sorted(STOP_WORDS))
        exc_set = pa.array(list(table), type=pa.string())
        for batch in it:
            if batch.num_rows == 0:
                continue
            content = batch.column(batch.schema.get_field_index(text_col))
            x = pc.fill_null(content, "")
            x = pc.replace_substring_regex(x, pattern=_CAMEL_1[0], replacement=r"\1 \2")
            x = pc.replace_substring_regex(x, pattern=_CAMEL_2[0], replacement=r"\1 \2")
            x = pc.utf8_lower(x)
            x = pc.replace_substring_regex(x, pattern=_STRIP_PY, replacement=" ")
            lists = pc.split_pattern_regex(x, pattern=r"\s+")
            toks = pc.list_flatten(lists)
            par = pc.list_parent_indices(lists)
            keep = pc.and_(
                pc.greater_equal(pc.utf8_length(toks), MIN_TOKEN_LEN),
                pc.invert(pc.is_in(toks, value_set=stop_set)),
            )
            toks = pc.filter(toks, keep)
            par = pc.filter(par, keep)
            # multi-lemma expansion: the exception rows are rare, so only
            # THAT subset round-trips through Python
            exc_mask = pc.is_in(toks, value_set=exc_set)
            if (pc.sum(exc_mask).as_py() or 0) > 0:
                base_mask = pc.invert(exc_mask)
                bt, bp = pc.filter(toks, base_mask), pc.filter(par, base_mask)
                et = pc.filter(toks, exc_mask).to_pylist()
                ep = pc.filter(par, exc_mask).to_pylist()
                xt: list[str] = []
                xp: list[int] = []
                for tkn, p in zip(et, ep):
                    for form in table[tkn]:
                        xt.append(form)
                        xp.append(p)
                if _stem_fn is not None and len(bt):
                    bt = _stem_arrow(bt, _stem_fn, pa, pc)
                toks = pa.concat_arrays([bt, pa.array(xt, type=pa.string())])
                par = pa.concat_arrays([bp, pa.array(xp, type=bp.type)])
            elif _stem_fn is not None and len(toks):
                toks = _stem_arrow(toks, _stem_fn, pa, pc)
            if len(toks) == 0:
                continue
            tf_t = (
                pa.table({"i": par, "lemma": toks})
                .group_by(["i", "lemma"], use_threads=False)
                .aggregate([([], "count_all")])
            )
            dl_t = (
                tf_t.group_by(["i"], use_threads=False)
                .aggregate([("count_all", "sum")])
            )
            out = tf_t.join(dl_t, keys="i", use_threads=False)
            i = out["i"].combine_chunks()
            repo_idx = batch.schema.get_field_index("repo")
            id_idx = batch.schema.get_field_index("doc_id")
            yield pa.record_batch(
                [
                    pc.cast(pc.take(batch.column(repo_idx), i), pa.string()),
                    pc.cast(pc.take(batch.column(id_idx), i), pa.int64()),
                    pc.cast(out["lemma"].combine_chunks(), pa.string()),
                    pc.cast(out["count_all"].combine_chunks(), pa.int32()),
                    pc.cast(out["count_all_sum"].combine_chunks(), pa.int64()),
                ],
                names=["repo", "doc_id", "lemma", "tf", "dl"],
            )

    return narrowed.mapInArrow(_batches, schema=schema)


def doc_term_stats_pandas(docs: DataFrame, text_col: str = "content",
                          normalizer: str = "pinned",
                          forms: dict[str, tuple[str, ...]] | None = None,
                          ) -> DataFrame:
    """The pandas-object execution of :func:`doc_term_stats_arrow`'s
    contract (mapInPandas) — kept as the equivalence-test twin and the
    fallback if a pyarrow compute kernel is unavailable.
    """
    import pandas as pd  # noqa: F401

    schema = "repo string, doc_id long, lemma string, tf int, dl long"
    narrowed = docs.select("repo", "doc_id", text_col)
    table = {k: list(v) for k, v in _forms_table(normalizer, forms).items()}

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        forms = table
        for pdf in it:
            if pdf.empty:
                continue
            s = pdf[text_col].fillna("")
            s = s.str.replace(_CAMEL_1[0], r"\1 \2", regex=True)
            s = s.str.replace(_CAMEL_2[0], r"\1 \2", regex=True)
            s = s.str.lower().str.replace(_STRIP_PY, " ", regex=True)
            flat = s.str.split().explode().dropna()
            keep = (flat.str.len() >= MIN_TOKEN_LEN) & ~flat.isin(STOP_WORDS)
            flat = flat[keep]
            base = pdf[["repo", "doc_id"]].reindex(flat.index).assign(lemma=flat.values)
            has_exc = base["lemma"].isin(forms.keys())
            if has_exc.any():
                exc_rows = base[has_exc].copy()
                exc_rows["lemma"] = exc_rows["lemma"].map(forms)
                base = pd.concat(
                    [base[~has_exc], exc_rows.explode("lemma")], ignore_index=True
                )
            if base.empty:
                continue
            tf = (
                base.groupby(["repo", "doc_id", "lemma"], sort=False)
                .size()
                .rename("tf")
                .reset_index()
            )
            dl = tf.groupby("doc_id", sort=False)["tf"].transform("sum")
            tf["tf"] = tf["tf"].astype("int32")
            tf["dl"] = dl.astype("int64")
            yield tf

    return narrowed.mapInPandas(_batches, schema=schema)
