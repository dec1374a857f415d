"""Analyzer unit tests + three-way implementation agreement (SURVEY.md §5.2)."""

from __future__ import annotations

from collections import Counter

from searchengine_spark.analyzer import (
    MIN_TOKEN_LEN,
    analyze,
    collect_lemmas,
    tokenize_arrow,
    tokenize_jvm,
)


def test_lowercase_and_strip():
    assert analyze("Hello, WORLD!!! value") == ["hello", "world", "value"]


def test_camel_and_snake_split():
    # camelCase boundary split; snake_case splits on the punct class (_)
    assert analyze("parseHtmlPage snake_case_name") == [
        "parse", "html", "page", "snake", "case", "name"
    ]
    assert analyze("HTTPServerConfig") == ["http", "server", "config"]


def test_digits_and_operators_stripped():
    assert analyze("foo123bar x = y + 42; value(7)") == ["value"]
    # foo123bar -> 'foo' 'bar' both len 3 -> dropped


def test_short_and_stop_dropped():
    assert analyze("the import class of big table") == ["table"]
    assert "return" not in analyze("return tableValue")


def test_multi_lemma_expansion():
    assert analyze("норма") == ["норма", "нормаль"]
    assert collect_lemmas("geese geese") == {"goose": 2, "geese": 2}


def test_empty_and_punct_only():
    assert analyze("") == []
    assert analyze("!!! ;;; 123 @@@") == []


def test_collect_lemmas_counts():
    got = collect_lemmas("value value tableScan value")
    assert got == {"value": 3, "table": 1, "scan": 1}


def test_jvm_arrow_python_agree(spark, corpus_rows):
    """The three executions of the pinned analyzer must agree exactly."""
    from searchengine_spark.schema import DOCS_SCHEMA

    sample = corpus_rows[:60]
    df = spark.createDataFrame(sample, DOCS_SCHEMA).selectExpr(
        "path as doc_key", "content"
    )
    jvm = Counter(
        (r["doc_key"], r["lemma"])
        for r in tokenize_jvm(df, id_cols="doc_key").collect()
    )
    arrow = Counter(
        (r["doc_key"], r["lemma"])
        for r in tokenize_arrow(df, id_cols="doc_key").collect()
    )
    pure = Counter()
    for repo, path, commit, lang, content in sample:
        for lemma in analyze(content):
            pure[(path, lemma)] += 1
    assert jvm == pure
    assert arrow == pure


def test_min_len_boundary():
    assert analyze("abcd abc") == ["abcd"]
    assert MIN_TOKEN_LEN == 4


def test_stemmer_rules():
    from searchengine_spark.analyzer import stem_token

    assert stem_token("classes") == "class"   # -sses -> -ss
    assert stem_token("addresses") == "address"
    assert stem_token("queries") == "query"   # -ies -> -y
    assert stem_token("parsing") == "pars"    # -ing
    assert stem_token("sing") == "sing"       # -ing len guard
    assert stem_token("parsed") == "pars"     # -ed
    assert stem_token("used") == "used"       # -ed len guard
    assert stem_token("tables") == "table"    # -s
    assert stem_token("class") == "class"     # -ss protected
    assert stem_token("status") == "status"   # -us protected
    assert stem_token("value") == "value"


def test_stem_analyzer_three_way_agree(spark, corpus_rows):
    """The pluggable-normalizer slot, exercised with a REAL stemmer: the
    pure-Python, Catalyst, and Arrow executions must agree exactly under
    normalizer='stem' (its own fixture set — the pinned golden fixtures are
    untouched)."""
    from searchengine_spark.analyzer import stem_token
    from searchengine_spark.schema import DOCS_SCHEMA

    sample = corpus_rows[:60] + [
        ("r", "p1", "c", "py", "parsing parsed queries addresses tables Sing"),
        ("r", "p2", "c", "py", "classes class status buses using used"),
    ]
    df = spark.createDataFrame(sample, DOCS_SCHEMA).selectExpr(
        "path as doc_key", "content"
    )
    jvm = Counter(
        (r["doc_key"], r["lemma"])
        for r in tokenize_jvm(df, id_cols="doc_key", normalizer="stem").collect()
    )
    arrow = Counter(
        (r["doc_key"], r["lemma"])
        for r in tokenize_arrow(df, id_cols="doc_key", normalizer="stem").collect()
    )
    pure = Counter()
    for repo, path, commit, lang, content in sample:
        for lemma in analyze(content, normalizer="stem"):
            pure[(path, lemma)] += 1
    assert jvm == pure
    assert arrow == pure
    assert any(k[1] == "pars" for k in pure)  # the stemmer actually fired


def test_porter_canonical_vectors():
    """Full Porter stemmer against canonical pairs from the published
    algorithm (Porter 1980) — every step exercised."""
    from searchengine_spark.functions.porter import porter_stem

    vectors = {
        # step 1a
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat",
        # step 1b (+1b')
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "bled": "bled", "motoring": "motor", "sing": "sing",
        "conflated": "conflat", "troubled": "troubl", "sized": "size",
        "hopping": "hop", "tanned": "tan", "falling": "fall",
        "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file",
        # step 1c
        "happy": "happi", "sky": "sky",
        # step 2 (through the full pipeline)
        "relational": "relat", "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
        "radicalli": "radic", "differentli": "differ", "vileli": "vile",
        "analogousli": "analog", "vietnamization": "vietnam",
        "predication": "predic", "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope",
        "callousness": "callous", "formaliti": "formal",
        "sensitiviti": "sensit", "sensibiliti": "sensibl",
        # step 3
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good",
        # step 4
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt", "communism": "commun",
        "activate": "activ", "angulariti": "angular",
        "homologous": "homolog", "effective": "effect",
        "bowdlerize": "bowdler",
        # step 5
        "probate": "probat", "rate": "rate", "cease": "ceas",
        "controll": "control", "roll": "roll",
        # guards
        "as": "as", "is": "is",
        # non-English passes through (non-ASCII letters are consonants)
        "норма": "норма",
    }
    bad = {w: (porter_stem(w), want) for w, want in vectors.items()
           if porter_stem(w) != want}
    assert not bad, bad


def test_porter_analyzer_three_way_agree(spark, corpus_rows):
    """normalizer='porter': the pure-Python, JVM (vocabulary-join), and
    Arrow executions must agree exactly — same structure as the 'stem'
    slot test; the pinned golden fixtures are untouched."""
    from searchengine_spark.schema import DOCS_SCHEMA

    sample = corpus_rows[:60] + [
        ("r", "p1", "c", "py", "relational conditioners digitizer hopping"),
        ("r", "p2", "c", "py", "effective replacement adoption agreed ties"),
    ]
    df = spark.createDataFrame(sample, DOCS_SCHEMA).selectExpr(
        "path as doc_key", "content"
    )
    jvm = Counter(
        (r["doc_key"], r["lemma"])
        for r in tokenize_jvm(df, id_cols="doc_key", normalizer="porter").collect()
    )
    arrow = Counter(
        (r["doc_key"], r["lemma"])
        for r in tokenize_arrow(df, id_cols="doc_key", normalizer="porter").collect()
    )
    pure = Counter()
    for repo, path, commit, lang, content in sample:
        for lemma in analyze(content, normalizer="porter"):
            pure[(path, lemma)] += 1
    assert jvm == pure
    assert arrow == pure
    assert any(k[1] == "relat" for k in pure)  # porter actually fired


def test_doc_term_stats_arrow_equals_pandas(spark, corpus_rows):
    """The mapInArrow (pyarrow compute) and mapInPandas executions of the
    fused tf/dl stage must agree exactly — including multi-lemma expansion
    and zero-lemma docs."""
    from searchengine_spark.analyzer import doc_term_stats_arrow, doc_term_stats_pandas
    from searchengine_spark.schema import DOCS_SCHEMA

    df = spark.createDataFrame(corpus_rows[:80], DOCS_SCHEMA).selectExpr(
        "repo", "abs(hash(path)) as doc_id", "content"
    )
    a = {(r["repo"], r["doc_id"], r["lemma"]): (r["tf"], r["dl"])
         for r in doc_term_stats_arrow(df).collect()}
    p = {(r["repo"], r["doc_id"], r["lemma"]): (r["tf"], r["dl"])
         for r in doc_term_stats_pandas(df).collect()}
    assert a == p and len(a) > 1000


def test_doc_term_stats_arrow_stemmer_normalizers(spark, corpus_rows):
    """r5: the fused zero-shuffle stage now runs the STEMMER family too
    (dictionary-encode per batch — Python only on unique tokens).  Its
    (tf, dl) output must equal the pure-Python analyze() oracle under
    'porter', 'stem' and the layered 'dict_porter'."""
    from collections import Counter

    from searchengine_spark.analyzer import analyze, doc_term_stats_arrow
    from searchengine_spark.functions.english import ENGLISH_FORMS
    from searchengine_spark.schema import DOCS_SCHEMA

    sample = corpus_rows[:60] + [
        ("org/x", "s/a.py", "c1", "py",
         "yesterday people went running and the children left quietly"),
        ("org/x", "s/b.py", "c1", "py",
         "connection connected connecting relations relating related"),
    ]
    df = spark.createDataFrame(sample, DOCS_SCHEMA).selectExpr(
        "repo", "abs(hash(path)) as doc_id", "content")
    id_content = [(r["doc_id"], r["content"]) for r in df.collect()]
    for norm, forms in (("porter", None), ("stem", None),
                        ("dict_porter", ENGLISH_FORMS)):
        got_tf: dict = {}
        got_dl: dict = {}
        for r in doc_term_stats_arrow(df, normalizer=norm,
                                      forms=forms).collect():
            got_tf[(r["doc_id"], r["lemma"])] = r["tf"]
            got_dl.setdefault(r["doc_id"], r["dl"])
        want_tf: dict = {}
        want_dl: dict = {}
        for did, content in id_content:
            c = Counter(analyze(content, norm, forms))
            for lemma, n in c.items():
                want_tf[(did, lemma)] = n
            if c:
                want_dl[did] = sum(c.values())
        assert got_tf == want_tf, norm
        assert got_dl == want_dl, norm


def _inflection_dict(rows) -> dict[str, tuple[str, ...]]:
    """Dictionary-morphology fixture: a few hundred surface forms derived
    from the corpus vocabulary, several mapping to MULTIPLE normal forms —
    the reference's RussianLuceneMorphology shape (one inflected token may
    emit several lemmas, LemmaFinderImpl.java:40-44)."""
    from searchengine_spark.analyzer import MIN_TOKEN_LEN, STOP_WORDS

    vocab = sorted({
        t for _, _, _, _, content in rows
        for t in analyze(content)
    })
    table: dict[str, tuple[str, ...]] = {}
    for i, t in enumerate(vocab[:300]):
        if len(t) < MIN_TOKEN_LEN or t in STOP_WORDS:
            continue
        if i % 3 == 0:
            table[t] = (t[:4] + "_base",)                  # single lemma
        elif i % 3 == 1:
            table[t] = (t[:4] + "_verb", t[:4] + "_noun")  # ambiguous: TWO
        # i % 3 == 2: not in the dictionary -> identity
    return table


def test_dict_normalizer_three_way_agree(spark, corpus_rows):
    """normalizer='dict' (dictionary-grade morphology in the pluggable
    slot): the pure-Python, Catalyst (broadcast-join + explode) and Arrow
    executions must agree exactly under a ~200-entry multi-form dictionary;
    the pinned golden fixtures are untouched (separate normalizer value)."""
    from searchengine_spark.schema import DOCS_SCHEMA

    sample = corpus_rows[:60]
    table = _inflection_dict(sample)
    assert sum(1 for v in table.values() if len(v) > 1) > 30  # real ambiguity
    df = spark.createDataFrame(sample, DOCS_SCHEMA).selectExpr(
        "path as doc_key", "content"
    )
    jvm = Counter(
        (r["doc_key"], r["lemma"])
        for r in tokenize_jvm(df, id_cols="doc_key", normalizer="dict",
                              forms=table).collect()
    )
    arrow = Counter(
        (r["doc_key"], r["lemma"])
        for r in tokenize_arrow(df, id_cols="doc_key", normalizer="dict",
                                forms=table).collect()
    )
    pure = Counter()
    for repo, path, commit, lang, content in sample:
        for lemma in analyze(content, normalizer="dict", forms=table):
            pure[(path, lemma)] += 1
    assert jvm == pure
    assert arrow == pure
    assert any(k[1].endswith("_verb") for k in pure)  # expansion fired


def test_dict_normalizer_counts_every_form():
    """LemmaFinderImpl.java:40-44 semantics: a surface token contributes
    one count to EVERY of its normal forms, and phrase positions hold all
    forms at ONE slot."""
    from collections import Counter as C

    from searchengine_spark.analyzer import analyze_positions

    table = {"leaves": ("leaf", "leave"), "left": ("leave",)}
    text = "leaves left leaves behind"
    got = C(analyze(text, normalizer="dict", forms=table))
    assert got == C({"leaf": 2, "leave": 3, "behind": 1})
    stream = analyze_positions(text, normalizer="dict", forms=table)
    assert stream == [("leaf", "leave"), ("leave",), ("leaf", "leave"),
                      ("behind",)]


def test_dict_normalizer_requires_forms():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        analyze("whatever", normalizer="dict")
