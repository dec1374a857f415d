"""Engine vs oracle: rank- and score-identity on the fixture query set
(FIXTURES.md §2-3; the BASELINE.json correctness gate)."""

from __future__ import annotations

import pytest

from searchengine_spark.operators.search import search

THRESHOLD = 50  # FIXTURES.md: df threshold scaled to fixture size

# FIXTURES.md §2 coverage: 1/2/5-term, stop-only, no-hit, repo-scoped,
# marker-driven, offset-beyond-count, proximity differentiator.
QUERIES = [
    ("kw_rare_xyzzy", None, 0, 20),
    ("kw_common_foo", None, 0, 20),          # dropped by df threshold -> empty
    ("kw_pair_alpha kw_pair_beta", None, 0, 20),
    ("tamok", None, 0, 10),
    ("tamok velsor", None, 0, 20),
    ("tamok velsor binqua sorbin kw_rare_xyzzy", None, 0, 20),
    ("the and import class", None, 0, 20),   # all stop/short -> empty
    ("zzz_never_present_term", None, 0, 20),
    ("норма", None, 0, 20),                  # multi-lemma marker
    ("tamok", "org0/proj0", 0, 20),          # repo-scoped
    ("tamok", "org1/proj1", 0, 20),
    ("tamok", None, 5, 5),                   # offset pagination
    ("tamok", None, 10_000, 20),             # offset beyond count
    ("renta", None, 0, 1),                   # k=1
    ("renta", None, 0, 100),                 # k=100
    ("velsor renta", None, 3, 4),
    ("норма", "org0/proj0", 0, 20),          # multi-lemma + repo scope
    ("value(7) tamok", None, 0, 20),         # regex-special chars in raw query
    ("tamok TAMOK Tamok", None, 0, 20),      # case folding collapses to 1 lemma
    ("sorvel", None, 0, 2),                  # tie-heavy tiny page
    ("lixpex rudmoksilkip", None, 1, 3),     # 2-term with offset
]


def _run_both(spark, docs, logical_index, oracle, q, repo, offset, limit,
              proximity=True, snippets=True):
    tf, lemmas = logical_index
    got_df, got_count = search(
        spark, docs, tf, lemmas, q, repo=repo, offset=offset, limit=limit,
        threshold=THRESHOLD, proximity=proximity, snippets=snippets,
    )
    got = [r.asDict() for r in got_df.collect()]
    want = oracle.search(q, repo=repo, offset=offset, limit=limit,
                         threshold=THRESHOLD, proximity=proximity,
                         snippets=snippets)
    return got, got_count, want


@pytest.mark.parametrize("q,repo,offset,limit", QUERIES)
def test_rank_and_score_identity(spark, docs, logical_index, oracle, q, repo, offset, limit):
    got, got_count, want = _run_both(spark, docs, logical_index, oracle, q, repo, offset, limit)
    assert got_count == want["count"]
    assert [g["doc_id"] for g in got] == [w["doc_id"] for w in want["results"]]
    assert [g["score"] for g in got] == [w["score"] for w in want["results"]]
    assert [g["repo"] for g in got] == [w["repo"] for w in want["results"]]
    assert [g["path"] for g in got] == [w["path"] for w in want["results"]]
    assert [g["title"] for g in got] == [w["title"] for w in want["results"]]
    assert [g["snippet"] for g in got] == [w["snippet"] for w in want["results"]]


def test_proximity_differentiates(spark, docs, logical_index, oracle):
    """kw_pair docs: adjacent pair passes, far-apart pair fails (F11)."""
    got_p, count_p, want_p = _run_both(
        spark, docs, logical_index, oracle, "kw_pair_alpha kw_pair_beta", None, 0, 50
    )
    got_np, count_np, want_np = _run_both(
        spark, docs, logical_index, oracle, "kw_pair_alpha kw_pair_beta", None, 0, 50,
        proximity=False,
    )
    assert count_p == want_p["count"]
    assert count_np == want_np["count"]
    assert count_np > count_p  # proximity actually filters


def test_df_threshold_drops_common_term(spark, docs, logical_index, oracle):
    """The df threshold is PER-REPO (reference lemma table is site-scoped):
    'veltadrolix' has df=92 >= 50 in org0/proj0 (term ignored there -> no
    candidates) but df < 50 in the small repos (term searched).  Engine and
    oracle must agree repo-by-repo."""
    assert oracle.df["org0/proj0"]["veltadrolix"] >= THRESHOLD
    got, got_count, want = _run_both(
        spark, docs, logical_index, oracle, "veltadrolix", None, 0, 200,
        proximity=False, snippets=False,
    )
    assert got_count == want["count"] > 0
    repos = {g["repo"] for g in got}
    assert "org0/proj0" not in repos  # dropped where df >= threshold
    assert [g["doc_id"] for g in got] == [w["doc_id"] for w in want["results"]]


def test_stats_parity(spark, docs, logical_index, oracle):
    from searchengine_spark.operators.stats import per_repo_stats, totals

    tf, lemmas = logical_index
    stats_df = per_repo_stats(docs, lemmas)
    got = {r["repo"]: (r["pages"], r["lemmas"]) for r in stats_df.collect()}
    want = {r: (v["pages"], v["lemmas"]) for r, v in oracle.stats()["per_repo"].items()}
    assert got == want
    tot = totals(stats_df).collect()[0]
    wt = oracle.stats()["total"]
    assert (tot["sites"], tot["pages"], tot["lemmas"]) == (wt["sites"], wt["pages"], wt["lemmas"])


def test_tf_df_parity(logical_index, oracle):
    tf, lemmas = logical_index
    got_df = {(r["repo"], r["lemma"]): r["df"] for r in lemmas.collect()}
    want_df = {(r, lemma): n for r, c in oracle.df.items() for lemma, n in c.items()}
    assert got_df == want_df
    got_tf = {(r["doc_id"], r["lemma"]): r["tf"] for r in tf.collect()}
    want_tf = {(d, lemma): n for d, c in oracle.tf.items() for lemma, n in c.items()}
    assert got_tf == want_tf


def test_bm25_matches_oracle(spark, docs, logical_index, oracle):
    tf, lemmas = logical_index
    got_df, _ = search(
        spark, docs, tf, lemmas, "tamok velsor", threshold=THRESHOLD,
        proximity=False, snippets=False, scoring="bm25", limit=1000,
    )
    got = {r["doc_id"]: r["score"] for r in got_df.collect()}
    want = oracle.bm25("tamok velsor", threshold=THRESHOLD)
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], rel=1e-9)


def test_bm25_degenerate_mode_is_reference_ranking(spark, docs, logical_index, oracle):
    """k1 huge, b=0: BM25 ranking == Σtf ranking (SURVEY.md §7 step 5)."""
    tf, lemmas = logical_index
    big, _ = search(
        spark, docs, tf, lemmas, "tamok velsor", threshold=THRESHOLD,
        proximity=False, snippets=False, scoring="bm25", k1=1e9, b=0.0,
        idf="one", limit=1000,
    )
    ref, _ = search(
        spark, docs, tf, lemmas, "tamok velsor", threshold=THRESHOLD,
        proximity=False, snippets=False, scoring="reference", limit=1000,
    )
    # At finite k1 the O(tf²/k1) residue can permute docs WITHIN a Σtf tie
    # group, so assert the degenerate ordering is a valid Σtf-descending
    # ordering: same doc set, and Σtf is non-increasing along the BM25 order.
    sumtf = {r["doc_id"]: r["score"] for r in ref.collect()}
    big_rank = [r["doc_id"] for r in big.collect()]
    assert set(big_rank) == set(sumtf)
    seq = [sumtf[d] for d in big_rank]
    assert seq == sorted(seq, reverse=True)
