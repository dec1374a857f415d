"""r3 VERDICT item 6: the text-analysis oracles must survive a corpus with
tabs / newlines / CR / doubled and leading whitespace — the Spark side
tokenizes on ``\\s+`` (functions/text.py tokens_col), so the DuckDB twins
now split on ``regexp_split_to_array(text, '\\s+')`` instead of a literal
space.  Pinned caveat: Java's ``\\s`` includes ``\\x0B`` where RE2's (DuckDB)
does not — that one character stays out of the fixture by contract."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.gate_check import compare, duck_conn

NAMES = ["token_count", "lang_id", "text_quality", "clean_corpus",
         "fingerprint"]

TEXTS = [
    "\tthe  quick\nbrown\r\nfox of to in is the a and",   # tabs + CRLF + runs
    "plain single spaced words here the a of",
    "a\n\nb\tc  d",                                        # short tokens only
    "   leading and trailing   \t\n",
    "",                                                    # empty doc
    "the\tthe\nthe the of of\tof",                         # stopword-heavy
    "x" * 50 + "\n" + "y z " * 30,
]


@pytest.fixture(scope="module")
def ws_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ws_docs")
    t = pa.table({
        "doc_id": pa.array(range(len(TEXTS)), type=pa.int64()),
        "text": pa.array(TEXTS, type=pa.string()),
        "lang": pa.array(["en"] * len(TEXTS), type=pa.string()),
        "source": pa.array([f"src{i % 2}" for i in range(len(TEXTS))],
                           type=pa.string()),
        "n_chars": pa.array([len(t) for t in TEXTS], type=pa.int64()),
    })
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", NAMES)
def test_text_oracle_matches_on_whitespace_variety(spark, ws_dir, name):
    con = duck_conn(ws_dir)
    ok, msg = compare(name, spark, con, ws_dir)
    assert ok, f"{name}: {msg}"
