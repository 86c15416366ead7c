"""Hand oracles for the code-aware functions (functions/code.py):
identifier subtoken splitting and per-line stats.  Cross-engine twins
are gate-checked (check_entry entries code_subtokens / code_stats)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from invertedindexbuilder_spark.functions.code import (
    alnum_fraction,
    code_line_stats,
    subtokens,
)


def _one(spark, text, expr):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(expr.alias("v"))
        .collect()[0]["v"]
    )


@pytest.mark.parametrize(
    "ident,parts",
    [
        ("getUserAccountManager", ["get", "user", "account", "manager"]),
        ("HTTPServer2", ["http", "server", "2"]),
        ("parse_HTML_fast", ["parse", "html", "fast"]),
        ("utf8Decoder", ["utf", "8", "decoder"]),
        ("snake_case_name", ["snake", "case", "name"]),
        ("XMLHttpRequest", ["xml", "http", "request"]),
        ("plain", ["plain"]),
        ("ALLCAPS", ["allcaps"]),
        ("v2", ["v", "2"]),
    ],
)
def test_subtoken_splitting(spark, ident, parts):
    assert _one(spark, ident, subtokens(F.col("text"))) == parts


def test_subtokens_survive_index_length_filter(spark):
    """The reference tokenizer drops >15-char tokens whole
    (main.c:104-123); after splitting, every subtoken of a long
    identifier is indexable."""
    got = _one(
        spark, "theVeryLongIdentifierNameOfDoom x", subtokens(F.col("text"))
    )
    assert all(1 <= len(t) <= 15 for t in got)
    assert "doom" in got and "identifier" in got


def test_code_line_stats_hand(spark):
    n, mx, mean = code_line_stats(F.col("text"))
    row = (
        spark.createDataFrame([("ab\n\ncdef\nx",)], "text string")
        .select(n.alias("n"), mx.alias("mx"), mean.alias("mean"))
        .collect()[0]
    )
    # lines: "ab"(2), ""(0), "cdef"(4), "x"(1)
    assert row["n"] == 4 and row["mx"] == 4
    assert row["mean"] == pytest.approx(7 / 4, abs=1e-6)


def test_code_line_stats_trailing_newline(spark):
    n, mx, mean = code_line_stats(F.col("text"))
    row = (
        spark.createDataFrame([("a\n",)], "text string")
        .select(n.alias("n"))
        .collect()[0]
    )
    assert row["n"] == 2  # trailing empty line counts (split limit -1)


def test_alnum_fraction(spark):
    assert _one(spark, "ab!!", alnum_fraction(F.col("text"))) == 0.5
    assert _one(spark, "", alnum_fraction(F.col("text"))) == 1.0
    assert _one(spark, "a1B2", alnum_fraction(F.col("text"))) == 1.0
