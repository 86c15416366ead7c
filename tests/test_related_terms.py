"""PMI related-terms (textsearch.related_terms) hand oracle."""

from __future__ import annotations

import math

import pytest

from invertedindexbuilder_spark.operators.textsearch import related_terms


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_related_terms_hand(spark):
    # 6 docs; 'data' in 4; 'spark' always with data (co 4, df 4);
    # 'noise' everywhere (co 4, df 6); 'solo' never with data
    docs = _docs(
        spark,
        [
            (0, "data spark noise"),
            (1, "data spark noise"),
            (2, "data spark noise"),
            (3, "data spark noise extra"),
            (4, "solo noise"),
            (5, "solo noise"),
        ],
    )
    out = {r["term"]: r for r in related_terms(docs, "data", k=10, min_co_df=2).collect()}
    assert set(out) == {"spark", "noise"}  # 'extra' co_df=1 cut; 'solo' co 0
    n, dft = 6, 4
    assert out["spark"]["co_df"] == 4 and out["spark"]["df"] == 4
    assert out["spark"]["pmi"] == pytest.approx(
        round(math.log2(4 * n / (dft * 4)), 6)
    )
    # ubiquitous 'noise' scores LOWER than the true associate
    assert out["noise"]["pmi"] < out["spark"]["pmi"]


def test_related_terms_unknown_term_empty(spark):
    docs = _docs(spark, [(0, "a b c")])
    out = related_terms(docs, "zzz", k=5)
    assert out.count() == 0
    assert out.columns == ["term", "co_df", "df", "pmi"]


def test_related_terms_duplicates_in_doc_count_once(spark):
    # doc-level co-occurrence: repeated tokens in one doc add nothing
    docs = _docs(spark, [(0, "data x x x"), (1, "data x"), (2, "y")])
    out = {r["term"]: r for r in related_terms(docs, "data", k=5, min_co_df=2).collect()}
    assert out["x"]["co_df"] == 2 and out["x"]["df"] == 2
