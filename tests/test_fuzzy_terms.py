"""Hand oracles for typo-tolerant and prefix vocabulary lookup
(operators/textsearch.py fuzzy_term_match / prefix_terms)."""

from __future__ import annotations

import pytest

from invertedindexbuilder_spark.operators.textsearch import (
    fuzzy_term_match,
    prefix_terms,
)

VOCAB = ["table", "tables", "cable", "tale", "stable", "zzz", "tablet", "tbale"]


def _terms(spark, words=None):
    return spark.createDataFrame(
        [(w,) for w in (words or VOCAB)], "term string"
    )


def _brute(query, max_dist, words=None):
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    return {w: lev(w, query) for w in (words or VOCAB) if lev(w, query) <= max_dist}


@pytest.mark.parametrize("query,max_dist", [("table", 1), ("table", 2), ("tble", 1), ("tble", 2)])
def test_fuzzy_matches_bruteforce(spark, query, max_dist):
    got = {
        r["term"]: r["distance"]
        for r in fuzzy_term_match(_terms(spark), query, max_dist).collect()
    }
    assert got == _brute(query, max_dist)


def test_fuzzy_transposition_needs_dist2(spark):
    # 'tbale' is a transposition of 'table' = 2 plain edits
    d1 = {r["term"] for r in fuzzy_term_match(_terms(spark), "table", 1).collect()}
    d2 = {r["term"] for r in fuzzy_term_match(_terms(spark), "table", 2).collect()}
    assert "tbale" not in d1 and "tbale" in d2


def test_fuzzy_single_char_and_dupes(spark):
    t = _terms(spark, ["a", "ab", "b", "ab"])  # duplicate vocab rows
    got = {r["term"] for r in fuzzy_term_match(t, "a", 1).collect()}
    assert got == {"a", "ab", "b"}
    # duplicates collapse: one output row per term
    assert fuzzy_term_match(t, "a", 1).count() == 3


def test_fuzzy_uses_materialized_variant_index(spark, tmp_path):
    """A pre-written (term, variant) parquet serves lookups with the
    variant IN-list pushed to the scan, same results as inline."""
    from invertedindexbuilder_spark.operators.textsearch import (
        term_deletion_variants,
    )

    root = str(tmp_path / "fuzzy_idx")
    term_deletion_variants(_terms(spark), max_dist=1).write.parquet(root)
    var = spark.read.parquet(root)
    out = fuzzy_term_match(_terms(spark), "table", 1, variants=var)
    got = {r["term"]: r["distance"] for r in out.collect()}
    assert got == _brute("table", 1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(variant" in plan.replace(" ", "")


def test_prefix_terms(spark):
    got = {r["term"] for r in prefix_terms(_terms(spark), "tab").collect()}
    assert got == {"table", "tables", "tablet"}


def test_empty_inputs_raise(spark):
    with pytest.raises(ValueError):
        fuzzy_term_match(_terms(spark), "")
    with pytest.raises(ValueError):
        prefix_terms(_terms(spark), "")
