"""Round-trip of the materialized search-extension indexes
(plans/build.build_search_tables -> load_search_tables): every served
query must equal its ad hoc twin, and the stored tables' probe filters
must reach the parquet scans (the pruning that makes them indexes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from invertedindexbuilder_spark.operators.textsearch import (
    fuzzy_term_match,
    phrase_match,
    prefix_terms,
    related_terms,
    substring_search,
)
from invertedindexbuilder_spark.plans.build import (
    build_search_tables,
    load_search_tables,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, "data join spark table scan"),
            (1, "data join data join"),
            (2, "spark table scan le part"),
            (3, "tabl data"),  # distance-1 fuzzy target for 'table'
            (4, "le part le part join"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def stored(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("searchidx"))
    counts = build_search_tables(spark, corpus, root, max_dist=1)
    assert counts["n_docs"] == 5
    assert counts["positional_postings"] > 0
    assert counts["char_trigrams"] > 0
    assert counts["fuzzy_variants"] > 0
    return load_search_tables(spark, root)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_phrase_served_equals_adhoc(corpus, stored):
    served = phrase_match(
        corpus, "data join", postings=stored["positional_postings"]
    )
    assert _rows(served) == _rows(phrase_match(corpus, "data join"))
    assert len(_rows(served)) > 0


def test_substring_served_equals_adhoc(corpus, stored):
    served = substring_search(
        corpus, "le part", trigrams=stored["char_trigrams"]
    )
    assert _rows(served) == _rows(substring_search(corpus, "le part"))
    assert len(_rows(served)) > 0


def test_fuzzy_served_equals_adhoc(spark, corpus, stored):
    vocab = corpus.select(
        F.explode(F.split("text", " ")).alias("term")
    )
    served = fuzzy_term_match(
        vocab, "table", 1, variants=stored["fuzzy_variants"]
    )
    assert _rows(served) == _rows(fuzzy_term_match(vocab, "table", 1))
    assert ("tabl", 1) in {(r["term"], r["distance"]) for r in served.collect()}


def test_prefix_from_stored_vocab(corpus, stored):
    vocab = stored["term_dfs"].select(F.col("t").alias("term"))
    got = {r["term"] for r in prefix_terms(vocab, "ta").collect()}
    assert got == {"table", "tabl"}


def test_related_served_equals_adhoc(corpus, stored):
    served = related_terms(
        None, "data", k=10, min_co_df=1,
        doc_terms=stored["doc_terms"], dfs=stored["term_dfs"],
        n_docs=stored["n_docs"],
    )
    adhoc = related_terms(corpus, "data", k=10, min_co_df=1)
    assert [tuple(r) for r in served.collect()] == [
        tuple(r) for r in adhoc.collect()
    ]


def test_stored_probe_filters_reach_scan(corpus, stored):
    """The stored tables are range-partitioned/sorted on their probe
    key: the query-side IN-list / equality must appear in PushedFilters
    so row-group stats (and, partitioned at scale, file listings)
    prune."""
    served = substring_search(
        corpus, "le part", trigrams=stored["char_trigrams"]
    )
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(trigram" in plan
    fm = phrase_match(
        corpus, "data join", postings=stored["positional_postings"]
    )
    plan = fm._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(term,data)" in plan
