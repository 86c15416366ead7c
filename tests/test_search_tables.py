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


# ------------------------------------------------------- incremental compact


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")




def test_compact_search_tables_equals_full_rebuild(spark, tmp_path):
    """compact_search_tables(base_tables, delta) must leave every
    stored table row-identical to build_search_tables(base ∪ delta)
    built fresh — and the served queries must agree."""
    from invertedindexbuilder_spark.plans.build import (
        SEARCH_TABLES,
        compact_search_tables,
    )
    from invertedindexbuilder_spark.catalog import Catalog

    base = _docs(
        spark,
        [
            (0, "data join spark table"),
            (1, "data le part le part"),
            (2, "spark scan"),
        ],
    )
    delta = _docs(
        spark,
        [
            (10, "data zebra le part"),   # zebra: brand-new term
            (11, "table scan scan"),
        ],
    )
    inc_root = str(tmp_path / "inc")
    full_root = str(tmp_path / "full")
    build_search_tables(spark, base, inc_root, max_dist=1)
    counts = compact_search_tables(spark, delta, inc_root)
    assert counts["n_docs"] == 5
    assert counts["new_terms"] >= 1  # zebra

    build_search_tables(spark, base.unionByName(delta), full_root, max_dist=1)
    inc, full = (
        load_search_tables(spark, inc_root),
        load_search_tables(spark, full_root),
    )
    assert inc["n_docs"] == full["n_docs"] == 5
    for name in SEARCH_TABLES:
        got = sorted(map(tuple, inc[name].collect()))
        want = sorted(map(tuple, full[name].collect()))
        assert got == want, name

    # generation flip happened: term_dfs resolves to a .g dir
    assert ".g" in Catalog(spark, inc_root).path("term_dfs")

    # served queries agree across the two builds
    corpus = base.unionByName(delta)
    a = related_terms(None, "data", min_co_df=1, doc_terms=inc["doc_terms"],
                      dfs=inc["term_dfs"], n_docs=inc["n_docs"]).collect()
    b = related_terms(None, "data", min_co_df=1, doc_terms=full["doc_terms"],
                      dfs=full["term_dfs"], n_docs=full["n_docs"]).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b] and a
    sa = substring_search(corpus, "le part", trigrams=inc["char_trigrams"])
    sb = substring_search(corpus, "le part", trigrams=full["char_trigrams"])
    assert _rows(sa) == _rows(sb) and sa.count() > 0
    fa = fuzzy_term_match(None if False else corpus.select(
        F.explode(F.split("text", " ")).alias("term")), "zebro", 1,
        variants=inc["fuzzy_variants"])
    assert {r["term"] for r in fa.collect()} == {"zebra"}


def test_compact_search_tables_second_delta(spark, tmp_path):
    """Two successive compacts: generation numbers advance and the
    tables still equal a fresh rebuild (the pointer-flip path is
    exercised beyond g1)."""
    from invertedindexbuilder_spark.plans.build import (
        SEARCH_TABLES,
        compact_search_tables,
    )

    root = str(tmp_path / "twice")
    full_root = str(tmp_path / "full2")
    d0 = _docs(spark, [(0, "alpha beta"), (1, "beta gamma")])
    d1 = _docs(spark, [(5, "gamma delta")])
    d2 = _docs(spark, [(9, "epsilon alpha")])
    build_search_tables(spark, d0, root, max_dist=1)
    compact_search_tables(spark, d1, root)
    compact_search_tables(spark, d2, root)
    build_search_tables(
        spark, d0.unionByName(d1).unionByName(d2), full_root, max_dist=1
    )
    inc, full = (
        load_search_tables(spark, root),
        load_search_tables(spark, full_root),
    )
    assert inc["n_docs"] == full["n_docs"] == 4
    for name in SEARCH_TABLES:
        got = sorted(map(tuple, inc[name].collect()))
        want = sorted(map(tuple, full[name].collect()))
        assert got == want, name

def test_compact_search_tables_replay_raises(spark, tmp_path):
    """VERDICT r4 #4: a replayed delta (same doc_ids) must raise
    BEFORE any write — per-doc appends double-count otherwise — and
    the stored tables must be byte-identical afterwards."""
    from invertedindexbuilder_spark.plans.build import (
        SEARCH_TABLES,
        compact_search_tables,
    )

    root = str(tmp_path / "replay")
    build_search_tables(
        spark, _docs(spark, [(0, "alpha beta"), (1, "beta gamma")]), root,
        max_dist=1,
    )
    delta = _docs(spark, [(5, "gamma delta")])
    compact_search_tables(spark, delta, root)
    before = {
        name: sorted(map(tuple, t.collect()))
        for name, t in load_search_tables(spark, root).items()
        if name in SEARCH_TABLES
    }

    with pytest.raises(ValueError, match="overlap"):
        compact_search_tables(spark, delta, root)  # exact replay
    with pytest.raises(ValueError, match="overlap"):
        # partial overlap (one old id, one new) must also raise
        compact_search_tables(
            spark, _docs(spark, [(5, "gamma delta"), (9, "zeta")]), root
        )
    with pytest.raises(ValueError, match="empty delta"):
        compact_search_tables(spark, delta.filter("doc_id < 0"), root)

    after_tables = load_search_tables(spark, root)
    after = {
        name: sorted(map(tuple, t.collect()))
        for name, t in after_tables.items()
        if name in SEARCH_TABLES
    }
    assert before == after
    assert after_tables["n_docs"] == 3
    assert after_tables["max_doc_id"] == 5

    # a genuinely-new delta still goes through after the rejected ones
    compact_search_tables(spark, _docs(spark, [(9, "zeta alpha")]), root)
    assert load_search_tables(spark, root)["max_doc_id"] == 9


def test_compact_search_tables_stale_generation_reclaimed(spark, tmp_path):
    """ADVICE r4: a crash AFTER the g{N} generation-dir writes but
    BEFORE the pointer flip leaves a stale unreferenced dir; the next
    compact must overwrite it (self-heal), not die on
    'path already exists'."""
    import os

    from invertedindexbuilder_spark.plans.build import (
        SEARCH_TABLES,
        compact_search_tables,
    )

    root = str(tmp_path / "crash")
    build_search_tables(
        spark, _docs(spark, [(0, "alpha beta"), (1, "beta gamma")]), root,
        max_dist=1,
    )
    # simulate the crashed run: generation dirs written, pointer NOT
    # flipped (tables.json still resolves term_dfs to the base dir)
    spark.createDataFrame(
        [("stale", 999)], "t string, df long"
    ).write.parquet(os.path.join(root, "term_dfs.g1"))
    spark.createDataFrame(
        [(99, 1, 99)], "n_docs long, max_dist int, max_doc_id long"
    ).write.parquet(os.path.join(root, "search_stats.g1"))

    compact_search_tables(spark, _docs(spark, [(5, "gamma delta")]), root)
    served = load_search_tables(spark, root)
    assert served["n_docs"] == 3  # not the stale 99
    dfs = {r["t"]: r["df"] for r in served["term_dfs"].collect()}
    assert "stale" not in dfs and dfs["gamma"] == 2

    full_root = str(tmp_path / "crash_full")
    build_search_tables(
        spark,
        _docs(
            spark,
            [(0, "alpha beta"), (1, "beta gamma"), (5, "gamma delta")],
        ),
        full_root,
        max_dist=1,
    )
    full = load_search_tables(spark, full_root)
    for name in SEARCH_TABLES:
        assert sorted(map(tuple, served[name].collect())) == sorted(
            map(tuple, full[name].collect())
        ), name


def test_search_tables_unpartitioned_equal(spark, tmp_path):
    """partition=False (the gate/test-scale fast path: no range-
    boundary sampling jobs) must produce row-identical stored tables
    to the default range-partitioned layout, through a compact too."""
    from invertedindexbuilder_spark.plans.build import (
        SEARCH_TABLES,
        compact_search_tables,
    )

    base = _docs(spark, [(0, "data join spark"), (1, "data le part")])
    delta = _docs(spark, [(7, "zebra data scan")])
    fast_root = str(tmp_path / "fast")
    slow_root = str(tmp_path / "slow")
    build_search_tables(spark, base, fast_root, max_dist=1, partition=False)
    compact_search_tables(spark, delta, fast_root, partition=False)
    build_search_tables(spark, base, slow_root, max_dist=1)
    compact_search_tables(spark, delta, slow_root)
    fast, slow = (
        load_search_tables(spark, fast_root),
        load_search_tables(spark, slow_root),
    )
    for name in SEARCH_TABLES:
        assert sorted(map(tuple, fast[name].collect())) == sorted(
            map(tuple, slow[name].collect())
        ), name
    assert fast["n_docs"] == slow["n_docs"] == 3
    assert fast["max_doc_id"] == slow["max_doc_id"] == 7
