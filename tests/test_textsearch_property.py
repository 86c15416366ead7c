"""Property-based cross-checks: substring_search and phrase_match vs
plain-Python oracles on randomized corpora (hypothesis drives the
corpus; one Spark job per example batch would be slow, so examples are
BATCHED into a single DataFrame per property run)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from invertedindexbuilder_spark.operators.textsearch import (
    phrase_match,
    substring_search,
)

# small alphabet: collisions and overlaps actually happen
_TEXT = st.text(alphabet="ab x", min_size=0, max_size=40)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_TEXT, min_size=1, max_size=8), needle=st.sampled_from(
    ["a", "ab", "aba", "b a", "ab a", "x ab"]
))
def test_substring_matches_python_count(spark, texts, needle):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in substring_search(docs, needle).collect()
    }
    want = {
        i: t.count(needle) for i, t in enumerate(texts) if t.count(needle) > 0
    }
    assert got == want


def _phrase_count(tokens: list[str], phrase: list[str]) -> int:
    n = 0
    for i in range(len(tokens) - len(phrase) + 1):
        if tokens[i : i + len(phrase)] == phrase:
            n += 1
    return n


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(["a", "b", "ab", "c"]), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    ),
    phrase=st.sampled_from([["a"], ["a", "b"], ["a", "a"], ["ab", "c", "a"]]),
)
def test_phrase_matches_python_scan(spark, texts, phrase):
    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(texts)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_match(docs, " ".join(phrase)).collect()
    }
    want = {
        i: _phrase_count(toks, phrase)
        for i, toks in enumerate(texts)
        if _phrase_count(toks, phrase) > 0
    }
    assert got == want
