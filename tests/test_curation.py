"""Hand-computed oracles for the corpus-curation operators
(operators/curation.py, functions/text.py PII helpers).  The
cross-engine DuckDB twins are exercised by the gate harness
(scripts/check_entry.py entries repetition_stats / top_bigrams /
decontaminate / pii_scrub / source_dup_stats)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from invertedindexbuilder_spark.functions.text import (
    pii_email_count,
    pii_phone_count,
    redact_pii,
)
from invertedindexbuilder_spark.operators.curation import (
    decontaminate,
    repetition_stats,
    source_dup_stats,
    top_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_hand(spark):
    out = {
        r["doc_id"]: r
        for r in repetition_stats(
            _docs(
                spark,
                [
                    (0, "a a b"),
                    (1, ""),
                    (2, "solo"),
                    (3, "x y x y x y"),
                ],
            )
        ).collect()
    }
    assert out[0]["n_words"] == 3 and out[0]["n_distinct_words"] == 2
    assert out[0]["dup_word_frac"] == pytest.approx(1 - 2 / 3, abs=1e-6)
    # bigrams of (a,a,b): "a a", "a b" -> top fraction 1/2
    assert out[0]["top_bigram_frac"] == 0.5
    assert out[1]["n_words"] == 0 and out[1]["dup_word_frac"] == 0.0
    assert out[1]["top_bigram_frac"] == 0.0
    assert out[2]["n_words"] == 1 and out[2]["top_bigram_frac"] == 0.0
    # (x,y)*3: bigrams x y, y x, x y, y x, x y -> "x y" 3 of 5
    assert out[3]["dup_word_frac"] == pytest.approx(1 - 2 / 6, abs=1e-6)
    assert out[3]["top_bigram_frac"] == 0.6


def test_top_ngrams_order_and_counts(spark):
    rows = top_ngrams(
        _docs(spark, [(0, "a b a b c"), (1, "a b zz")]), n=2, k=3
    ).collect()
    # counts: "a b" 3, "b a" 1, "b c" 1, "b zz" 1 -> ties by string
    assert [(r["ngram"], r["n_occurrences"]) for r in rows] == [
        ("a b", 3),
        ("b a", 1),
        ("b c", 1),
    ]


def test_decontaminate_hand(spark):
    bench = _docs(spark, [(100, "one two three four")])
    # doc 0: trigrams {one two three, two three four, three four five}
    #        -> 2 of 3 in bench -> 0.666667, flagged at tau=0.5
    # doc 1: no overlap; doc 2: too short for any trigram
    docs = _docs(
        spark,
        [(0, "one two three four five"), (1, "q w e r t"), (2, "hi there")],
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=3).collect()}
    assert out[0]["n_shingles"] == 3 and out[0]["n_hit"] == 2
    assert out[0]["contamination"] == pytest.approx(0.666667)
    assert out[0]["contaminated"] == 1
    assert out[1]["n_hit"] == 0 and out[1]["contaminated"] == 0
    assert out[2]["n_shingles"] == 0 and out[2]["contamination"] == 0.0


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (0, "mail a.user+x@sub.example.org or b@c.io now"),
            (1, "call 555-0001-1234 or 999-8888-7777"),
            (2, "clean text only"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            pii_email_count(F.col("text")).alias("ne"),
            pii_phone_count(F.col("text")).alias("np"),
            redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert out[0]["ne"] == 2 and out[0]["np"] == 0
    assert out[0]["red"] == "mail <EMAIL> or <EMAIL> now"
    assert out[1]["np"] == 2
    assert out[1]["red"] == "call <PHONE> or <PHONE>"
    assert out[2]["red"] == "clean text only"
    # redaction is idempotent: placeholders match neither pattern
    red = df.select(redact_pii(redact_pii(F.col("text"))).alias("r")).collect()
    assert red[0]["r"].count("<EMAIL>") == 2


def test_source_dup_stats_hand(spark):
    df = spark.createDataFrame(
        [
            ("s1", "shared content"),
            ("s1", "only in s1"),
            ("s2", "shared content"),
            ("s2", "also only s2"),
            ("s2", "another s2"),
        ],
        "source string, text string",
    )
    out = {r["source"]: r for r in source_dup_stats(df).collect()}
    assert out["s1"]["n_docs"] == 2 and out["s1"]["n_cross_dup"] == 1
    assert out["s1"]["cross_dup_frac"] == 0.5
    assert out["s2"]["n_docs"] == 3 and out["s2"]["n_cross_dup"] == 1
    assert out["s2"]["cross_dup_frac"] == pytest.approx(0.333333)


def test_same_source_exact_dup_not_cross(spark):
    """Duplicates WITHIN one source don't count as cross-source."""
    df = spark.createDataFrame(
        [("s1", "dup"), ("s1", "dup"), ("s2", "unique")],
        "source string, text string",
    )
    out = {r["source"]: r for r in source_dup_stats(df).collect()}
    assert out["s1"]["n_cross_dup"] == 0 and out["s2"]["n_cross_dup"] == 0


def test_unigram_cross_entropy_hand(spark):
    import math

    from invertedindexbuilder_spark.operators.curation import (
        unigram_cross_entropy,
    )

    # corpus: tokens a a a b  -> p(a)=3/4, p(b)=1/4
    out = {
        r["doc_id"]: r
        for r in unigram_cross_entropy(
            _docs(spark, [(0, "a a a"), (1, "b"), (2, "")])
        ).collect()
    }
    assert set(out) == {0, 1}  # token-less doc absent
    assert out[0]["n_tokens"] == 3
    assert out[0]["xent"] == pytest.approx(-math.log2(3 / 4), abs=1e-6)
    # the rare-token doc scores HIGHER (more surprising)
    assert out[1]["xent"] == pytest.approx(-math.log2(1 / 4), abs=1e-6)
    assert out[1]["xent"] > out[0]["xent"]
