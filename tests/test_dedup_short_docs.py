"""Sub-n-gram guard (ADVICE r1 high): docs shorter than the shingle /
winnow gram size must yield EMPTY gram sets, not a descending
sequence(1,0) crash — and must agree with the SQL oracle's empty
generate_series(1,0)."""

from __future__ import annotations

import pytest

from invertedindexbuilder_spark.operators.dedup import (
    doc_shingles,
    minhash_dedup,
    winnow_fingerprints,
)

SHORT = [
    (1, ""),
    (2, "one"),
    (3, "only two"),
    (4, "three short tokens"),
    (5, "exactly five tokens are here"),
    (6, "nine little tokens walk across the bridge every day"),
]


@pytest.fixture(scope="module")
def short_docs(spark):
    return spark.createDataFrame(SHORT, "doc_id long, text string")


def test_shingles_empty_below_n(short_docs):
    counts = {
        r["doc_id"]: r["n"]
        for r in doc_shingles(short_docs, n=3)
        .groupBy("doc_id")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    # docs 1..3 have < 3 tokens -> no shingle rows at all
    assert 1 not in counts and 2 not in counts and 3 not in counts
    assert counts[4] == 1  # exactly one 3-gram
    assert counts[5] == 3
    assert counts[6] == 7


def test_winnow_empty_below_k(short_docs):
    fps = winnow_fingerprints(short_docs, k=5, window=4)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in fps.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()
    }
    # < k tokens -> no grams; k tokens -> 1 gram but no FULL window
    for did in (1, 2, 3, 4, 5):
        assert did not in per_doc
    # 9 tokens -> 5 grams -> full windows at pos 0,1 -> 1..2 fingerprints
    assert 1 <= per_doc[6] <= 2


def test_minhash_hash_modes_find_same_pairs(spark):
    """'xxhash' (production fast path) and 'md5' (oracle mode) differ
    only in candidate hashing; the exact-Jaccard verify makes the final
    pair sets identical on planted near-dups."""
    rows = []
    for i in range(30):
        body = " ".join(f"w{i}x{t}" for t in range(40))
        rows.append((i, body))
        if i < 5:
            rows.append((1000 + i, body + " extra tail token"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    expect = [(i, 1000 + i) for i in range(5)]
    for mode in ("md5", "xxhash"):
        got = sorted(
            (r["doc_a"], r["doc_b"])
            for r in minhash_dedup(docs, threshold=0.7, hash_mode=mode).collect()
        )
        assert got == expect, mode


def test_minhash_dedup_survives_short_docs(spark, short_docs):
    dup = spark.createDataFrame(
        [(100, "nine little tokens walk across the bridge every day")],
        "doc_id long, text string",
    )
    out = minhash_dedup(short_docs.unionAll(dup), threshold=0.9).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in out] == [(6, 100)]
