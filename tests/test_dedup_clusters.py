"""Connected components / transitive dedup clusters
(operators/dedup.py connected_components, dedup_clusters)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from invertedindexbuilder_spark.operators.dedup import (
    connected_components,
    dedup_clusters,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def _cc(spark, edges):
    return {
        r["doc_id"]: r["cluster"]
        for r in connected_components(_pairs(spark, edges)).collect()
    }


def test_chain_merges_transitively(spark):
    # pairwise rules would never link 1 and 4; the chain must
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    n = 20
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0} and len(got) == n + 1


def test_components_independent_and_order_free(spark):
    got = _cc(spark, [(5, 9), (9, 2), (7, 8), (3, 3)])
    assert got[5] == got[9] == got[2] == 2
    assert got[7] == got[8] == 7
    assert got[3] == 3


def test_max_iter_guard(spark):
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(
            _pairs(spark, [(i, i + 1) for i in range(12)]), max_iter=2
        )


def test_dedup_clusters_planted_triples(spark):
    # 0..2 with exact (+100) and near (+200 suffix) copies -> clusters
    # {i, i+100, i+200}, keep = the original
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon",
        "one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen sixteen",
        "red orange yellow green blue indigo violet cyan magenta "
        "black white gray silver gold bronze copper",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    rows += [(i + 100, t) for i, t in enumerate(texts)]
    # ONE appended token keeps shingle-jaccard ~0.93: high enough that
    # the 4x4 banding deterministically collides every planted pair
    # (a longer suffix dropped pair (1, 201) to 0.76 — legitimate LSH
    # recall loss, wrong fixture for a clustering test)
    rows += [(i + 200, t + " zzz") for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["cluster"], r["keep"])
        for r in dedup_clusters(docs, threshold=0.5).collect()
    }
    for i in range(3):
        assert out[i] == (i, 1)
        assert out[i + 100] == (i, 0)
        assert out[i + 200] == (i, 0)
    assert len(out) == 9
