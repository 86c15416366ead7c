"""Distributed k-means (Lloyd's) + trained-IVF ANN
(operators/similarity.py kmeans_fit / kmeans_cell_expr /
ivf_kmeans_topk).

Fixture vectors use small-integer components so double partial sums
are EXACT under any reduction order — partition-count invariance of
the fit is then an equality check, not a tolerance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from invertedindexbuilder_spark.operators.similarity import (
    cosine_topk,
    ivf_kmeans_topk,
    kmeans_cell_expr,
    kmeans_fit,
)

# three well-separated clusters around (0,0,..), (10,10,..), (-10,0,..)
_CENTERS = [[0, 0, 0, 0], [10, 10, 10, 10], [-10, 0, -10, 0]]


def _clustered(spark, per_cluster=20, n_parts=4):
    rows = []
    vid = 0
    for ci, c in enumerate(_CENTERS):
        for j in range(per_cluster):
            # deterministic small-int jitter in [-2, 2]
            vec = [
                float(c[d] + ((vid * 7 + d * 3 + j) % 5) - 2)
                for d in range(len(c))
            ]
            rows.append((vid, vec, ci))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, true_cluster int"
    ).repartition(n_parts)


def test_kmeans_recovers_planted_clusters(spark):
    df = _clustered(spark)
    cents = kmeans_fit(df, k=3, iters=5)
    # each learned centroid sits within jitter range of one true center
    matched = set()
    for c in cents:
        best = min(
            range(len(_CENTERS)),
            key=lambda i: sum((a - b) ** 2 for a, b in zip(c, _CENTERS[i])),
        )
        d = sum((a - b) ** 2 for a, b in zip(c, _CENTERS[best]))
        assert d < 3 * (2**2) * len(_CENTERS[0])
        matched.add(best)
    assert matched == {0, 1, 2}


def test_kmeans_partition_invariant(spark):
    a = kmeans_fit(_clustered(spark, n_parts=2), k=3, iters=4)
    b = kmeans_fit(_clustered(spark, n_parts=7), k=3, iters=4)
    assert a == b  # exact: integer-valued sums are order-independent


def test_cell_assignment_matches_true_clusters(spark):
    df = _clustered(spark)
    cents = kmeans_fit(df, k=3, iters=5)
    # learned cell ids are a permutation of true cluster ids; every
    # vector of one true cluster must land in ONE learned cell
    rows = df.select(
        "true_cluster",
        kmeans_cell_expr(F.col("embedding"), cents).alias("cell"),
    ).collect()
    mapping: dict[int, int] = {}
    for r in rows:
        assert mapping.setdefault(r["true_cluster"], r["cell"]) == r["cell"]
    assert len(set(mapping.values())) == 3


def test_probe_all_equals_bruteforce(spark):
    df = _clustered(spark)
    got = ivf_kmeans_topk(
        df, query_vec_id=5, k=10, n_cells=3, iters=3, probe_all=True
    ).collect()
    want = cosine_topk(df, query_vec_id=5, k=10).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == [
        (r["vec_id"], r["cosine"]) for r in want
    ]


def test_single_probe_full_recall_on_clustered_data(spark):
    """With well-separated clusters, probing ONLY the query's cell
    still returns the exact global top-k (all true neighbors share the
    cell) — the scan touched 1/3 of the data.  This is the trained-IVF
    value proposition the sign-grid cannot give on non-axis-aligned
    clusters."""
    df = _clustered(spark)
    cents = kmeans_fit(df, k=3, iters=5)
    got = ivf_kmeans_topk(
        df, query_vec_id=25, k=10, centroids=cents, n_probes=1
    ).collect()
    want = cosine_topk(df, query_vec_id=25, k=10).collect()
    got_ids = [r["vec_id"] for r in got]
    want_ids = [r["vec_id"] for r in want]
    assert got_ids == want_ids


def test_more_clusters_than_data_groups(spark):
    """k exceeding the natural cluster count must not crash: empty
    cells keep their init centroid."""
    df = _clustered(spark, per_cluster=4)
    cents = kmeans_fit(df, k=5, iters=3)
    assert len(cents) == 5
    out = ivf_kmeans_topk(
        df, query_vec_id=0, k=5, centroids=cents, probe_all=True
    ).collect()
    assert len(out) == 5


def test_k_exceeds_corpus_raises(spark):
    df = _clustered(spark, per_cluster=1)  # 3 vectors
    with pytest.raises(ValueError, match="only 3 vectors"):
        kmeans_fit(df, k=10, iters=1)
