"""Honest ANN evaluation: the pruned single-cell IVF probe trades
recall for scan fraction — measure both against exact search on the
shared embeddings fixture (ANN quality is recall-vs-cost, not a hash
match; the gate's ann_ivf_probe1 entry separately pins the pruned
path's exact output)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from invertedindexbuilder_spark.operators.similarity import (
    cosine_topk,
    grid_cell_expr,
    ivf_topk,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_ivf_recall_vs_scan_fraction(spark, embeddings):
    """Single-probe prunes hardest; Hamming-1 multi-probe (the standard
    LSH recall knob) buys recall back.  The fixture vectors are
    near-random (max cosine ~0.37), the WORST case for any LSH — so the
    bounds below are what honest pruning delivers there, not a tuned
    showcase (measured: 0.2 @ 1 probe, 0.6 @ 5 probes)."""
    k = 10
    exact = {
        r["vec_id"]
        for r in cosine_topk(embeddings, query_vec_id=0, k=k).collect()
    }
    n_total = embeddings.count()
    with_cell = embeddings.withColumn(
        "_c", grid_cell_expr(F.col("embedding"), 4)
    )
    qcell = with_cell.filter(F.col("vec_id") == 0).collect()[0]["_c"]
    n_scanned = with_cell.filter(F.col("_c") == qcell).count()
    assert n_scanned < n_total / 4  # single probe really prunes

    def recall(n_probes):
        got = {
            r["vec_id"]
            for r in ivf_topk(
                embeddings, query_vec_id=0, k=k, n_probes=n_probes
            ).collect()
        }
        return len(exact & got) / k

    from invertedindexbuilder_spark.operators.similarity import probe_ring

    assert probe_ring(int(qcell), 4, 5) == [
        qcell, qcell ^ 1, qcell ^ 2, qcell ^ 4, qcell ^ 8
    ]
    r1 = recall(1)
    r5 = recall(5)
    assert r1 >= 0.1  # beats the 1/16 random-cell baseline
    assert r5 >= r1 + 0.2  # multi-probe materially recovers recall
    print(f"recall@{k}: 1 probe={r1:.2f}, 5 probes={r5:.2f}, "
          f"scan={n_scanned}/{n_total}")


def test_ivf_probe_all_equals_exact(spark, embeddings):
    k = 10
    exact = [
        (r["vec_id"], r["cosine"])
        for r in cosine_topk(embeddings, query_vec_id=0, k=k).collect()
    ]
    probed = [
        (r["vec_id"], r["cosine"])
        for r in ivf_topk(
            embeddings, query_vec_id=0, k=k, probe_all=True
        ).collect()
    ]
    assert exact == probed
