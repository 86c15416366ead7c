"""Deterministic stratified sampling: exact reproducibility across
partitionings and per-stratum rates within statistical tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F

from invertedindexbuilder_spark.operators.sampling import stratified_sample

RATES = {"a": 0.5, "b": 0.2}


def _corpus(spark, n_parts):
    return spark.range(0, 30_000, 1, n_parts).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("stratum"),
    )


def test_rates_and_determinism(spark):
    kept = stratified_sample(
        _corpus(spark, 8), "doc_id", "stratum", RATES, default_rate=0.05
    )
    counts = {
        r["stratum"]: r["n"]
        for r in kept.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    # 10k docs per stratum; hash-threshold keeps within ~3 sigma
    assert abs(counts["a"] - 5000) < 400
    assert abs(counts["b"] - 2000) < 400
    assert abs(counts.get("c", 0) - 500) < 300

    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(
            _corpus(spark, 3), "doc_id", "stratum", RATES, default_rate=0.05
        ).collect()
    )
    assert a == b  # same rows kept under ANY partitioning


def test_zero_and_full_rates(spark):
    kept = stratified_sample(
        _corpus(spark, 4), "doc_id", "stratum", {"a": 1.0, "b": 0.0},
        default_rate=0.0,
    )
    strata = {r["stratum"] for r in kept.select("stratum").distinct().collect()}
    assert strata == {"a"}
    assert kept.count() == 10_000
