"""benchmetrics: the bench instrumentation must actually see reads.

The whole point (VERDICT r6 #2) is that Spark's task inputMetrics are
blind to vectorized local-file parquet reads — so pin that the /proc
meter is NOT: a parquet scan through the session JVM must move rchar by
at least the data it scanned."""

from __future__ import annotations

from invertedindexbuilder_spark.benchmetrics import (
    JvmIOMeter,
    cpu_canary,
    cpu_canary_mt,
    drop_page_cache,
)


def test_canaries_run_and_are_positive():
    c1 = cpu_canary(reps=1)
    c8 = cpu_canary_mt(threads=2, reps=1)
    assert c1 > 0 and c8 > 0


def test_jvm_io_meter_sees_parquet_scan(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(0, 200_000).selectExpr(
        "id", "cast(id * 2.5 as double) as v"
    ).write.parquet(path)

    io = JvmIOMeter()
    assert io.pids, "session JVM not found among descendant processes"
    io.delta()
    spark.read.parquet(path).selectExpr("sum(v)").collect()
    d = io.delta()
    # the v column alone is ~1.6 MB on disk; any miss (footer-only
    # accounting, the inputMetrics blindness) reads orders less
    assert d["rchar"] > 200_000, d
    # physical reads may legitimately be 0 (page cache) — only shape
    assert d["read_bytes"] >= 0


def test_drop_page_cache_is_best_effort():
    # returns a bool either way; must never raise
    assert drop_page_cache() in (True, False)
