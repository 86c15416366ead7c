"""As-of join semantics: latest right row at-or-before each left ts,
per key; ties and no-match rows pinned explicitly."""

from __future__ import annotations

from datetime import datetime

from invertedindexbuilder_spark.operators.asof import asof_join_latest


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_latest_semantics(spark):
    events = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-05")),  # after two orders -> latest wins
            (2, 10, _ts("2024-01-01")),  # exactly AT an order ts -> counts
            (3, 10, _ts("2023-12-31")),  # before any order -> dropped
            (4, 20, _ts("2024-06-01")),  # tie: two orders same day -> max key
            (5, 30, _ts("2024-06-01")),  # key with no orders -> dropped
        ],
        "event_id long, user_id long, ts timestamp",
    )
    orders = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01")),
            (101, 10, _ts("2024-01-03")),
            (200, 20, _ts("2024-05-30")),
            (201, 20, _ts("2024-05-30")),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    got = {
        r["event_id"]: r["last_orderkey"]
        for r in asof_join_latest(
            events,
            orders,
            left_key="user_id",
            left_ts="ts",
            right_key="o_custkey",
            right_ts="o_orderdate",
            right_val="o_orderkey",
            out_val="last_orderkey",
            keep=["event_id"],
        ).collect()
    }
    assert got == {1: 101, 2: 100, 4: 201}
