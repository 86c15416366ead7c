"""As-of join semantics: latest right row at-or-before each left ts,
per key; ties and no-match rows pinned explicitly, plus a randomized
cross-check against pandas.merge_asof (an independent implementation
of the same point-in-time semantics)."""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd

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


def test_asof_join_matches_pandas_merge_asof(spark):
    rng = np.random.default_rng(7)
    t0 = datetime(2024, 1, 1)
    ev = pd.DataFrame(
        {
            "event_id": np.arange(200, dtype=np.int64),
            "user_id": rng.integers(0, 8, 200),
            "ts": [t0 + timedelta(seconds=int(s)) for s in rng.integers(0, 50_000, 200)],
        }
    )
    od = pd.DataFrame(
        {
            "o_orderkey": np.arange(1000, 1080, dtype=np.int64),
            "o_custkey": rng.integers(0, 8, 80),
            "o_orderdate": [
                t0 + timedelta(seconds=int(s)) for s in rng.integers(0, 50_000, 80)
            ],
        }
    )
    got = (
        asof_join_latest(
            spark.createDataFrame(ev),
            spark.createDataFrame(od),
            left_key="user_id",
            left_ts="ts",
            right_key="o_custkey",
            right_ts="o_orderdate",
            right_val="o_orderkey",
            out_val="last_orderkey",
            keep=["event_id"],
        )
        .toPandas()
        .set_index("event_id")["last_orderkey"]
        .sort_index()
    )
    # independent oracle: dedup right per (key, ts) keeping max value,
    # then backward merge_asof (includes exact-ts matches, like ours)
    od2 = (
        od.groupby(["o_custkey", "o_orderdate"], as_index=False)["o_orderkey"]
        .max()
        .sort_values("o_orderdate")
    )
    want = pd.merge_asof(
        ev.sort_values("ts"),
        od2,
        left_on="ts",
        right_on="o_orderdate",
        left_by="user_id",
        right_by="o_custkey",
        direction="backward",
    ).dropna(subset=["o_orderkey"])
    want = want.set_index("event_id")["o_orderkey"].astype("int64").sort_index()
    pd.testing.assert_series_equal(
        got, want, check_names=False, check_dtype=False
    )
