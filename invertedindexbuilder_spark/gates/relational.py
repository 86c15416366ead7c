"""Spark-primitive and integration gates over the TPC-H-ish tables:
rollup, tumbling windows, sessionization, as-of join, multi-table
join, the end-to-end curated corpus, and the multimodal plumbing
(SURVEY §2.2 explicit absences, demonstrated as first-class ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .shared import (
    DEDUP_CORPUS_SQL,
    JACCARD_CTES,
    JACCARD_SELECT,
    MINHASH_CTE,
    SHINGLE_CTE,
    dedup_corpus,
    lang_ctes,
    minhash_pairs,
    quality_ctes,
)


def queries() -> dict:
    def lineitem_rollup(spark, sf_dir):
        # grouping-sets primitive (reference has none, SURVEY §2.2)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        return (
            li.rollup("l_returnflag", "l_linestatus")
            .agg(
                F.count("*").alias("n_rows"),
                F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
                F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
                .alias("sum_disc_price"),
            )
            .select(
                F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
                F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
                "n_rows",
                "sum_qty",
                "sum_disc_price",
            )
        )

    def sessionize(spark, sf_dir):
        # gap-based sessionization (lag + cumulative-sum windows):
        # a >30-min silence starts a new session per user
        from pyspark.sql import Window as W

        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id",
            "user_id",
            F.col("ts").cast("timestamp").cast("long").alias("t"),
            "value",
        )
        w = W.partitionBy("user_id").orderBy("t", "event_id")
        sess = (
            ev.withColumn("prev_t", F.lag("t").over(w))
            .withColumn(
                "new_sess",
                F.when(
                    F.col("prev_t").isNull()
                    | (F.col("t") - F.col("prev_t") > 1800),
                    1,
                ).otherwise(0),
            )
            .withColumn(
                "session_id",
                F.sum("new_sess").over(
                    w.rowsBetween(W.unboundedPreceding, 0)
                ),
            )
        )
        return sess.groupBy("user_id", "session_id").agg(
            F.count("*").alias("n_events"),
            F.min("t").alias("t_start"),
            F.max("t").alias("t_end"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )

    def events_hourly(spark, sf_dir):
        # tumbling time-window aggregate (batch twin of the streaming
        # windowed_event_counts); session tz is pinned UTC so both
        # engines bucket identically
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return (
            ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 4).alias("sum_value"),
            )
            .select(
                # ts reads as TIMESTAMP_NTZ; NTZ -> LTZ is value-exact
                # under the session's pinned UTC tz, then -> epoch secs
                F.col("w.start")
                .cast("timestamp")
                .cast("long")
                .alias("window_start"),
                "event_type",
                "n_events",
                "sum_value",
            )
        )

    def curated_corpus(spark, sf_dir):
        # END-TO-END curation: near-dup removal (MinHash-LSH losers out
        # via ANTI join — §2.2 set-op/join row), language filter,
        # quality filter.  The integration shape of a training-data
        # pipeline, over the planted-duplicate corpus.
        from invertedindexbuilder_spark.functions.text import (
            lang_id,
            quality_score,
        )
        corpus = dedup_corpus(spark, sf_dir)
        pairs = minhash_pairs(spark, sf_dir)
        losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        return (
            corpus.join(losers, "doc_id", "left_anti")
            .filter(lang_id(F.col("text")) == "en")
            .filter(quality_score(F.col("text")) >= 0.9)
            .select("doc_id")
        )

    def asof_latest_order(spark, sf_dir):
        # as-of join (§2.2 'general joins'): every event gets the
        # latest order at-or-before its timestamp, per user; one
        # union + window shuffle, no range join
        from invertedindexbuilder_spark.operators.asof import (
            asof_join_latest,
        )

        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        out = asof_join_latest(
            events,
            orders,
            left_key="user_id",
            left_ts="ts",
            right_key="o_custkey",
            right_ts="o_orderdate",
            right_val="o_orderkey",
            out_val="last_orderkey",
            keep=["event_id"],
        )
        # timestamps stay out of the output: the engines agree on ts
        # COMPARISONS (both read the same parquet values) but not on a
        # portable epoch rendering
        return out.select("event_id", "user_id", "last_orderkey")

    def tpch_q3ish(spark, sf_dir):
        # multi-table join demo (§2.2): broadcast the filtered dim,
        # shuffle join the facts, aggregate, top-10
        cust = (
            spark.read.parquet(f"{sf_dir}/customer.parquet")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey")
        )
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey"
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        return (
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("l_orderkey")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
                ).alias("revenue"),
                F.count("*").alias("n_items"),
            )
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
            .limit(10)
        )

    def media_features(spark, sf_dir):
        # deterministic synthetic media (no media column exists in the
        # shared tables); the oracle is a pre-materialized expected
        # table (expected_media_features) embedded as SQL VALUES — the
        # feature VECTOR itself stays pytest-verified (not ANSI-SQL)
        from invertedindexbuilder_spark.operators.multimodal import (
            extract_features,
            synthetic_media,
        )

        return extract_features(synthetic_media(spark, 200), dim=8).select(
            "media_id", "kind", "payload_sha256", "n_bytes"
        )

    def media_frames(spark, sf_dir):
        # video frame sampling (1:N mapInPandas explode) against the
        # pre-materialized expected frame table
        from invertedindexbuilder_spark.operators.multimodal import (
            sample_frames,
            synthetic_media,
        )

        return sample_frames(synthetic_media(spark, 200), every=2).select(
            "media_id",
            "frame_idx",
            F.sha2("frame_bytes", 256).alias("frame_sha256"),
            F.length("frame_bytes").cast("long").alias("n_bytes"),
        )

    return {
        "media_features": media_features,
        "media_frames": media_frames,
        "events_hourly": events_hourly,
        "sessionize": sessionize,
        "asof_latest_order": asof_latest_order,
        "tpch_q3ish": tpch_q3ish,
        "curated_corpus": curated_corpus,
        "lineitem_rollup": lineitem_rollup,
    }


def oracle_sql() -> dict:
    from invertedindexbuilder_spark.operators.multimodal import (
        expected_media_features,
        expected_media_frames,
    )

    media_vals = ", ".join(
        f"({i}, '{k}', '{s}', {nb})"
        for i, k, s, nb in expected_media_features(200)
    )
    frame_vals = ", ".join(
        f"({i}, {fi}, '{s}', {nb})"
        for i, fi, s, nb in expected_media_frames(200, every=2)
    )
    return {
        "lineitem_rollup": (
            "SELECT coalesce(l_returnflag, 'ALL') AS returnflag, "
            "coalesce(l_linestatus, 'ALL') AS linestatus, "
            "count(*)::BIGINT AS n_rows, round(sum(l_quantity), 4) AS sum_qty, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price "
            "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
        ),
        "sessionize": (
            # floor(epoch()): DuckDB's ::BIGINT cast ROUNDS fractional
            # seconds; Spark's timestamp->long cast truncates
            "WITH ev AS (SELECT event_id, user_id, "
            "floor(epoch(ts))::BIGINT AS t, value FROM events), "
            "g AS (SELECT *, lag(t) OVER "
            "(PARTITION BY user_id ORDER BY t, event_id) AS prev_t FROM ev), "
            "s AS (SELECT *, CASE WHEN prev_t IS NULL OR t - prev_t > 1800 "
            "THEN 1 ELSE 0 END AS new_sess FROM g), "
            "sid AS (SELECT *, sum(new_sess) OVER "
            "(PARTITION BY user_id ORDER BY t, event_id "
            "ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id FROM s) "
            "SELECT user_id, session_id, count(*)::BIGINT AS n_events, "
            "min(t)::BIGINT AS t_start, max(t)::BIGINT AS t_end, "
            "round(sum(value), 4) AS sum_value "
            "FROM sid GROUP BY user_id, session_id"
        ),
        "events_hourly": (
            "SELECT epoch(time_bucket(INTERVAL 1 HOUR, ts))::BIGINT "
            "AS window_start, event_type, count(*)::BIGINT AS n_events, "
            "round(sum(value), 4) AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        "curated_corpus": (
            "WITH "
            + DEDUP_CORPUS_SQL
            + ","
            + SHINGLE_CTE
            + ","
            + MINHASH_CTE
            + ","
            + JACCARD_CTES.format(
                cand_join=(
                    "JOIN cand c ON c.doc_a = s1.doc_id AND c.doc_b = s2.doc_id"
                )
            )
            + ", pairs AS ("
            + JACCARD_SELECT.format(tau=0.6)
            + "), losers AS (SELECT DISTINCT doc_b AS doc_id FROM pairs), "
            + lang_ctes("dd")
            + ", "
            + quality_ctes("dd")
            + " SELECT d.doc_id FROM dd d "
            "JOIN lang l ON l.doc_id = d.doc_id "
            "JOIN qual q ON q.doc_id = d.doc_id "
            "WHERE l.lang_pred = 'en' AND q.quality >= 0.9 "
            "AND d.doc_id NOT IN (SELECT doc_id FROM losers)"
        ),
        "asof_latest_order": (
            "WITH m AS (SELECT e.event_id, e.user_id, "
            "max(o.o_orderdate) AS last_ts "
            "FROM events e JOIN orders o ON o.o_custkey = e.user_id "
            "AND o.o_orderdate <= e.ts GROUP BY 1, 2) "
            "SELECT m.event_id, m.user_id, "
            "max(o.o_orderkey)::BIGINT AS last_orderkey "
            "FROM m JOIN orders o ON o.o_custkey = m.user_id "
            "AND o.o_orderdate = m.last_ts GROUP BY 1, 2"
        ),
        "tpch_q3ish": (
            "SELECT l_orderkey, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue, "
            "count(*)::BIGINT AS n_items "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON c_custkey = o_custkey "
            "WHERE c_mktsegment = 'BUILDING' GROUP BY l_orderkey "
            "ORDER BY revenue DESC, l_orderkey LIMIT 10"
        ),
        "media_features": (
            "SELECT media_id::BIGINT AS media_id, kind, payload_sha256, "
            "n_bytes::BIGINT AS n_bytes "
            f"FROM (VALUES {media_vals}) "
            "t(media_id, kind, payload_sha256, n_bytes)"
        ),
        "media_frames": (
            "SELECT media_id::BIGINT AS media_id, frame_idx::BIGINT AS "
            "frame_idx, frame_sha256, n_bytes::BIGINT AS n_bytes "
            f"FROM (VALUES {frame_vals}) "
            "t(media_id, frame_idx, frame_sha256, n_bytes)"
        ),
    }
