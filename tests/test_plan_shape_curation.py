"""Physical-plan pins for the curation / search operators' scale
properties: the benchmark side of decontamination must BROADCAST (a
shuffled bench join at 100 TB would dominate the pipeline), and a
substring query against a MATERIALIZED trigram index must push the
needle-trigram filter into the parquet scan (that pushdown is the
entire point of the index)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from invertedindexbuilder_spark.operators.curation import decontaminate
from invertedindexbuilder_spark.operators.textsearch import (
    char_trigram_postings,
    substring_search,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta token"), F.col("id").cast("string")).alias(
            "text"
        ),
    )


def test_decontaminate_bench_side_broadcasts(spark):
    docs = _docs(spark)
    bench = _docs(spark, 10)
    plan = _plan(decontaminate(docs, bench, n=3))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # the doc-side shingle frame must NOT be broadcast: the only
    # broadcast build side is the distinct bench-shingle projection
    assert plan.count("BroadcastExchange") <= 2  # bench join + final left join


def test_decontaminate_shuffle_off_switch(spark):
    plan = _plan(
        decontaminate(_docs(spark), _docs(spark, 10), n=3, broadcast_bench=False)
    )
    # without the hint the bench join may legitimately shuffle — the
    # knob exists for a huge reference set; just assert it still plans
    assert "Join" in plan


def test_substring_pushes_trigram_filter_to_scan(spark, tmp_path):
    """With a materialized trigram index, the needle's trigram IN-list
    must reach the parquet scan as a pushed filter — only index files
    holding those trigrams are read at scale."""
    root = str(tmp_path / "tg")
    docs = _docs(spark)
    char_trigram_postings(docs).write.parquet(root)
    tg = spark.read.parquet(root)
    out = substring_search(docs, "alpha bet", trigrams=tg)
    plan = _plan(out)
    assert "PushedFilters" in plan and "In(trigram" in plan.replace(" ", "")
    # and the result is still exact
    assert out.count() == docs.count()


def test_phrase_join_keys_are_doc_and_position(spark):
    from invertedindexbuilder_spark.operators.textsearch import phrase_match

    plan = _plan(phrase_match(_docs(spark), "alpha beta"))
    # no cartesian/broadcast-nested-loop fallback: equi-join only
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_unigram_xent_counts_join_broadcasts(spark):
    """VERDICT r3 #3: the occurrence->counts join-back keys a
    corpus-scale frame on the Zipf-skewed token column; with a planted
    hot token the counts side must be BROADCAST (vocab fits) so the
    hot key never shuffles.  Forcing broadcast_counts=False is the
    documented too-big-vocab fallback (AQE skew join)."""
    from invertedindexbuilder_spark.operators.curation import (
        unigram_cross_entropy,
    )

    hot = spark.range(200).select(
        F.col("id").alias("doc_id"),
        # every doc repeats the same hot token (a stopword at scale)
        F.concat(
            F.lit("common common common common tok"),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    out = unigram_cross_entropy(hot)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    # correctness unchanged by the join strategy (without the hint
    # Catalyst may still pick broadcast at this tiny size — the point
    # of the explicit hint is to keep that guarantee when the counts
    # frame exceeds autoBroadcastJoinThreshold but fits memory)
    forced = unigram_cross_entropy(hot, broadcast_counts=False)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, forced.collect())
    )
    # the auto decision flips off above the BYTE limit (ADVICE r4:
    # sized by estimated broadcast bytes, not row count)
    tiny_limit = unigram_cross_entropy(hot, broadcast_bytes_limit=1)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, tiny_limit.collect())
    )
