"""streaming_curate: stateless filter stages + stateful cross-batch
first-seen dedup, with survivor parity against the batch curation plan
(near-dup excepted — that stage is compaction-time batch by design)."""

from __future__ import annotations

from pyspark.sql import functions as F

from invertedindexbuilder_spark.catalog import Catalog
from invertedindexbuilder_spark.plans.curate import curate
from invertedindexbuilder_spark.schemas import DOCS_SRC
from invertedindexbuilder_spark.streaming.ingest import (
    stream_docs_src,
    streaming_curate,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and keeps running "
    "through the field with steady effort and calm focus every day"
)
ROWS = [
    # (path, content) — repo/commit/lang fixed; batch-2 rows land later
    ("a000", GOOD),
    ("a001", "der und die das ist gut " * 8),      # lang=de
    ("a002", "the " + "!" * 40),                    # quality
    ("a003", ("the " * 40).strip()),                # repetition
    ("a004", GOOD + " different tail for doc four"),
]
DUP_ROWS = [
    ("b000", GOOD),                                  # cross-batch exact dup
    ("b001", "fresh second batch content with the usual calm focus"),
]


def _write_drop(spark, path, rows):
    spark.createDataFrame(
        [("r", p, "c", "txt", t) for p, t in rows], DOCS_SRC
    ).write.mode("append").parquet(path)


def test_streaming_curate_filters_and_cross_batch_dedup(spark, tmp_path):
    drops = str(tmp_path / "drops")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write_drop(spark, drops, ROWS)
    _write_drop(spark, drops, DUP_ROWS)

    curated = streaming_curate(
        stream_docs_src(spark, drops),
        langs=["en"],
        min_quality=0.2,
        max_dup_word_frac=0.9,
    )
    q = (
        curated.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    paths = sorted(r["path"] for r in got.collect())
    # a001/a002/a003 filtered stateless; GOOD emits once (a000 or b000,
    # whichever micro-batch the state saw first)
    assert len(paths) == 3
    assert "a004" in paths and "b001" in paths
    assert ("a000" in paths) != ("b000" in paths)
    # exactly one row per distinct sha
    assert got.select("content_sha256").distinct().count() == 3


def test_streaming_survivors_match_batch_keep_list(spark, tmp_path):
    """Same corpus, same knobs (near-dup off): the streaming survivors'
    content set equals the batch plan's keep_list content set."""
    drops = str(tmp_path / "drops")
    _write_drop(spark, drops, ROWS)
    _write_drop(spark, drops, DUP_ROWS)
    src = spark.read.parquet(drops)

    croot = str(tmp_path / "cur")
    curate(
        spark, src, croot,
        langs=["en"], min_quality=0.2, max_dup_word_frac=0.9,
        near_dup_threshold=None,
    )
    keep = Catalog(spark, croot).read("keep_list")
    from invertedindexbuilder_spark.operators.docids import (
        SORT_KEYS,
        attach_doc_ids,
        doc_id_map,
    )

    ids, total = doc_id_map(src.select(*SORT_KEYS))
    batch_shas = {
        r["sha"]
        for r in attach_doc_ids(src, ids, total)
        .join(keep, "doc_id", "left_semi")
        .select(F.sha2(F.coalesce("content", F.lit("")), 256).alias("sha"))
        .collect()
    }

    out, ckpt = str(tmp_path / "o2"), str(tmp_path / "k2")
    q = (
        streaming_curate(
            stream_docs_src(spark, drops),
            langs=["en"], min_quality=0.2, max_dup_word_frac=0.9,
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_shas = {
        r["content_sha256"] for r in spark.read.parquet(out).collect()
    }
    assert stream_shas == batch_shas
