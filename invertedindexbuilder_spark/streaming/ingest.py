"""Structured Streaming ingestion: incremental postings from a stream
of new documents, and watermarked event-window aggregation.

The reference engine is strictly batch (SURVEY §2.2 — one immutable
corpus, one index); these operators extend it the way a production
corpus actually grows: new files land, get tokenized incrementally,
and periodic compaction folds the postings delta into the index (the
batch `plans.build` re-run over the union — index blocks are
immutable, so compaction is append-and-re-encode of touched terms
only at scale).

foreachBatch (not a plain sink) because each micro-batch reuses the
batch tokenizer operator unchanged — one code path for batch and
streaming, which is the point of the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from invertedindexbuilder_spark.operators.postings import build_postings
from invertedindexbuilder_spark.schemas import DOCS_SRC


def stream_docs_src(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of docs_src parquet drops."""
    return (
        spark.readStream.schema(DOCS_SRC)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def incremental_postings(
    docs_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Tokenize each micro-batch with the SAME batch operator and append
    to a postings-delta table.  doc_id here is a content-stable key
    (xxhash64 of repo/path/commit) rather than the batch build's dense
    rank — dense ranks need the whole corpus, which a stream by
    definition doesn't have; compaction remaps to dense ids.
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.withColumn(
            "doc_id", F.xxhash64("repo", "path", "commit")
        )
        postings = build_postings(docs)
        postings.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    writer = (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregate over an event stream
    (ts, event_type, value) — late data beyond the watermark is
    dropped, state is bounded."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
