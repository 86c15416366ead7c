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


# n_dups_in_first_batch: duplicates observed ALONGSIDE the emitted first
# occurrence (same micro-batch only).  The cumulative duplicate count
# lives in the keyed STATE (n_seen); later-batch duplicates mutate state
# but are never re-emitted (append output mode emits each key once).
FIRST_SEEN_OUT = (
    "content_sha256 string, repo string, path string, commit string, "
    "n_dups_in_first_batch long"
)


def streaming_first_seen(docs_stream: DataFrame) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState):
    exact dedup across micro-batches — emit each distinct content
    exactly once, the first time it is seen, and keep a per-content
    duplicate counter in state.

    The batch engine's exact dedup (dedup.exact_duplicate_groups) needs
    the whole corpus; a stream by definition doesn't have it, so the
    seen-set lives in Spark's keyed state store, partitioned by the
    content hash — state per key is one counter, bounded and
    shuffle-partition-parallel at any corpus size.  This is the
    applyInPandasWithState primitive the reference (strictly batch,
    SURVEY §2.2) has no analog for.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def first_seen(key, pdf_iter, state: GroupState):
        import pandas as pd  # executor-side

        n_before = state.get[0] if state.exists else 0
        n_new = 0
        first_row = None
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            if first_row is None and n_before == 0:
                first_row = pdf.iloc[0]
            n_new += len(pdf)
        state.update((n_before + n_new,))
        if first_row is not None:
            yield pd.DataFrame(
                {
                    "content_sha256": [key[0]],
                    "repo": [first_row["repo"]],
                    "path": [first_row["path"]],
                    "commit": [first_row["commit"]],
                    # duplicates BESIDE the emitted first occurrence;
                    # later-batch dups only mutate state (emit-once)
                    "n_dups_in_first_batch": [n_new - 1],
                }
            )

    keyed = docs_stream.withColumn(
        "content_sha256", F.sha2(F.coalesce(F.col("content"), F.lit("")), 256)
    ).groupBy("content_sha256")
    return keyed.applyInPandasWithState(
        first_seen,
        outputStructType=FIRST_SEEN_OUT,
        stateStructType="n_seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_curate(
    docs_stream: DataFrame,
    langs: list[str] | None = None,
    min_quality: float | None = None,
    max_dup_word_frac: float | None = None,
) -> DataFrame:
    """In-stream curation: the batch plan's STATELESS filter stages
    (language, quality, repetition — all pure column expressions from
    functions/text.py and the curation tokenizer) applied to each
    micro-batch, then the STATEFUL cross-batch exact dedup
    (:func:`streaming_first_seen`).  Filters run first so junk never
    reaches the state store; surviving rows carry their curation
    metrics.  Output schema = FIRST_SEEN_OUT — each distinct curated
    content emits exactly once.

    Stage parity with plans/curate.py is pinned by
    tests/test_streaming_curate.py: streaming survivors == the batch
    plan's keep_list on the same corpus (near-dup excepted — LSH needs
    corpus-wide buckets and stays a compaction-time batch stage, the
    standard lambda split).
    """
    from invertedindexbuilder_spark.functions.text import (
        lang_id,
        quality_score,
    )
    from invertedindexbuilder_spark.operators.dedup import tokens_expr

    d = docs_stream.withColumn(
        "_text", F.coalesce(F.col("content"), F.lit(""))
    )
    if langs is not None:
        d = d.filter(lang_id(F.col("_text")).isin(langs))
    if min_quality is not None:
        d = d.filter(quality_score(F.col("_text")) >= min_quality)
    if max_dup_word_frac is not None:
        w = tokens_expr("_text")
        dup = F.when(
            F.size(w) > 0,
            F.lit(1.0) - F.size(F.array_distinct(w)) / F.size(w),
        ).otherwise(F.lit(0.0))
        d = d.filter(dup <= max_dup_word_frac)
    return streaming_first_seen(d.drop("_text"))


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
