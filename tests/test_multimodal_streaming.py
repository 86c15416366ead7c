"""Multimodal plumbing (schemas, batch shapes, frame explode) and
streaming ingestion (incremental postings == batch postings; windowed
watermark aggregate)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from invertedindexbuilder_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synthetic_media,
)
from invertedindexbuilder_spark.operators.postings import build_postings
from invertedindexbuilder_spark.sources.docs_src import synthetic_docs_src
from invertedindexbuilder_spark.streaming.ingest import (
    incremental_postings,
    stream_docs_src,
    streaming_first_seen,
    windowed_event_counts,
)


def test_media_features_schema_and_determinism(spark):
    media = synthetic_media(spark, 30)
    feats = extract_features(media, dim=8)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 30
    for r in rows.values():
        assert len(r["feature"]) == 8
        assert len(r["payload_sha256"]) == 64
    # determinism: regenerating gives identical features
    rows2 = {r["media_id"]: r for r in extract_features(synthetic_media(spark, 30), dim=8).collect()}
    for mid in rows:
        np.testing.assert_array_equal(rows[mid]["feature"], rows2[mid]["feature"])


def test_frame_sampling_explodes_videos_only(spark):
    media = synthetic_media(spark, 30)
    frames = sample_frames(media, every=2).collect()
    vids = {
        r["media_id"]: r["meta"]["n_frames"]
        for r in media.collect()
        if r["kind"] == "video"
    }
    assert vids, "fixture must contain videos"
    got = {}
    for r in frames:
        got.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert set(got) == set(vids)
    for mid, idxs in got.items():
        assert sorted(idxs) == list(range(0, vids[mid], 2))


def test_resize_is_marked_stub(spark):
    with pytest.raises(NotImplementedError):
        resize_images(synthetic_media(spark, 3), 2, 2)


def test_incremental_postings_match_batch(spark, tmp_path):
    src_dir = str(tmp_path / "drops")
    out_dir = str(tmp_path / "postings_delta")
    ckpt = str(tmp_path / "ckpt")
    docs = synthetic_docs_src(spark, 120)
    docs.write.mode("overwrite").parquet(src_dir)

    q = incremental_postings(
        stream_docs_src(spark, src_dir), out_dir, ckpt, available_now=True
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(out_dir)
    batch = build_postings(
        docs.withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
    )
    assert streamed.count() == batch.count()
    assert (
        streamed.select("term", "doc_id", "tf")
        .exceptAll(batch.select("term", "doc_id", "tf"))
        .count()
        == 0
    )
    # incremental restart: nothing new to process -> no new rows
    q2 = incremental_postings(
        stream_docs_src(spark, src_dir), out_dir, ckpt, available_now=True
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == batch.count()


def test_streaming_first_seen_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState: each distinct content is emitted exactly
    once even when its duplicates arrive in LATER micro-batches."""
    from invertedindexbuilder_spark.schemas import DOCS_SRC

    src_dir = tmp_path / "drops"
    src_dir.mkdir()
    base = synthetic_docs_src(spark, 6).collect()

    def write_drop(name, rows):
        spark.createDataFrame(rows, schema=DOCS_SRC).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src_dir / name))

    # batch 1: docs 0,1,2 plus a SAME-batch dup of doc 0; batch 2: a
    # cross-batch dup of doc 1 (new path, same content) + new docs 3,4
    r = [row.asDict() for row in base]
    dup0 = dict(r[0])
    dup0["path"] = "copy/" + dup0["path"]
    dup = dict(r[1])
    dup["path"] = "copy/" + dup["path"]
    write_drop("d1", [r[0], dup0, r[1], r[2]])
    write_drop("d2", [dup, r[3], r[4]])

    stream = (
        spark.readStream.schema(
            spark.read.parquet(str(src_dir / "d1")).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
    )
    out = streaming_first_seen(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "fs_out"))
        .option("checkpointLocation", str(tmp_path / "fs_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "fs_out")).collect()
    # 5 distinct contents -> 5 rows; the duplicate emitted nothing
    assert len(got) == 5
    by_sha = {g["content_sha256"]: g for g in got}
    assert len(by_sha) == 5
    # the duplicated content is emitted exactly once, under whichever
    # of its two paths arrived in the earlier micro-batch
    import hashlib

    def sha(row):
        return hashlib.sha256((row["content"] or "").encode()).hexdigest()

    dup_sha = sha(r[1])
    assert by_sha[dup_sha]["path"] in (r[1]["path"], dup["path"])
    # duplicate counters: the same-batch dup of doc 0 is counted at
    # emit time; the cross-batch dup of doc 1 only mutates state
    assert by_sha[sha(r[0])]["n_dups_in_first_batch"] == 1
    for row in (r[2], r[3], r[4]):
        assert by_sha[sha(row)]["n_dups_in_first_batch"] == 0


def test_windowed_event_counts_with_watermark(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events_stream")
    events.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .parquet(src)
    )
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    out = str(tmp_path / "win_out")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # append mode emits only windows the watermark has closed; compare
    # those against the batch aggregate
    want = (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    j = got.select("window_start", "event_type", "n_events").join(
        want, ["window_start", "event_type"]
    )
    assert j.count() == got.count()
    assert got.count() > 0
    mismatches = got.select(
        "window_start", "event_type", "n_events"
    ).exceptAll(want)
    assert mismatches.count() == 0
