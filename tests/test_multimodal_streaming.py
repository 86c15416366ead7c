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
