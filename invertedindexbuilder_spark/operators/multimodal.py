"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is a DETERMINISTIC FAKE (this container has no
image/audio libraries): payload bytes are interpreted directly as the
sample/pixel buffer.  Everything around it — explicit schemas, Arrow
batch shapes, mapInPandas signatures, per-kind dispatch, frame
sampling — is the real Spark plumbing a production decode (PIL/ffmpeg
in the UDF) would drop into; swap ``_fake_decode`` for the real call.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            False,
        ),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType(), False), False),
    ]
)

FRAMES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), False),
    ]
)


def gen_media_item(seed: int, i: int) -> tuple[str, bytes, tuple]:
    """Deterministic (kind, payload, meta) for row ``i`` — pure function
    shared by the distributed generator and the correctness oracle's
    expected-table builder (expected_media_features), so the two can't
    drift."""
    rng = np.random.default_rng((seed, i))
    kind = ["image", "audio", "video"][i % 3]
    if kind == "image":
        w, h = int(rng.integers(4, 16)), int(rng.integers(4, 16))
        payload = rng.integers(0, 256, w * h * 3, dtype=np.uint8)
        meta = (w, h, None, None)
    elif kind == "audio":
        sr = 8000
        payload = rng.integers(0, 256, int(rng.integers(64, 512)), dtype=np.uint8)
        meta = (None, None, sr, None)
    else:
        nf = int(rng.integers(2, 9))
        payload = rng.integers(0, 256, nf * 48, dtype=np.uint8)
        meta = (4, 4, None, nf)
    return kind, payload.tobytes(), meta


def expected_media_features(n: int, seed: int = 42) -> list[tuple]:
    """Driver-side expected (media_id, kind, payload_sha256, n_bytes)
    rows for the synthetic corpus — the SQL-embeddable oracle for the
    non-SQL-expressible media pipeline."""
    rows = []
    for i in range(n):
        kind, payload, _meta = gen_media_item(seed, i)
        rows.append(
            (i, kind, hashlib.sha256(payload).hexdigest(), len(payload))
        )
    return rows


def expected_media_frames(
    n: int, seed: int = 42, every: int = 2
) -> list[tuple]:
    """Driver-side expected (media_id, frame_idx, frame_sha256, n_bytes)
    rows for sample_frames over the synthetic corpus — same VALUES-table
    oracle pattern as expected_media_features."""
    rows = []
    for i in range(n):
        kind, payload, meta = gen_media_item(seed, i)
        if kind != "video":
            continue
        nf = int(meta[3])
        fsize = len(payload) // nf
        for fi in range(0, nf, every):
            fb = payload[fi * fsize : (fi + 1) * fsize]
            rows.append((i, fi, hashlib.sha256(fb).hexdigest(), len(fb)))
    return rows


def synthetic_media(
    spark: SparkSession, n: int, seed: int = 42, num_partitions: int = 8
) -> DataFrame:
    """Deterministic fake media corpus (pure function of row index)."""

    def gen(batches):
        for pdf in batches:
            rows = {k: [] for k in ["media_id", "kind", "payload", "meta"]}
            for i in pdf["id"].tolist():
                kind, payload, meta = gen_media_item(seed, i)
                rows["media_id"].append(i)
                rows["kind"].append(kind)
                rows["payload"].append(payload)
                rows["meta"].append(meta)
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=num_partitions).mapInPandas(
        gen, schema=MEDIA
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB decode: bytes ARE the sample buffer.  A real pipeline would
    call PIL.Image.open / soundfile.read / av.open here — not available
    in this container."""
    return np.frombuffer(payload, dtype=np.uint8)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction: fake-decode + deterministic
    moment features per bucket.  Signature/batch-shape identical to a
    real embedding UDF (one row in, one fixed-size vector out)."""

    def feats(batches):
        for pdf in batches:
            out = {k: [] for k in FEATURES.fieldNames()}
            for r in pdf.itertuples(index=False):
                buf = _fake_decode(bytes(r.payload))
                chunks = np.array_split(buf.astype(np.float32), dim)
                vec = np.array(
                    [float(c.mean()) if c.size else 0.0 for c in chunks],
                    dtype=np.float32,
                )
                out["media_id"].append(r.media_id)
                out["kind"].append(r.kind)
                out["payload_sha256"].append(
                    hashlib.sha256(bytes(r.payload)).hexdigest()
                )
                out["n_bytes"].append(len(bytes(r.payload)))
                out["feature"].append(vec.tolist())
            yield pd.DataFrame(out)

    return media.mapInPandas(feats, schema=FEATURES)


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Video frame sampling: explode every ``every``-th frame as its
    own binary row (1:N mapInPandas — the shape a real ffmpeg frame
    extractor needs)."""

    def frames(batches):
        for pdf in batches:
            out = {k: [] for k in FRAMES.fieldNames()}
            for r in pdf.itertuples(index=False):
                if r.kind != "video" or r.meta["n_frames"] is None:
                    continue
                nf = int(r.meta["n_frames"])
                payload = bytes(r.payload)
                fsize = len(payload) // nf
                for fi in range(0, nf, every):
                    out["media_id"].append(r.media_id)
                    out["frame_idx"].append(fi)
                    out["frame_bytes"].append(
                        payload[fi * fsize : (fi + 1) * fsize]
                    )
            if out["media_id"]:
                yield pd.DataFrame(out)

    return media.mapInPandas(frames, schema=FRAMES)


def resize_images(media: DataFrame, w: int, h: int) -> DataFrame:
    """Image resize is NOT implementable without an image library in
    this container — clearly-marked stub (the mapInPandas wiring is
    what extract_features/sample_frames already demonstrate)."""
    raise NotImplementedError(
        "resize requires an image library (PIL/cv2) not present in this "
        "container; plug it into the extract_features/mapInPandas pattern"
    )
