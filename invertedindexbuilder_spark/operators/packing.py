"""Sequence packing for LLM training data: concatenate-and-chunk.

Training pipelines concatenate the token streams of all documents (in a
fixed canonical order) and slice the stream into fixed-length training
sequences; a document near a boundary contributes a SEGMENT to each of
the sequences it straddles.  This operator computes that doc->sequence
segment mapping as a DataFrame — downstream, the actual token
materialization is a per-segment substring/slice, embarrassingly
parallel.

Scale design: the global token offset of each doc is a prefix sum over
the doc_id order.  A ``sum() OVER (ORDER BY doc_id)`` window would
funnel the whole table through ONE partition, so the offsets use the
same two-phase pattern as doc-id assignment (operators/docids.py): one
range shuffle on doc_id, a tiny per-partition token-sum aggregate,
driver-side prefix sums over the partition ids (O(#partitions)
scalars), then a narrow Arrow-batched pass that emits each doc's
segments with numpy.  Documents longer than ``seq_len`` explode into
ceil(n/seq_len)(+1) segments — bounded per row, no driver involvement.

Deterministic: a pure function of (doc_id, n_tokens, seq_len) —
independent of partition count, so sequence ids are stable between the
N and 4N cluster runs.  Oracle-twinned in __spark_entry__
(``pack_sequences`` gate) against a DuckDB window + generate_series
formulation of the same arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

SEGMENTS_SCHEMA = T.StructType(
    [
        T.StructField("seq_id", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), False),
        # token span of the doc included in this sequence (doc-relative,
        # end exclusive) and where it lands inside the sequence
        T.StructField("doc_begin", T.LongType(), False),
        T.StructField("doc_end", T.LongType(), False),
        T.StructField("seq_begin", T.LongType(), False),
    ]
)


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tok_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, n_tokens) -> (seq_id, doc_id, doc_begin, doc_end,
    seq_begin) segments of the concatenate-and-chunk packing.

    Sequence k covers global token positions [k*seq_len, (k+1)*seq_len);
    a doc whose stream span [off, off+n) intersects it contributes the
    overlap.  Zero-token docs contribute nothing.  The final sequence is
    left ragged (standard practice: it is dropped or padded downstream).
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    spark = docs.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    ranged = (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(tok_col).cast("long").alias("n"),
        )
        .repartitionByRange(num_partitions, F.col("doc_id"))
        .sortWithinPartitions("doc_id")
        .withColumn("_pid", F.spark_partition_id())
    )
    # persist: the partition token sums and the segment pass must see
    # the SAME range boundaries (re-sampling could move them) — same
    # correctness guard as docids._assign
    ranged.persist(StorageLevel.MEMORY_AND_DISK)
    sums = {
        r["_pid"]: r["s"]
        for r in ranged.groupBy("_pid").agg(F.sum("n").alias("s")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += int(sums.get(pid) or 0)

    L = int(seq_len)

    def segments(batches):
        off = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if off is None:
                off = offsets[int(pdf["_pid"].iloc[0])]
            n = pdf["n"].values.astype(np.int64)
            ids = pdf["doc_id"].values.astype(np.int64)
            starts = off + np.concatenate(([0], np.cumsum(n)[:-1]))
            off += int(n.sum())
            keep = n > 0
            n, ids, starts = n[keep], ids[keep], starts[keep]
            if not n.size:
                continue
            first_seq = starts // L
            last_seq = (starts + n - 1) // L
            reps = (last_seq - first_seq + 1).astype(np.int64)
            doc_idx = np.repeat(np.arange(n.size), reps)
            # seq_id = first_seq[doc] + position within the doc's run
            run_pos = np.arange(reps.sum()) - np.repeat(
                np.concatenate(([0], np.cumsum(reps)[:-1])), reps
            )
            seq_id = first_seq[doc_idx] + run_pos
            seq_start = seq_id * L
            d_start = starts[doc_idx]
            d_n = n[doc_idx]
            doc_begin = np.maximum(seq_start - d_start, 0)
            doc_end = np.minimum(seq_start + L - d_start, d_n)
            seq_begin = np.maximum(d_start - seq_start, 0)
            yield pd.DataFrame(
                {
                    "seq_id": seq_id,
                    "doc_id": ids[doc_idx],
                    "doc_begin": doc_begin,
                    "doc_end": doc_end,
                    "seq_begin": seq_begin,
                }
            )

    out = ranged.mapInPandas(segments, schema=SEGMENTS_SCHEMA)
    # NB: like docids, the persist is released by the caller's
    # materialization lifecycle; for one-shot use localCheckpoint-free
    # laziness is fine because both actions (sums + segments) pin the
    # same persisted frame.
    return out
