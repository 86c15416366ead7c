"""Skew-salting policy: the sampled detector must see heavy terms
regardless of WHERE in the corpus they live (stripe sample, not prefix),
and the encoder must stay memory-bounded even when detection misses
(carry-spill backstop)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from invertedindexbuilder_spark import BLOCK_SIZE
from invertedindexbuilder_spark.functions.compress import decode_posting_list
from invertedindexbuilder_spark.operators.index_build import (
    encode_chunks,
    merge_chunks,
    resolve_salting_sampled,
    stripe_sample,
)
from invertedindexbuilder_spark.schemas import POSTINGS


def _tail_heavy_docs(spark, n_docs=2000, n_splits=20, tail_from=1800):
    """Contiguous doc-id ranges per split (spark.range slices evenly);
    'tailterm' appears ONLY in the last 10% of doc_ids."""
    return spark.range(0, n_docs, 1, n_splits).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") >= tail_from, F.lit("tailterm alpha beta")
        )
        .otherwise(F.lit("alpha beta gamma"))
        .alias("content"),
    )


def test_stripe_sample_covers_every_doc_range(spark):
    docs = _tail_heavy_docs(spark)
    got = stripe_sample(docs, 100).select("doc_id").toPandas()["doc_id"]
    # 20 splits x 5-row heads: every split's range is represented,
    # including the tail splits a prefix limit() would never read
    assert len(got) == 100
    assert (np.sort(got.values)[:5] == [0, 1, 2, 3, 4]).all()
    assert got.max() >= 1900


def test_tail_localized_heavy_term_gets_salted(spark):
    # the round-2 verdict's scenario: a term heavy ONLY in the corpus
    # tail (e.g. a license header adopted halfway through a crawl) —
    # a prefix sample assigns it no salt and its whole df lands on one
    # shuffle key; the stripe sample must catch it
    docs = _tail_heavy_docs(spark)
    _thr, _cb, heavy = resolve_salting_sampled(
        docs, num_partitions=8, salt_threshold=150, chunk_blocks=None,
        n_docs=2000, sample_docs=100,
    )
    assert "tailterm" in heavy  # df_est ~ 10 sampled * scale 20 = 200 > 150
    assert "alpha" in heavy  # sanity: corpus-wide heavy term still seen


def test_carry_spill_bounds_run_memory_and_stays_decode_identical(spark):
    # one giant unsalted (term, salt=0) run: with a forced tiny spill
    # threshold the encoder must emit multiple block-aligned chunk rows
    # instead of accumulating the run, and the merged row must decode
    # (and byte-compare) identically to the unspilled whole-list encode
    n = 1000
    pdf = [("giant", int(i * 3), int(i % 7 + 1)) for i in range(n)]
    postings = spark.createDataFrame(pdf, POSTINGS).repartition(1)

    spilled = encode_chunks(
        postings, num_partitions=1, salt_threshold=1 << 40,
        spill_postings=256,
    )
    rows = sorted(spilled.collect(), key=lambda r: r["first_doc_id"])
    assert len(rows) >= 2, "spill must split the run into several chunks"
    # every flushed (non-final) chunk is block-aligned -> merged bytes
    # stay identical to the whole-list encode
    assert all(r["df"] % BLOCK_SIZE == 0 for r in rows[:-1])

    merged = merge_chunks(spilled).collect()
    whole = encode_chunks(
        postings, num_partitions=1, salt_threshold=1 << 40
    ).collect()
    assert len(merged) == 1 and len(whole) == 1
    m, w = merged[0], whole[0]
    assert m["df"] == w["df"] == n
    assert bytes(m["payload"]) == bytes(w["payload"])
    assert list(m["last_doc_ids"]) == list(w["last_doc_ids"])
    assert list(m["block_bytes"]) == list(w["block_bytes"])
    docs, tfs = decode_posting_list(
        bytes(m["payload"]), m["df"], np.asarray(m["block_bytes"]),
        block_counts=np.asarray(m["block_counts"]),
    )
    assert docs.tolist() == [i * 3 for i in range(n)]
    assert tfs.tolist() == [i % 7 + 1 for i in range(n)]
