"""Docs -> postings: the reference's PARSE phase as one narrow stage.

Two implementations, identical semantics (equivalence is tested):

- ``build_postings`` (default): Arrow-batched pandas tokenizer
  (functions/tokenize.py) with in-batch tf — shuffle-free (the
  per-(term, doc) tf aggregation — reference hash-agg A1,
  main.c:131-206 — finishes inside the batch).  Measured ~2x the
  throughput of the JVM path on this box (Python sre + C Counter beat
  java.util.regex).
- ``build_postings_jvm``: pure JVM column expressions — regexp token
  extraction, trailing-drop via ``\\z``, explode + partial-agg
  groupBy for tf.  No Python workers / Arrow transfer, so it
  core-scales a bit better under CPU pinning (bench: efficiency 0.71
  vs 0.59) at ~half the absolute throughput; kept selectable for
  cluster CPUs where the tradeoff flips.

The reference's memory-limit spill to ``tmp/intermediate-N`` (X1,
main.c:211-231) needs no analog — rows stream through; the optional
postings checkpoint in ``plans.build`` plays the same
loosely-coupled-phase role.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from invertedindexbuilder_spark import WORD_LENGTH_MAX, WORD_LENGTH_MIN
from invertedindexbuilder_spark.schemas import POSTINGS


def tokens_column(content: Column) -> Column:
    """Kept tokens of a body as an array column — exact reference
    semantics (P1 + D0 + 1..15 length filter), pure JVM.

    NB: Java regex ``$`` matches before a trailing line terminator
    (same trap as Python's) — ``\\z`` is the absolute end anchor."""
    raw = F.regexp_extract_all(content, F.lit("[A-Za-z0-9]+"), 0)
    ends_alnum = content.rlike("[A-Za-z0-9]\\z")
    dropped = F.when(
        ends_alnum & (F.size(raw) > 0), F.slice(raw, 1, F.size(raw) - 1)
    ).otherwise(raw)
    lowered = F.transform(dropped, F.lower)
    return F.filter(
        lowered,
        lambda t: (F.length(t) >= WORD_LENGTH_MIN)
        & (F.length(t) <= WORD_LENGTH_MAX),
    )


def build_postings_jvm(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """JVM path: explode kept tokens, then groupBy(term, doc_id).count().

    The groupBy introduces a shuffle the pandas path doesn't have, but
    partial (map-side) aggregation collapses it to the final postings
    cardinality before any data moves — and because a doc lives in
    exactly one input partition, the map-side combine already produces
    final tfs; the exchange only relabels them.  (A sort+run-length
    array-lambda variant avoided the shuffle entirely but Catalyst
    re-evaluates lambda-captured subexpressions per element — O(n^2)
    per row — so vanilla explode+agg wins.)"""
    toks = tokens_column(F.col(content_col))
    return (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("int").alias("tf"))
        .select("term", "doc_id", "tf")
    )


def _postings_batch(batch):
    """One Arrow record batch (doc_id, content) -> (term, doc_id, tf)
    record batch, or None when the batch yields no postings.

    Vectorized end to end (guide §4.2: hand whole batches to native
    code): lowercase + RE2 token split run in Arrow C++, the D0
    trailing-drop falls out of the split shape (the LAST split element
    is non-empty iff the body ends alphanumeric — exactly the token the
    reference never flushes), and the per-(term, doc) tf aggregation is
    one np.unique over (batch-local doc ordinal, dictionary code) int64
    keys.  Output multiset is identical to ``postings_frame`` (pinned
    in tests/test_tokenizer.py::test_arrow_batch_equals_pandas_frame).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    content = pc.fill_null(batch.column(1), "")
    # tokens are [A-Za-z0-9]+ runs: lowercase first (ASCII case only
    # exists inside tokens), then split on non-token runs
    toks = pc.split_pattern_regex(pc.ascii_lower(content), "[^a-z0-9]+")
    offs = np.asarray(toks.offsets)
    flat = toks.flatten()
    offs = offs - offs[0]
    lens = offs[1:] - offs[:-1]
    fl = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    # D0: the final in-flight token is never emitted.  split() makes
    # the last element "" when the body ends with a delimiter (kept
    # tokens all flushed) and the final token when it ends alnum —
    # dropping the last element of every list is exactly the quirk
    # (an empty last element dies to the length filter anyway).
    is_last = np.zeros(len(flat), dtype=bool)
    is_last[offs[1:] - 1] = True
    keep = (fl >= WORD_LENGTH_MIN) & (fl <= WORD_LENGTH_MAX) & ~is_last
    if not keep.any():
        return None
    parent = np.repeat(np.arange(len(toks)), lens)[keep]
    d = pc.dictionary_encode(flat.filter(pa.array(keep)))
    codes = np.asarray(d.indices, dtype=np.int64)
    vocab = d.dictionary
    # batch-local ordinal keys: parent < batch rows (~10^4), so the
    # combined key stays far from int64 range whatever the doc_ids are
    key = parent * len(vocab) + codes
    uk, counts = np.unique(key, return_counts=True)
    doc_ids = np.asarray(batch.column(0), dtype=np.int64)
    return pa.record_batch(
        [
            vocab.take(pa.array(uk % len(vocab))).cast(pa.string()),
            pa.array(doc_ids[uk // len(vocab)], type=pa.int64()),
            pa.array(counts.astype(np.int32)),
        ],
        names=["term", "doc_id", "tf"],
    )


def build_postings(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """``docs`` needs (doc_id: long, <content_col>: string).  Default
    Arrow-native path (mapInArrow, shuffle-free in-batch tf): RE2
    split + dictionary-encoded counting, ~3x the pandas
    ``postings_frame`` throughput and ~4x the JVM expression path on
    this box (r8; the regex work runs in Arrow C++ instead of
    java.util.regex or Python sre, and content strings never convert
    to pandas objects)."""

    def tok(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            out = _postings_batch(batch)
            if out is not None and out.num_rows:
                yield out

    return docs.select("doc_id", content_col).mapInArrow(tok, schema=POSTINGS)


# cross-validation alias (tests compare the two paths)
build_postings_pandas = build_postings
