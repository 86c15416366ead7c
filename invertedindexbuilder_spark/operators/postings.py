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
from invertedindexbuilder_spark.functions.tokenize import postings_frame
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


def build_postings(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """``docs`` needs (doc_id: long, <content_col>: string).  Default
    Arrow-batched pandas path (shuffle-free in-batch tf)."""

    def tok(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = postings_frame(pdf["doc_id"], pdf[content_col])
            if len(out):
                yield out

    return docs.select("doc_id", content_col).mapInPandas(tok, schema=POSTINGS)


# cross-validation alias (tests compare the two paths)
build_postings_pandas = build_postings
