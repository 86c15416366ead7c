"""Docs -> postings: the reference's PARSE phase as one narrow stage.

The per-(term, doc) tf aggregation (reference hash-agg A1,
main.c:131-206) happens INSIDE the Arrow batch, so this stage is
shuffle-free: tokenize + count in pandas, emit (term, doc_id, tf).
The reference's memory-limit spill to ``tmp/intermediate-N`` (X1,
main.c:211-231) needs no analog — batches stream through; the optional
postings checkpoint in ``plans.build`` plays the same
loosely-coupled-phase role.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from invertedindexbuilder_spark.functions.tokenize import postings_frame
from invertedindexbuilder_spark.schemas import POSTINGS


def build_postings(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """``docs`` needs (doc_id: long, <content_col>: string)."""

    def tok(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = postings_frame(pdf["doc_id"], pdf[content_col])
            if len(out):
                yield out

    return docs.select("doc_id", content_col).mapInPandas(tok, schema=POSTINGS)
