"""Batch BM25 serving: answer a whole TABLE of queries in one Spark
job — the cluster serving mode the reference (one query per
interactive -q loop, query.c:29-64) has no analog for, and the place a
DataFrame engine genuinely beats a cursor engine: each matched index
row is DECODED EXACTLY ONCE however many queries share the term, and
per-query top-k is one window over the scored frame.

Plan shape (no driver loop, no per-query jobs):

  queries (query_id, text)
    -> tokenize + strict-key weights     (one narrow mapInPandas)
    -> distinct keys JOIN index          (one scan of the index,
                                          collision winner per key)
    -> decode distinct matched rows      (once per key, not per query)
    -> join decoded postings back to (query_id, key, weight)
    -> doc_len join + BM25 + groupBy(query_id, doc_id)
    -> row_number window <= k per query_id

Scale notes: a batch of Q queries touches at most Q x terms-per-query
distinct keys; the decode stage is identical to single-query serving
(chunk rows stay in their scan partitions), and the postings->query
fan-out happens AFTER decode via a broadcast of the (query_id, key,
weight) table (Q x terms rows — tiny for any realistic batch).  The
per-query top-k window partitions by query_id — Q-way parallel, k-row
output per partition.

Reference parity per query: same tokenizer, D5 14-byte truncation +
last-term-wins collisions, duplicate-term weights, N-1 d_avr, and the
tie-to-smaller-doc_id heap policy (rank on rounded score when
round_digits is set, like topk_bm25).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from invertedindexbuilder_spark import LEXICON_KEY_LEN
from invertedindexbuilder_spark.operators.query_exec import (
    _match_keys,
    bm25_expr,
    decode_matched_rows,
    tokenize_query,
)

_QKEYS_SCHEMA = "query_id long, key string, weight int"


def _query_keys(queries: DataFrame, strict: bool) -> DataFrame:
    """(query_id, text) -> (query_id, key, weight): tokenize each query
    with the exact reference rules and count duplicate-term weights per
    strict lookup key.  Arrow-batched; narrow."""

    def tok(batches):
        for pdf in batches:
            out = {"query_id": [], "key": [], "weight": []}
            for qid, text in zip(pdf["query_id"], pdf["text"]):
                keys: dict[str, int] = {}
                for t in tokenize_query(text):
                    k = t[:LEXICON_KEY_LEN] if strict else t
                    keys[k] = keys.get(k, 0) + 1
                for k, w in keys.items():
                    out["query_id"].append(int(qid))
                    out["key"].append(k)
                    out["weight"].append(w)
            if out["query_id"]:
                yield pd.DataFrame(out)

    return queries.select("query_id", "text").mapInPandas(
        tok, schema=_QKEYS_SCHEMA
    )


def topk_bm25_batch(
    spark: SparkSession,
    index: DataFrame,
    docs: DataFrame,
    stats: dict,
    queries: DataFrame,
    mode: str = "and",
    k: int = 10,
    strict: bool = True,
    round_digits: int | None = None,
    exclude_col: str | None = None,
    exclude_doc_ids: DataFrame | None = None,
) -> DataFrame:
    """All queries at once -> DataFrame(query_id, doc_id, score, rank).

    ``exclude_col``: optional column of per-query NOT-terms (space-
    separated; null/empty = none) — docs containing any of a query's
    excluded terms leave THAT query's ranking.  Excluded keys decode
    once for the whole batch, like positive keys.

    ``exclude_doc_ids``: (doc_id) frame removed from EVERY query's
    ranking — the tombstone surface (plans/deletes.py); stats stay
    as-indexed, matching the single-query paths.

    ``index`` may be the merged table OR the chunked table
    (INDEX_CHUNK): chunk rows decode independently and the full-term
    scoring df is recovered as a per-(key) sum, exactly like
    topk_bm25_chunked.  ``queries`` needs (query_id: long, text:
    string).  Results per query are identical to topk_bm25 (same gate
    oracle, per-query)."""
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    n_docs = int(stats["n_docs"])
    davr = float(stats["sum_doc_len"]) / float(n_docs - 1)
    chunked = "salt" in index.columns

    def _resolve(keys: dict) -> DataFrame:
        """Matched index rows for a key set, collision winners applied
        (same semantics as lookup_index_rows / lookup_chunk_rows)."""
        m = _match_keys(index, keys, strict)
        if chunked:
            # full-term df + collision winner from a tiny metadata agg
            # (same shape as lookup_chunk_rows, batched over all keys)
            per_term = m.groupBy("key", "term").agg(
                F.sum("df").cast("long").alias("term_df")
            )
            w = Window.partitionBy("key").orderBy(F.col("term").desc())
            winner = (
                per_term.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            return m.join(F.broadcast(winner), ["key", "term"])
        if strict:
            winner = m.groupBy("key").agg(F.max("term").alias("term"))
            return m.join(F.broadcast(winner), ["key", "term"])
        return m

    # qkeys is deliberately NOT cached: it re-derives from the queries
    # table in one narrow pass wherever the plan needs it (a cache here
    # would pin executor storage per batch in a long-running server)
    qkeys = _query_keys(queries, strict)
    # the distinct keys of the whole batch, with a batch-level weight
    # placeholder (the real per-query weight joins back after decode)
    distinct_keys = {
        r["key"]: 1 for r in qkeys.select("key").distinct().collect()
    }
    if not distinct_keys:
        return spark.createDataFrame(
            [], schema="query_id long, doc_id long, score double, rank int"
        )
    matched = _resolve(distinct_keys)

    # decode each matched row ONCE (weight=1 placeholder; the per-query
    # weight multiplies in after the fan-out join)
    decoded = decode_matched_rows(matched.withColumn("weight", F.lit(1)))

    scored = (
        decoded.drop("weight")
        .join(F.broadcast(qkeys), "key")
        .join(docs.select("doc_id", "doc_len"), "doc_id")
        .withColumn("contrib", F.col("weight") * bm25_expr(n_docs, davr))
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("score"),
        F.count("*").alias("_nk"),
    )
    if mode == "and":
        # docs containing ALL FOUND keys of their query: per-query found
        # count = distinct keys that matched at least one index row.
        # Computed from the MATCHED metadata (pre-decode — every matched
        # row has df >= 1), so the decode pipeline runs exactly once.
        found = (
            matched.select("key")
            .distinct()
            .join(F.broadcast(qkeys), "key")
            .groupBy("query_id")
            .agg(F.count("*").alias("_need"))
        )
        agg = agg.join(F.broadcast(found), "query_id").filter(
            F.col("_nk") == F.col("_need")
        )
    agg = agg.drop("_nk", "_need")
    if exclude_col is not None and exclude_col in queries.columns:
        # per-query NOT-terms: decode each excluded key once for the
        # whole batch, fan out to (query_id, doc_id) exclusion pairs,
        # anti-join AFTER the per-(query, doc) aggregate
        ex_qkeys = _query_keys(
            queries.select(
                "query_id",
                F.coalesce(F.col(exclude_col), F.lit("")).alias("text"),
            ),
            strict,
        )
        ex_keys = {
            r["key"]: 1 for r in ex_qkeys.select("key").distinct().collect()
        }
        if ex_keys:
            ex_pairs = (
                decode_matched_rows(
                    _resolve(ex_keys).withColumn("weight", F.lit(1))
                )
                .join(F.broadcast(ex_qkeys.select("query_id", "key")), "key")
                .select("query_id", "doc_id")
                .distinct()
            )
            agg = agg.join(ex_pairs, ["query_id", "doc_id"], "left_anti")
    if exclude_doc_ids is not None:
        agg = agg.join(
            exclude_doc_ids.select("doc_id"), "doc_id", "left_anti"
        )
    if round_digits is not None:
        agg = agg.withColumn("score", F.round(F.col("score"), round_digits))
    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    out = (
        agg.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
    return out
