"""Snippet generation (reference Q10, query.c:175-229) — re-specified
cleanly per SURVEY §5.3/D6: the reference's accidental last-window-wins
and stale-buffer carryover are NOT replicated; this picks the
BEST-scoring window (earliest on ties), which is the evident intent.

Window model matches the reference: fixed 512-byte windows over the
document body, window score = number of query-term occurrences.
Runs as an Arrow-batched pandas pass over the (small) top-k result set
joined back to content — snippets are presentation, so they live
outside the scoring path and never affect rank identity.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from invertedindexbuilder_spark.operators.query_exec import tokenize_query

WINDOW = 512  # reference window size (query.c:180)


def best_window(content: str, terms: list[str]) -> tuple[int, str]:
    """(score, snippet) of the best fixed 512-char window."""
    if not content:
        return 0, ""
    pats = [re.compile(re.escape(t), re.IGNORECASE) for t in terms]
    best_s, best_off = -1, 0
    for off in range(0, max(len(content) - 1, 1), WINDOW):
        w = content[off : off + WINDOW]
        s = sum(len(p.findall(w)) for p in pats)
        if s > best_s:  # strict: earliest window wins ties
            best_s, best_off = s, off
    return best_s, content[best_off : best_off + WINDOW]


_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("snippet_score", T.IntegerType(), False),
        T.StructField("snippet", T.StringType(), False),
    ]
)


def snippets_for(results: DataFrame, docs_content: DataFrame, query: str) -> DataFrame:
    """results(doc_id, ...) x docs_content(doc_id, content) -> snippets."""
    terms = tokenize_query(query)

    def gen(batches):
        for pdf in batches:
            rows = {"doc_id": [], "snippet_score": [], "snippet": []}
            for r in pdf.itertuples(index=False):
                s, snip = best_window(r.content or "", terms)
                rows["doc_id"].append(r.doc_id)
                rows["snippet_score"].append(s)
                rows["snippet"].append(snip)
            yield pd.DataFrame(rows)

    joined = results.select("doc_id").join(docs_content, "doc_id")
    return joined.mapInPandas(gen, schema=_SCHEMA)
