"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one implemented operator family from
SURVEY.md §2 (or a training-pipeline extension) over the shared
testdata tables; ``oracle_sql()`` holds the DuckDB twin.  Both sides
round floating outputs and use the same md5-prefix hash primitive so
value-hash comparison is deterministic across engines.

The gate bodies live in ``invertedindexbuilder_spark/gates/`` (split
by operator family in r6 — this file had grown to 2,100 lines); this
module keeps the three driver entry points plus the rotation contract.

Coverage map (SURVEY §2 rows -> queries):
  P1/P1b/A1 tokenizer+tf    -> postings
  M2/F2 df, lexicon         -> term_stats, doc_table
  Q1 stats                  -> corpus_stats
  C1/C2/F1 encoder geometry -> index_meta (varbyte sizes, blocks)
  Q2/Q6/Q8/Q9 conj BM25     -> bm25_and, bm25_and_unknown
  Q7 disj BM25              -> bm25_or, bm25_or_dup
  chunked serving (r2)      -> bm25_and_chunked, bm25_or_chunked
  incremental compaction    -> index_compacted
  federated merge (r3)      -> index_federated
  incr. search tables (r4)  -> search_dfs_compacted
  stored ANN serving (r5)   -> ann_ivf_stored
  document deletion (r6)    -> index_purged (physical),
                               bm25_and_deleted (tombstones),
                               search_dfs_purged (search tables
                               rewritten in the purge flip)
  purge id_remap (r7)       -> purge_id_remap (old->new survivor map
                               published in the purge flip for CDC
                               upstream resync)
  disjunctive scan prune    -> bm25_or_ioprune (r7; two-phase chunk-
                               granule keep rule pushed into the scan)
  sharded serving (r7)      -> bm25_sharded (scatter-gather over two
                               independent shard builds, global stats,
                               zero payload bytes rewritten)
  boolean NOT / facets (r3) -> bm25_and_not, bm25_filtered
  S4 sampling               -> sample_mod10
  training-data extensions  -> dedup_exact, dedup_jaccard,
                               dedup_minhash_lsh, simhash,
                               fingerprint_winnow, embed_near_dup,
                               lang_id, quality_score, token_counts,
                               content_hash, ann_cosine_topk,
                               ann_ivf_topk, ann_ivf_probe1/5,
                               ann_kmeans_topk, media_features,
                               media_frames, curated_corpus,
                               pack_sequences, stratified_sample
  curation suite (r3)       -> repetition_stats, top_bigrams,
                               decontaminate, pii_scrub,
                               source_dup_stats, corpus_report,
                               dedup_clusters, simhash_pairs
  code/search suite (r3)    -> code_subtokens, code_stats,
                               phrase_search, substring_search,
                               fuzzy_terms, prefix_terms,
                               related_terms
  Spark-primitive demos     -> lineitem_rollup, events_hourly,
                               sessionize, asof_latest_order,
                               tpch_q3ish
"""

from __future__ import annotations

import os
import sys

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from invertedindexbuilder_spark.gates.shared import (  # noqa: E402
    DEFAULT_SF,
    bm25_query,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: conjunctive BM25 top-10 over the sf0.001 corpus."""
    return bm25_query(spark, DEFAULT_SF, [("data", 1), ("join", 1)], "and", 10)


def _gate_round() -> int:
    """Current driver round, derived from the CORRECTNESS_r{N}.json
    files already committed next to this file (max N + 1).  Lets the
    gate rotation below advance every round without a manual bump.
    NB: the offset therefore flips the moment a new CORRECTNESS file
    lands — harmless for the driver (it sweeps before writing), but a
    re-run of ``queries()`` after the drop sees next round's order."""
    import glob
    import re as _re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        if (m := _re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0) + 1


def _rotate_gates(d: dict) -> dict:
    """Deterministic per-round rotation of the gate dict (VERDICT r4 #1).

    The driver's CORRECTNESS sweep walks ``queries()`` in dict order
    under a budget that empirically caps at the first 50 entries
    (CORRECTNESS_r03/r04 both hold exactly the first 50 rows).  With 60
    gates, a fixed order leaves the same 10-gate tail permanently
    unattested.  The step is ``len - 50`` — exactly the size of the
    window's shadow — so consecutive rounds' shadows are disjoint and
    EVERY gate lands inside the driver's 50-row window at least every
    other round (r5's step of 10 under a 61-gate list left an 11-gate
    shadow whose consecutive rounds overlapped by one gate,
    `simhash_pairs`; VERDICT r5 #1).
    """
    names = list(d)
    step = max(1, len(names) - 50)
    off = (step * _gate_round()) % len(names)
    return {k: d[k] for k in names[off:] + names[:off]}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from invertedindexbuilder_spark.gates import all_queries

    return _rotate_gates(all_queries())


def oracle_sql() -> dict[str, str]:
    from invertedindexbuilder_spark.gates import all_oracle_sql

    return all_oracle_sql()
