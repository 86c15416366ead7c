"""Driver correctness gates, split by operator family (VERDICT r5 #6).

Each module exposes ``queries()`` (gate name -> callable(spark, sf_dir)
-> DataFrame) and ``oracle_sql()`` (gate name -> DuckDB twin) for its
slice; this package reassembles them in the CANONICAL order the
rotation contract in ``__spark_entry__`` depends on.  The split is
purely structural — gate names, bodies, and oracles are byte-identical
to the pre-split single file (r5 and earlier CORRECTNESS attestations
stay comparable).
"""

from __future__ import annotations

from . import ann, bm25, code_search, core_index, curation, dedup, relational

_MODULES = (ann, bm25, code_search, core_index, curation, dedup, relational)

# The canonical gate order (r4 layout + canonical-last debuts; see
# __spark_entry__._rotate_gates for the 50-row driver-window contract).
# Explicit, because the modules group by family while the window
# rotation is defined over THIS interleaved sequence.
CANONICAL_ORDER = [
    "media_features",
    "media_frames",
    "events_hourly",
    "sessionize",
    "asof_latest_order",
    "tpch_q3ish",
    "curated_corpus",
    "index_compacted",
    "index_federated",
    "postings",
    "term_stats",
    "corpus_stats",
    "index_meta",
    "doc_table",
    "sample_mod10",
    "bm25_and",
    "bm25_or",
    "bm25_or_dup",
    "bm25_and_unknown",
    "bm25_and_chunked",
    "bm25_or_chunked",
    "bm25_batch_and",
    "bm25_batch_or",
    "bm25_and_not",
    "bm25_filtered",
    "lang_id",
    "quality_score",
    "token_counts",
    "pack_sequences",
    "stratified_sample",
    "content_hash",
    "corpus_report",
    "unigram_xent",
    "repetition_stats",
    "top_bigrams",
    "decontaminate",
    "pii_scrub",
    "source_dup_stats",
    "code_subtokens",
    "code_stats",
    "phrase_search",
    "substring_search",
    "fuzzy_terms",
    "prefix_terms",
    "related_terms",
    "dedup_exact",
    "dedup_jaccard",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "simhash_pairs",
    "simhash",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_ivf_probe1",
    "ann_ivf_probe5",
    "ann_kmeans_topk",
    "embed_near_dup",
    "fingerprint_winnow",
    "lineitem_rollup",
    "search_dfs_compacted",
    # r5 addition: canonical-LAST lands just inside r5's rotated head
    # window (position 11) — a driver row in its debut round without
    # displacing any of the 60 the coverage contract already tracks
    "ann_ivf_stored",
    # r6 additions (document deletion): canonical-last again — with
    # 64 gates the r6 offset is (64-50)*6 % 64 = 20, so the window
    # covers canonical indices 20..63 + 0..5: all three r6 debuts
    # (61/62/63) land a driver row, and simhash_pairs (49, the gate
    # the r5 step missed twice) is back inside the window
    "index_purged",
    "bm25_and_deleted",
    "search_dfs_purged",
    # r7 additions (purge id_remap, disjunctive scan prune, sharded
    # scatter-gather serving, facet counts): canonical-last — with 69
    # gates the r7 offset is (69-50)*7 % 69 = 64, so the window covers
    # canonical indices 64..68 + 0..44: all five debuts (64..68) land
    # a driver row, and tests/test_gate_rotation.py pins that the new
    # step still tiles (any two consecutive windows cover every gate)
    "purge_id_remap",
    "bm25_or_ioprune",
    "bm25_sharded",
    "facet_counts_and",
    "facet_counts_or",
]


def _merged(fn_name: str) -> dict:
    out: dict = {}
    for mod in _MODULES:
        part = getattr(mod, fn_name)()
        dup = out.keys() & part.keys()
        assert not dup, f"gate defined twice: {sorted(dup)}"
        out.update(part)
    return out


def all_queries() -> dict:
    """Every gate, reassembled in CANONICAL_ORDER."""
    merged = _merged("queries")
    assert set(merged) == set(CANONICAL_ORDER), (
        sorted(set(merged) ^ set(CANONICAL_ORDER))
    )
    return {k: merged[k] for k in CANONICAL_ORDER}


def all_oracle_sql() -> dict:
    merged = _merged("oracle_sql")
    assert set(merged) == set(CANONICAL_ORDER), (
        sorted(set(merged) ^ set(CANONICAL_ORDER))
    )
    return {k: merged[k] for k in CANONICAL_ORDER}
