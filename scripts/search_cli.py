"""spark-submit entry point: the search extensions over a docs table.

    python scripts/search_cli.py --input /path/docs.parquet \
        --mode phrase "slow hash batch"
    ... --mode substring "le part"
    ... --mode fuzzy --max-dist 2 tabel
    ... --mode prefix tab
    ... --mode subtoken getUserAccountManager

The input is any parquet with (doc_id, text) columns — e.g. the shared
``documents`` testdata table — or a docs_src-shaped table (repo, path,
commit, content), auto-adapted.  Prints one JSON line per result row.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet with (doc_id, text); optional "
                    "with --search-index except in substring mode (the "
                    "trigram index yields candidates, the verify scan "
                    "still reads the text)")
    ap.add_argument("--mode", required=True,
                    choices=["phrase", "substring", "fuzzy", "prefix",
                             "subtoken", "related"])
    ap.add_argument("--search-index",
                    help="index root holding the materialized search "
                         "tables (build_index.py --search-tables); when "
                         "given, phrase/substring/fuzzy/prefix/related "
                         "serve from the stored tables instead of "
                         "re-deriving them from --input")
    ap.add_argument("--max-dist", type=int, default=1, help="fuzzy edit distance")
    ap.add_argument("--ignore-tombstones", action="store_true",
                    help="with --search-index: return logically-deleted "
                         "docs anyway (phrase/substring exclude them by "
                         "default)")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("query", nargs="+")
    args = ap.parse_args()
    query = " ".join(args.query)
    if args.input is None and not (
        args.search_index and args.mode in
        ("phrase", "fuzzy", "prefix", "related")
    ) and args.mode != "subtoken":
        ap.error("--input is required unless --search-index serves the "
                 "mode fully (phrase/fuzzy/prefix/related)")

    from pyspark.sql import functions as F

    from invertedindexbuilder_spark.session import get_spark

    spark = get_spark(app_name="search", cores=args.cores,
                      shuffle_partitions=max(args.cores, 8))
    spark.sparkContext.setLogLevel("ERROR")

    docs = None
    if args.input is not None:
        docs = spark.read.parquet(args.input)
        if "text" not in docs.columns and "content" in docs.columns:
            docs = docs.withColumn("text", F.col("content"))
        if "doc_id" not in docs.columns:
            # docs_src shape: deterministic key-order ids, same as the build
            from invertedindexbuilder_spark.operators.docids import (
                SORT_KEYS,
                attach_doc_ids,
                doc_id_map,
            )

            ids, total = doc_id_map(docs.select(*SORT_KEYS))
            docs = attach_doc_ids(docs, ids, total)
        docs = docs.select("doc_id", "text")

    from invertedindexbuilder_spark.operators.dedup import tokens_expr
    from invertedindexbuilder_spark.operators.textsearch import (
        fuzzy_term_match,
        phrase_match,
        prefix_terms,
        related_terms,
        substring_search,
    )

    idx = None
    if args.search_index:
        from invertedindexbuilder_spark.plans.build import load_search_tables

        idx = load_search_tables(spark, args.search_index)
        if args.mode == "fuzzy" and args.max_dist > idx["max_dist"]:
            ap.error(
                f"--max-dist {args.max_dist} exceeds the stored fuzzy "
                f"index's max_dist={idx['max_dist']}; rebuild with a "
                "bigger --max-dist or drop --search-index"
            )

    if args.mode == "phrase":
        out = phrase_match(
            docs, query, postings=idx and idx["positional_postings"]
        ).orderBy(F.desc("n_occurrences"), "doc_id")
    elif args.mode == "substring":
        out = substring_search(
            docs, query, trigrams=idx and idx["char_trigrams"]
        ).orderBy(F.desc("n_occurrences"), "doc_id")
    elif args.mode == "related":
        if idx:
            out = related_terms(
                None, query, doc_terms=idx["doc_terms"],
                dfs=idx["term_dfs"], n_docs=idx["n_docs"],
            )
        else:
            out = related_terms(docs, query)
    elif args.mode in ("fuzzy", "prefix"):
        if idx:
            vocab = idx["term_dfs"].select(F.col("t").alias("term"))
        else:
            vocab = docs.select(F.explode(tokens_expr("text")).alias("term"))
        if args.mode == "fuzzy":
            out = fuzzy_term_match(
                vocab, query, args.max_dist,
                variants=idx and idx["fuzzy_variants"],
            ).orderBy("distance", "term")
        else:
            out = prefix_terms(vocab, query).orderBy("term")
    else:  # subtoken: show the identifier split (code-search debugging)
        from invertedindexbuilder_spark.functions.code import subtokens

        row = (
            spark.createDataFrame([(query,)], "text string")
            .select(subtokens(F.col("text")).alias("parts"))
            .collect()[0]
        )
        print(json.dumps({"identifier": query, "subtokens": row["parts"]}))
        spark.stop()
        return 0

    # doc-level modes exclude tombstoned docs when serving from a build
    # catalog (term-level modes keep as-indexed dfs, same semantics as
    # BM25 under tombstones)
    if (
        idx is not None
        and not args.ignore_tombstones
        and args.mode in ("phrase", "substring")
    ):
        from invertedindexbuilder_spark.plans.deletes import load_tombstones

        tomb = load_tombstones(spark, args.search_index)
        if tomb is not None:
            out = out.join(tomb.select("doc_id"), "doc_id", "left_anti")

    for r in out.limit(args.limit).collect():
        print(json.dumps(r.asDict()))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
