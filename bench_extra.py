"""Supplementary serving-side benchmark (r8) — NOT the driver contract.

bench.py is frozen for measurement; this harness exists to iterate on
the SERVING entries without paying a fresh 1M-doc build per run: the
chunk-only index is built once into --root (default /tmp/iib_r8_big)
and reused, and each query is timed with the same JvmIOMeter rchar
accounting bench.py uses.  Methodology matches bench.py (same queries,
same .collect() sinks, same session settings); numbers are cited in
OPTIMIZATION_r08.md next to the frozen-bench walls, never instead of
them.

Usage: python bench_extra.py [--docs 1000000] [--reps 3] [--fresh]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--root", default="/tmp/iib_r8_big")
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import shutil

    from invertedindexbuilder_spark.benchmetrics import JvmIOMeter
    from invertedindexbuilder_spark.catalog import Catalog
    from invertedindexbuilder_spark.operators.query_batch import topk_bm25_batch
    from invertedindexbuilder_spark.operators.query_exec import (
        facet_counts,
        topk_bm25_chunked,
    )
    from invertedindexbuilder_spark.plans.build import build, load_stats
    from invertedindexbuilder_spark.session import get_spark
    from invertedindexbuilder_spark.sources.docs_src import synthetic_docs_src

    spark = get_spark(app_name="bench_extra", cores=args.cores,
                      shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    if args.fresh:
        shutil.rmtree(args.root, ignore_errors=True)
    if not os.path.exists(os.path.join(args.root, "manifest.json")):
        build(spark, synthetic_docs_src(spark, args.docs), args.root,
              merged=False)
    cat = Catalog(spark, args.root)
    chunks = cat.read("index_chunks").cache()
    docs = cat.read("docs").select("doc_id", "doc_len").cache()
    chunks.count(), docs.count()
    stats = load_stats(spark, args.root)
    fac = cat.read("docs").select("doc_id", "repo")
    qtab = spark.createDataFrame(
        [(0, "common rare0007"), (1, "alpha rare0123"), (2, "rare0042 beta")],
        "query_id long, text string",
    )

    def q_and():
        topk_bm25_chunked(spark, chunks, docs, stats, "common rare0007",
                          mode="and", k=10).collect()

    def q_or():
        topk_bm25_chunked(spark, chunks, docs, stats,
                          "rare0007 rare0123 common", mode="or", k=10
                          ).collect()

    def q_bmw():
        topk_bm25_chunked(spark, chunks, docs, stats,
                          "rare0007 rare0123 common", mode="or", k=10,
                          or_prune=True).collect()

    def q_batch():
        topk_bm25_batch(spark, chunks, docs, stats, qtab, mode="and", k=10
                        ).collect()

    def q_facets():
        facet_counts(spark, chunks, fac, "common rare0007", ["repo"],
                     mode="and").collect()

    entries = {
        "big_bm25_and": q_and,
        "big_bm25_or": q_or,
        "big_bm25_or_bmw_forced": q_bmw,
        "big_bm25_batch_and": q_batch,
        "big_facet_counts": q_facets,
    }
    meter = JvmIOMeter()
    out: dict[str, dict] = {}
    for name, fn in entries.items():
        fn()  # warm (page cache + JIT), matches bench steady state
        walls, rchars = [], []
        for _ in range(args.reps):
            meter.delta()
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
            rchars.append(round(meter.delta()["rchar"] / 1e6, 2))
        out[name] = {"wall_min": min(walls), "walls": walls,
                     "rchar_mb": min(rchars)}
        print(f"{name}: min {min(walls)}s walls={walls} "
              f"rchar={min(rchars)}MB", flush=True)
    print(json.dumps({"docs": args.docs, "entries": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
