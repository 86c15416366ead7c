"""Benchmark harness (driver contract): runs the headline operators at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., ...extras}

The headline metric mirrors BASELINE.json: index-build throughput
(docs/sec) plus BM25 query latency; extras record throughput so
rounds are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from invertedindexbuilder_spark.operators.dedup import minhash_dedup
    from invertedindexbuilder_spark.operators.index_build import build_index
    from invertedindexbuilder_spark.operators.postings import build_postings
    from invertedindexbuilder_spark.operators.query_exec import topk_bm25
    from invertedindexbuilder_spark.operators.similarity import cosine_topk
    from invertedindexbuilder_spark.session import get_spark
    from invertedindexbuilder_spark.sources.docs_src import (
        docs_from_documents_table,
    )
    from pyspark.sql import functions as F

    spark = get_spark(app_name="bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embeddings = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_docs = documents.count()  # warms the FS cache out of the timings

    timings: dict[str, float] = {}
    t_all = time.time()

    # ---- q1: full index build (parse -> shuffle -> encode) ----
    t0 = time.time()
    docs = docs_from_documents_table(documents).cache()
    postings = build_postings(docs)
    index = build_index(postings).cache()
    n_terms = index.count()
    timings["build_index"] = time.time() - t0

    agg = docs.agg(F.count("*").alias("n"), F.sum("doc_len").alias("s")).collect()[0]
    stats = {"n_docs": int(agg["n"]), "sum_doc_len": int(agg["s"])}

    # ---- q2/q3: BM25 queries over the built index ----
    t0 = time.time()
    topk_bm25(spark, index, docs, stats, "data join", mode="and", k=10).collect()
    timings["bm25_and"] = time.time() - t0
    t0 = time.time()
    topk_bm25(
        spark, index, docs, stats, "spark merge vector window", mode="or", k=10
    ).collect()
    timings["bm25_or"] = time.time() - t0

    # ---- q4: minhash-LSH near-dup over documents ----
    t0 = time.time()
    minhash_dedup(
        documents.select("doc_id", "text"), threshold=0.6
    ).count()
    timings["dedup_minhash"] = time.time() - t0

    # ---- q5: brute-force cosine top-k over embeddings ----
    t0 = time.time()
    cosine_topk(embeddings, query_vec_id=0, k=10).collect()
    timings["ann_cosine"] = time.time() - t0

    total = time.time() - t_all
    build_s = timings["build_index"]
    print(
        json.dumps(
            {
                "metric": "index-build + query suite wall time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in timings.items()},
                "sf": sf,
                "docs": n_docs,
                "terms": n_terms,
                "build_docs_per_sec": round(n_docs / build_s, 1),
                "cpus": cpus,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
