"""Stored ANN index CLI (operators/similarity.build_ann_tables):
materialize a cell-partitioned IVF index over an embeddings parquet,
fold deltas in incrementally, and serve cosine top-k from the stored
table with directory-pruned probes.

    # build (sign-grid cells, 2^dims partitions; --kmeans K trains
    # centroids on a bounded sample instead)
    python scripts/ann_cli.py --input .../embeddings.parquet \
        --out /tmp/ann --build [--dims 4 | --kmeans 8]

    # serve: query vector taken from the stored index by id
    python scripts/ann_cli.py --out /tmp/ann --query-id 0 --k 10 --probes 2

    # incremental: append new vectors under the frozen cell rule
    python scripts/ann_cli.py --input .../delta.parquet --out /tmp/ann --compact

    # delete vectors: tombstones exclude them from serving instantly;
    # --purge-deleted rewrites ONLY the affected cell=N/ directories
    python scripts/ann_cli.py --out /tmp/ann --delete-ids 3,17
    python scripts/ann_cli.py --out /tmp/ann --purge-deleted
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="embeddings parquet (vec_id, embedding)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--compact", action="store_true")
    ap.add_argument("--dims", type=int, default=4,
                    help="sign-grid planes (2^dims cells)")
    ap.add_argument("--kmeans", type=int, default=0,
                    help="train K centroids instead of the sign grid")
    ap.add_argument("--train-sample", type=int, default=100_000,
                    help="vectors used for the k-means fit (lowest ids)")
    ap.add_argument("--stats", action="store_true",
                    help="print one JSON report: ann_stats, pending "
                         "tombstones, per-cell vector counts")
    ap.add_argument("--delete-ids",
                    help="comma-separated vec_ids to tombstone")
    ap.add_argument("--purge-deleted", action="store_true",
                    help="physically drop tombstoned vectors (rewrites "
                         "only the affected cell partitions)")
    ap.add_argument("--query-id", type=int, default=None)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--probes", type=int, default=1)
    ap.add_argument("--probe-all", action="store_true")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from invertedindexbuilder_spark.operators.similarity import (
        ann_topk_stored,
        build_ann_tables,
        compact_ann_tables,
        delete_ann_vectors,
        kmeans_fit,
        purge_ann_deletes,
    )
    from invertedindexbuilder_spark.session import get_spark

    spark = get_spark(app_name="ann-cli", cores=args.cores,
                      shuffle_partitions=max(args.cores, 8))
    spark.sparkContext.setLogLevel("ERROR")

    if args.build:
        emb = spark.read.parquet(args.input)
        cents = None
        if args.kmeans:
            cents = kmeans_fit(
                emb.orderBy("vec_id").limit(args.train_sample),
                k=args.kmeans,
            )
        info = build_ann_tables(
            spark, emb, args.out, dims=args.dims, centroids=cents
        )
        print(json.dumps(info))
    elif args.compact:
        info = compact_ann_tables(
            spark, spark.read.parquet(args.input), args.out
        )
        print(json.dumps(info))

    if args.delete_ids:
        ids = [int(x) for x in args.delete_ids.split(",") if x.strip()]
        print(json.dumps(delete_ann_vectors(spark, args.out, ids)))
    if args.purge_deleted:
        print(json.dumps(purge_ann_deletes(spark, args.out)))

    if args.stats:
        from pyspark.sql import functions as F  # noqa: F811

        from invertedindexbuilder_spark.catalog import Catalog
        from invertedindexbuilder_spark.operators.similarity import (
            load_ann_tombstones,
        )

        cat = Catalog(spark, args.out)
        report = cat.read("ann_stats").collect()[0].asDict()
        tomb = load_ann_tombstones(spark, args.out)
        report["n_tombstones"] = int(tomb.count()) if tomb is not None else 0
        report["cells"] = {
            int(r["cell"]): int(r["n"])
            for r in cat.read("ann_vectors")
            .groupBy("cell").agg(F.count("*").alias("n"))
            .orderBy("cell").collect()
        }
        print(json.dumps(report))

    if args.query_id is not None:
        rows = ann_topk_stored(
            spark, args.out, query_vec_id=args.query_id, k=args.k,
            n_probes=args.probes, probe_all=args.probe_all,
        ).collect()
        for r in rows:
            print(f"{r['cosine']:.6f}\t{r['vec_id']}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
