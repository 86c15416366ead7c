"""spark-submit entry point: curate a corpus before indexing.

    spark-submit --py-files engine.zip scripts/curate_corpus.py \
        --input /path/docs_src_parquet --out /path/curate_root \
        --langs en,de --min-quality 0.2 --near-dup 0.85

Writes keep_list + removals tables under --out and prints the staged
report as one JSON line.  Optionally chains straight into an index
build of the curated view (--build-index /path/idx_root) — content is
never copied; the build reads the source semi-joined on the keep list.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet dir with docs_src schema")
    ap.add_argument("--synthetic", type=int, help="generate N synthetic docs")
    ap.add_argument("--out", required=True, help="curation output root")
    ap.add_argument("--langs", default=None,
                    help="comma-separated language allowlist (off if unset)")
    ap.add_argument("--min-quality", type=float, default=0.2,
                    help="minimum quality_score (-1 to disable)")
    ap.add_argument("--max-dup-word-frac", type=float, default=None,
                    help="repetition cap (off if unset)")
    ap.add_argument("--near-dup", type=float, default=0.85,
                    help="MinHash-LSH Jaccard threshold (-1 to disable)")
    ap.add_argument("--no-exact-dedup", action="store_true")
    ap.add_argument("--build-index", default=None,
                    help="after curating, build an index of the curated "
                         "view at this root")
    ap.add_argument("--delta", metavar="BASE_SRC_PARQUET", default=None,
                    help="treat --input as a DELTA: curate it against "
                         "the existing root's stored fingerprints "
                         "(exact + near dedup vs the base); BASE_SRC "
                         "is the base corpus parquet, read only for "
                         "near-dup candidate verification")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    if args.cores is not None:
        from invertedindexbuilder_spark.session import get_spark

        spark = get_spark(app_name="curate", cores=args.cores,
                          shuffle_partitions=max(args.cores, 8))
    else:
        spark = SparkSession.builder.appName("curate").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from invertedindexbuilder_spark.plans.curate import curate, curated_docs
    from invertedindexbuilder_spark.sources.docs_src import synthetic_docs_src

    if args.synthetic:
        src = synthetic_docs_src(spark, args.synthetic)
    elif args.input:
        src = spark.read.parquet(args.input)
    else:
        ap.error("need --input or --synthetic")

    t0 = time.time()
    if args.delta:
        from invertedindexbuilder_spark.plans.curate import curate_delta

        manifest = curate_delta(
            spark,
            src,
            args.out,
            base_src=spark.read.parquet(args.delta),
            langs=args.langs.split(",") if args.langs else None,
            min_quality=None if args.min_quality < 0 else args.min_quality,
            max_dup_word_frac=args.max_dup_word_frac,
            near_dup_threshold=None if args.near_dup < 0 else args.near_dup,
        )
        phase_key = sorted(
            k for k in manifest["phases"] if k.startswith("curate_delta")
        )[-1]
    else:
        manifest = curate(
            spark,
            src,
            args.out,
            langs=args.langs.split(",") if args.langs else None,
            min_quality=None if args.min_quality < 0 else args.min_quality,
            max_dup_word_frac=args.max_dup_word_frac,
            exact_dedup=not args.no_exact_dedup,
            near_dup_threshold=None if args.near_dup < 0 else args.near_dup,
        )
        phase_key = "curate"
    report = {
        k: v
        for k, v in manifest["phases"][phase_key].items()
        if k not in ("status", "fingerprint")
    }
    if args.build_index:
        from invertedindexbuilder_spark.plans.build import build

        bm = build(spark, curated_docs(spark, src, args.out), args.build_index)
        report["index_terms"] = bm["phases"]["index"]["terms"]
        report["index_postings"] = bm["phases"]["index"]["postings"]
    report["total_wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
