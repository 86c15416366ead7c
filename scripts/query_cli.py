"""spark-submit entry point: top-k BM25 queries against a built index.

    python scripts/query_cli.py --index /tmp/idx --mode and --k 10 data join
    python scripts/query_cli.py --index /tmp/idx            # interactive

Interactive protocol mirrors the reference's -q session (§3.2): first
line k, second line mode (0=AND, 1=OR), then one query per line.
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--mode", choices=["and", "or"], default="and")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--no-strict", action="store_true",
                    help="disable the reference's 14-char key truncation")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("terms", nargs="*")
    args = ap.parse_args()

    from invertedindexbuilder_spark.catalog import Catalog
    from invertedindexbuilder_spark.operators.query_exec import topk_bm25
    from invertedindexbuilder_spark.plans.build import load_stats
    from invertedindexbuilder_spark.session import get_spark

    spark = get_spark(app_name="query-cli", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    cat = Catalog(spark, args.index)
    index = cat.read("index").cache()
    docs = cat.read("docs").select("doc_id", "url", "doc_len").cache()
    index.count(), docs.count()  # warm the caches (Q1 session load)
    stats = load_stats(spark, args.index)

    def run(query: str, mode: str, k: int) -> None:
        t0 = time.time()
        res = topk_bm25(
            spark, index, docs, stats, query,
            mode=mode, k=k, strict=not args.no_strict,
        )
        out = res.join(docs.select("doc_id", "url"), "doc_id").orderBy(
            res["score"].desc(), "doc_id"
        )
        rows = out.collect()
        dt = (time.time() - t0) * 1000
        for r in rows:
            print(f"{r['score']:.6f}\t{r['doc_id']}\t{r['url']}")
        print(f"# {len(rows)} results in {dt:.0f} ms", file=sys.stderr)

    if args.terms:
        run(" ".join(args.terms), args.mode, args.k)
        return 0

    try:
        k = int(input("top-k: ").strip())
        mode = "or" if input("mode (0=AND,1=OR): ").strip() == "1" else "and"
        for line in sys.stdin:
            if line.strip():
                run(line.strip(), mode, k)
    except (EOFError, KeyboardInterrupt):
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
