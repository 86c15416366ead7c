"""Tombstone (and optionally purge) documents from a built index.

    # logical delete: instant, applied by every query surface
    python scripts/delete_docs.py --index /tmp/idx --ids 3,17,42
    python scripts/delete_docs.py --index /tmp/idx --ids-parquet del.parquet

    # physical purge: rewrite the index without the tombstoned docs,
    # remap survivor ids to dense 0..n-1, clear the tombstone set
    python scripts/delete_docs.py --index /tmp/idx --purge

Both steps publish atomically (one tables.json flip); see
invertedindexbuilder_spark/plans/deletes.py for the design.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--ids", help="comma-separated doc ids to tombstone")
    ap.add_argument("--ids-parquet",
                    help="parquet file/dir with a doc_id column to tombstone")
    ap.add_argument("--purge", action="store_true",
                    help="physically remove all tombstoned docs (after "
                         "applying --ids/--ids-parquet, if given)")
    ap.add_argument("--skip-search-tables", action="store_true",
                    help="don't rewrite stored search tables during "
                         "--purge (refuses if any exist — their doc ids "
                         "would go stale; rebuild them after)")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()
    if not (args.ids or args.ids_parquet or args.purge):
        ap.error("nothing to do: pass --ids, --ids-parquet, and/or --purge")

    from invertedindexbuilder_spark.plans.deletes import (
        delete_docs,
        purge_deletes,
    )
    from invertedindexbuilder_spark.session import get_spark

    spark = get_spark(app_name="delete-docs", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {}
    if args.ids:
        ids = [int(x) for x in args.ids.split(",") if x.strip()]
        out.update(delete_docs(spark, args.index, ids))
    if args.ids_parquet:
        out.update(
            delete_docs(spark, args.index, spark.read.parquet(args.ids_parquet))
        )
    if args.purge:
        out.update(
            purge_deletes(
                spark, args.index,
                purge_search_tables=not args.skip_search_tables,
            )
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
