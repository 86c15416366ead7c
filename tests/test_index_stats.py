"""Smoke coverage for the index-introspection CLI (VERDICT r4 #8):
build a tiny index + search tables, run scripts/index_stats.build_report
against it, and assert the report carries the operational facts an
operator needs before serving or compacting (corpus stats, per-table
footprints through the generation pointers, posting distribution,
heaviest terms)."""

from __future__ import annotations

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from invertedindexbuilder_spark.plans.build import (  # noqa: E402
    build,
    build_search_tables,
)
from invertedindexbuilder_spark.sources.docs_src import (  # noqa: E402
    synthetic_docs_src,
)


def _load_index_stats():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "index_stats", os.path.join(here, "scripts", "index_stats.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_build_report_smoke(spark, tmp_out):
    build(spark, synthetic_docs_src(spark, 40), tmp_out, write_chunks=True)
    build_search_tables(
        spark,
        spark.createDataFrame(
            [(i, f"common alpha t{i % 7}") for i in range(40)],
            "doc_id long, text string",
        ),
        tmp_out,
        partition=False,
    )

    report = _load_index_stats().build_report(spark, tmp_out, top=3)

    assert report["stats"]["n_docs"] == 40
    # footprints resolve through the catalog for every present table
    for t in ("docs", "index", "index_chunks", "term_dfs", "search_stats"):
        assert report["tables"][t]["bytes"] > 0, t
    # posting distribution + heaviest terms come from the index artifact
    assert report["postings"]["terms"] > 0
    assert report["postings"]["df_max"] > 0
    assert len(report["heaviest_terms"]) == 3
    assert report["heaviest_terms"][0]["df"] == report["postings"]["df_max"]
    # build phases surfaced from the manifest (fingerprints stripped)
    assert "index" in report["phases"]
    assert "fingerprint" not in next(iter(report["phases"].values()))
