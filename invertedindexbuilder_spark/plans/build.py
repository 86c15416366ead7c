"""End-to-end index build plan: docs_src -> docs, postings*, index, stats.

Phase mapping to the reference (SURVEY §3.1) — each materialized table
is the analog of one of its file boundaries, and each is a resumable
checkpoint with lineage + metrics in ``manifest.json``:

  reference phase                       | this plan
  --------------------------------------+----------------------------------
  PARSE  (tokenize + tf + doc table)    | docs table + postings (narrow)
  SORT + MERGE (external sort runs)     | one repartitionByRange shuffle
  FINAL BUILD (blockwise encode)        | streaming encoder -> index table
  lexicon/doc_table/inverted_list files | docs / stats / index tables

Resume: a phase whose output table exists and whose manifest entry
matches the input fingerprint is skipped (kill the driver mid-build,
re-run, identical artifacts — tests/test_resume.py).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from invertedindexbuilder_spark.catalog import Catalog
from invertedindexbuilder_spark.operators.docids import assign_doc_ids
from invertedindexbuilder_spark.operators.index_build import (
    DEFAULT_CHUNK_BLOCKS,
    DEFAULT_SALT_THRESHOLD,
    encode_chunks,
    heavy_terms,
    merge_chunks,
)
from invertedindexbuilder_spark.operators.postings import build_postings
from invertedindexbuilder_spark.sources.docs_src import with_url


class BuildManifest:
    """Per-phase lineage + metrics, JSON on the output root."""

    def __init__(self, root: str):
        self.path = os.path.join(root, "manifest.json")
        self.data: dict = {"phases": {}}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.data = json.load(f)

    def phase_done(self, name: str, fingerprint: str) -> bool:
        ph = self.data["phases"].get(name)
        return bool(ph and ph.get("status") == "done" and ph.get("fingerprint") == fingerprint)

    def record(self, name: str, fingerprint: str, metrics: dict) -> None:
        self.data["phases"][name] = {
            "status": "done",
            "fingerprint": fingerprint,
            **metrics,
        }
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=2, sort_keys=True)
        os.replace(tmp, self.path)


def _fingerprint(df: DataFrame, keys: list[str]) -> str:
    """Cheap deterministic input fingerprint: row count + key hash xor."""
    agg = df.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64(*keys)).alias("h"),  # xor: order-free, no ANSI overflow
    ).collect()[0]
    return f"n={agg['n']},h={agg['h']}"


def prepare_docs(docs_src: DataFrame) -> DataFrame:
    """docs_src -> docs: deterministic doc_id, synthesized url, the
    reference's doc_len = len(url) + 1 + len(content) (size_of_doc,
    main.c:274 + process_document), sha256(content) per-row invariant."""
    with_ids = assign_doc_ids(docs_src)
    return with_url(with_ids).select(
        "doc_id",
        "repo",
        "path",
        "commit",
        "url",
        (F.length("url") + F.lit(1) + F.length(F.coalesce(F.col("content"), F.lit(""))))
        .cast("long")
        .alias("doc_len"),
        F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("content_sha256"),
        "content",
    )


def build(
    spark: SparkSession,
    docs_src: DataFrame,
    out_root: str,
    salt_threshold: int = DEFAULT_SALT_THRESHOLD,
    chunk_blocks: int = DEFAULT_CHUNK_BLOCKS,
    checkpoint_postings: bool = False,
    num_partitions: int | None = None,
) -> dict:
    """Run (or resume) the full build.  Returns the manifest dict."""
    cat = Catalog(spark, out_root)
    manifest = BuildManifest(out_root)
    fp = _fingerprint(docs_src, ["repo", "path", "commit"])

    # ---- phase 1: docs (PARSE side output F3 + doc ids) ----
    t0 = time.time()
    if not (manifest.phase_done("docs", fp) and cat.exists("docs")):
        docs = prepare_docs(docs_src)
        cat.write(docs, "docs")
        n_docs = cat.read("docs").count()
        manifest.record(
            "docs", fp, {"rows": n_docs, "wall_s": round(time.time() - t0, 3)}
        )
    docs = cat.read("docs")

    # Guard tokenizer parallelism: a small docs table read back from
    # parquet can coalesce to a handful of input splits, serializing
    # the (CPU-bound) tokenize stage.  Cheap at small scale; at real
    # scale the table has plenty of splits and this never triggers.
    min_par = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    if docs.rdd.getNumPartitions() < min_par:
        docs = docs.repartition(min_par)

    # ---- phase 2: postings (PARSE main output; optional checkpoint = the
    # reference's tmp/intermediate-N boundary) ----
    t0 = time.time()
    if checkpoint_postings:
        if not (manifest.phase_done("postings", fp) and cat.exists("postings")):
            cat.write(build_postings(docs), "postings")
            manifest.record(
                "postings",
                fp,
                {
                    "rows": cat.read("postings").count(),
                    "wall_s": round(time.time() - t0, 3),
                },
            )
        postings = cat.read("postings")
    else:
        postings = build_postings(docs)

    # ---- phase 3: index (SORT+MERGE shuffle + FINAL BUILD encode) ----
    t0 = time.time()
    if not (manifest.phase_done("index", fp) and cat.exists("index")):
        heavy = heavy_terms(postings, salt_threshold)
        chunks = encode_chunks(
            postings,
            num_partitions=num_partitions,
            salt_threshold=salt_threshold,
            chunk_blocks=chunk_blocks,
            heavy=heavy,
        )
        index = merge_chunks(chunks)
        cat.write(index, "index")
        idx = cat.read("index")
        m = idx.agg(
            F.count("*").alias("terms"),
            F.sum("df").alias("postings"),
            F.sum(F.length("payload")).alias("payload_bytes"),
            F.sum(F.size("last_doc_ids")).alias("blocks"),
        ).collect()[0]
        manifest.record(
            "index",
            fp,
            {
                "terms": m["terms"],
                "postings": m["postings"],
                "payload_bytes": m["payload_bytes"],
                "blocks": m["blocks"],
                "salted_terms": len(heavy),
                "wall_s": round(time.time() - t0, 3),
            },
        )

    # ---- phase 4: stats (query-session constants, Q1) ----
    t0 = time.time()
    if not (manifest.phase_done("stats", fp) and cat.exists("stats")):
        idx = cat.read("index")
        d = docs.agg(
            F.count("*").alias("n_docs"), F.sum("doc_len").alias("sum_doc_len")
        ).collect()[0]
        i = idx.agg(
            F.count("*").alias("n_terms"), F.sum("df").alias("n_postings")
        ).collect()[0]
        stats_df = spark.createDataFrame(
            [
                (
                    int(d["n_docs"]),
                    int(d["sum_doc_len"]),
                    int(i["n_terms"]),
                    int(i["n_postings"]),
                )
            ],
            schema="n_docs long, sum_doc_len long, n_terms long, n_postings long",
        )
        cat.write(stats_df, "stats")
        manifest.record("stats", fp, {"wall_s": round(time.time() - t0, 3)})

    return manifest.data


def load_stats(spark: SparkSession, out_root: str) -> dict:
    row = Catalog(spark, out_root).read("stats").collect()[0]
    return row.asDict()
