"""TREC-format source connector (reference S1/S2, main.c:237-305).

The reference streams a TREC file and splits documents between
``<TEXT>\\n`` and ``</TEXT>``; the first body line is the URL, the rest
is content, and docs whose URL doesn't start with 'h' are skipped (S3).

Spark-first reading: ``spark.read.text`` with a custom line separator
``</DOC>`` yields one row per document WITHOUT driver-side parsing and
splits large files across tasks; the span extraction is then plain
column expressions.  (The reference silently LOSES documents that
straddle its 100 MB read buffer — a chunk-boundary artifact we do not
replicate; lineSep splitting has no such boundary.)

Note url/content are extracted exactly as the reference sees them:
body = chars between <TEXT>\\n and </TEXT> minus the trailing newline,
split at the first newline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_trec(spark: SparkSession, path: str) -> DataFrame:
    """TREC file(s) -> (url, content) rows, reference semantics."""
    raw = spark.read.text(path, lineSep="</DOC>")
    # each row now holds "...<DOC>\n<TEXT>\nurl\ncontent\n</TEXT>\n";
    # the substring(-1) mirrors the reference's len = e-s-1, which
    # strips exactly the newline before </TEXT>
    df = (
        raw.select(
            F.regexp_extract(F.col("value"), r"(?s)<TEXT>\n(.*)</TEXT>", 1).alias(
                "_span"
            )
        )
        .filter(F.col("_span") != "")
        .select(
            F.expr("substring(_span, 1, length(_span) - 1)").alias("_body")
        )
        .select(
            F.substring_index("_body", "\n", 1).alias("url"),
            F.expr(
                "CASE WHEN instr(_body, '\n') > 0 "
                "THEN substring(_body, instr(_body, '\n') + 1) ELSE '' END"
            ).alias("content"),
        )
        .filter(F.col("url").startswith("h"))  # S3 document filter
    )
    return df


def trec_to_docs_src(trec_df: DataFrame) -> DataFrame:
    """Map TREC rows onto the docs_src shape by decomposing our
    synthesized url convention (http://repo/path#commit); foreign URLs
    fall back to url-as-path."""
    has_conv = F.col("url").rlike(r"^http://[^/]+/[^#]+#[0-9a-f]+$")
    stripped = F.regexp_replace("url", r"^http://", "")
    repo = F.when(
        has_conv,
        F.concat_ws(
            "/",
            F.split_part(stripped, F.lit("/"), F.lit(1)),
            F.split_part(stripped, F.lit("/"), F.lit(2)),
        ),
    ).otherwise(F.lit("trec"))
    rest = F.when(
        has_conv, F.regexp_extract(stripped, r"^[^/]+/[^/]+/([^#]+)#", 1)
    ).otherwise(F.col("url"))
    commit = F.when(
        has_conv, F.regexp_extract("url", r"#([0-9a-f]+)$", 1)
    ).otherwise(F.lit("0" * 40))
    return trec_df.select(
        repo.alias("repo"),
        rest.alias("path"),
        commit.alias("commit"),
        F.lit(None).cast("string").alias("lang"),
        F.col("content"),
    )
