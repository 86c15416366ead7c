"""Deterministic synthetic ``docs_src`` corpus (FIXTURES.md).

Pure function of (row index, seed): generation happens distributed via
``spark.range(n).mapInPandas`` so sf-bench corpora never bottleneck on
the driver, and the same rows are produced at any parallelism.

The vocabulary exercises every semantic edge SURVEY.md found: a ~95%-df
stopword (multi-block + skew), zipf mid-frequency terms, df<=3 rares,
digit/alnum tokens, exactly-15-char terms incl. a 14-prefix collision
pair (D5), >15-char identifiers (dropped), the trailing-drop quirk D0
(half the docs end in an alnum token, half in '.'), case folding,
delimiter soup, empty-ish docs, and the byte-wise-largest sentinel
``zzzsentinel`` that pins reference defect D2.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from invertedindexbuilder_spark.schemas import DOCS_SRC

LANGS = ["py", "java", "c", "go", "md"]

MID_TERMS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi", "rho",
    "sigma", "tau", "upsilon", "phi", "chi", "psi", "omega", "index",
    "build", "merge", "sort", "parse", "query", "block", "spark", "shard",
    "token", "score", "rank", "fetch", "cache", "batch", "file", "table",
    "joink", "scan", "group", "limit", "order", "value", "terms", "docs",
    "posting",
]

SPECIALS = [
    "42", "0xdeadbeef", "v2",
    "abcdefghijklmno", "abcdefghijklmnz",  # 15-char, shared 14-prefix (D5)
    "getUserAccountManager", "abcdefghijklmnop",  # >15: dropped by P1
    "Hello", "HELLO", "hello",
    "foo_bar-baz.qux(x,y)",
]


def _gen_rows(
    indices: np.ndarray, seed: int, token_range: tuple[int, int] = (5, 401)
) -> pd.DataFrame:
    rows = {k: [] for k in ["repo", "path", "commit", "lang", "content"]}
    for i in indices.tolist():
        rng = np.random.default_rng((seed, i))
        r, p = i % 4, (i // 4) % 8
        lang = LANGS[i % len(LANGS)]
        rows["repo"].append(f"org{r:02d}/proj{p:02d}")
        rows["path"].append(f"src/dir{i % 7}/file{i:05d}.{lang}")
        rows["commit"].append(f"{(i * 2654435761) % (1 << 160):040x}")
        rows["lang"].append(lang)
        rows["content"].append(_gen_content(rng, i, token_range))
    return pd.DataFrame(rows)


# zipf-ish mid-frequency weights, hoisted (r8): recomputing the
# normalized array per document was ~15 % of generation time; the
# module-level value is float-identical to the old per-call computation
_ZIPF_W = 1.0 / np.arange(1, len(MID_TERMS) + 1)
_ZIPF_W /= _ZIPF_W.sum()
# pre-converted ndarray: Generator.choice converts a Python list to an
# array on EVERY call; passing the array consumes the identical random
# stream (conversion happens before any drawing), so output bytes are
# unchanged (pinned in tests/test_trec_source.py::test_gen_rows_pinned)
_MID_TERMS_ARR = np.array(MID_TERMS)
# Generator.choice(p=...) recomputes cdf = p.cumsum(); cdf /= cdf[-1]
# and then draws ONE rng.random(size) batch and searchsorts it
# (side='right').  Precomputing the identical cdf and issuing the same
# single random() call reproduces choice's output bit-for-bit while
# skipping its per-call validation/allocation (~25 % of generation) —
# byte-identity pinned in tests/test_trec_source.py::test_gen_rows_pinned.
_ZIPF_CDF = _ZIPF_W.cumsum()
_ZIPF_CDF /= _ZIPF_CDF[-1]


def _gen_content(
    rng: np.random.Generator, i: int, token_range: tuple[int, int] = (5, 401)
) -> str:
    if i % 97 == 13:
        return ""  # empty doc: still gets a doc_id, counts in N/d_avr
    if i % 97 == 29:
        return "."
    n_tokens = int(rng.integers(token_range[0], token_range[1]))
    parts: list[str] = []
    if rng.random() < 0.95:
        parts.append("common")  # stopword-like: df >> 128 => multi-block
    # zipf-ish mid-frequency body (== rng.choice(MID_TERMS, size=n,
    # p=_ZIPF_W) — see _ZIPF_CDF note)
    idx = _ZIPF_CDF.searchsorted(rng.random(n_tokens), side="right")
    parts.extend(_MID_TERMS_ARR[idx].tolist())
    if rng.random() < 0.12:
        parts.append(f"rare{int(rng.integers(0, 400)):04d}")
    if rng.random() < 0.25:
        parts.append(SPECIALS[int(rng.integers(0, len(SPECIALS)))])
    if i % 50 < 3:
        parts.append("zzzsentinel")  # D2 sentinel (byte-wise largest term)
    # sep after token j is "\n" when j % 17 == 16 else " ": equivalent
    # to space-joining groups of 17 and newline-joining the groups
    # (r8 — replaces a per-token append loop, byte-identical)
    body = "\n".join(
        " ".join(parts[k : k + 17]) for k in range(0, len(parts), 17)
    )
    # D0 edge: half the docs end in an alnum char (their last token is
    # dropped by the reference tokenizer), half end with punctuation.
    if i % 2 == 0:
        return body + " trailingdrop"
    return body + " ."


def synthetic_docs_src(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    num_partitions: int | None = None,
    token_range: tuple[int, int] = (5, 401),
    start: int = 0,
    with_ids: bool = False,
) -> DataFrame:
    """token_range (5, 401) is the FIXTURES.md contract (oracle corpora
    must keep it); bench corpora may pass a source-file-sized range.
    ``start`` shifts the row-index range — rows [start, start+n_docs)
    — so a compaction DELTA corpus is generated disjoint from (and
    identical to the corresponding slice of) a bigger corpus.

    ``with_ids=True`` emits ``doc_id`` = row index, exercising the
    build's pre-assigned-id ingestion path (plans.build.prepare_docs):
    content then never enters a shuffle, which is what lets 10^7.5-doc
    bench builds fit a single node's disk."""
    if num_partitions is None:
        num_partitions = max(1, min(64, n_docs // 2000 + 1))

    schema = DOCS_SRC
    if with_ids:
        schema = T.StructType(
            [T.StructField("doc_id", T.LongType())] + list(DOCS_SRC.fields)
        )

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                out = _gen_rows(pdf["id"].values, seed, token_range)
                if with_ids:
                    out.insert(0, "doc_id", pdf["id"].values)
                yield out

    return (
        spark.range(start, start + n_docs, numPartitions=num_partitions)
        .mapInPandas(gen, schema=schema)
    )


def synthetic_docs_src_pandas(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side twin of :func:`synthetic_docs_src` (oracle harness)."""
    return _gen_rows(np.arange(n_docs), seed)


def with_url(df: DataFrame) -> DataFrame:
    """Synthesized URL: starts with 'h' so the reference's URL filter
    (main.c:271-272) never drops a doc."""
    return df.withColumn(
        "url",
        F.concat(
            F.lit("http://"), F.col("repo"), F.lit("/"), F.col("path"),
            F.lit("#"), F.col("commit"),
        ),
    )


def docs_from_documents_table(documents: DataFrame) -> DataFrame:
    """Adapter: the shared testdata ``documents`` table -> the engine's
    docs shape.  doc_id comes with the table; doc_len is defined as
    length(text) here (no URL exists to apply the reference's
    len(url)+1+len(body) rule — that rule is exercised on docs_src)."""
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").alias("content"),
        F.length("text").cast("long").alias("doc_len"),
    )
