"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one implemented operator family from
SURVEY.md §2 (or a training-pipeline extension) over the shared
testdata tables; ``oracle_sql()`` holds the DuckDB twin.  Both sides
round floating outputs and use the same md5-prefix hash primitive so
value-hash comparison is deterministic across engines.

Coverage map (SURVEY §2 rows -> queries):
  P1/P1b/A1 tokenizer+tf    -> postings
  M2/F2 df, lexicon         -> term_stats, doc_table
  Q1 stats                  -> corpus_stats
  C1/C2/F1 encoder geometry -> index_meta (varbyte sizes, blocks)
  Q2/Q6/Q8/Q9 conj BM25     -> bm25_and, bm25_and_unknown
  Q7 disj BM25              -> bm25_or, bm25_or_dup
  chunked serving (r2)      -> bm25_and_chunked, bm25_or_chunked
  incremental compaction    -> index_compacted
  federated merge (r3)      -> index_federated
  incr. search tables (r4)  -> search_dfs_compacted
  stored ANN serving (r5)   -> ann_ivf_stored
  boolean NOT / facets (r3) -> bm25_and_not, bm25_filtered
  S4 sampling               -> sample_mod10
  training-data extensions  -> dedup_exact, dedup_jaccard,
                               dedup_minhash_lsh, simhash,
                               fingerprint_winnow, embed_near_dup,
                               lang_id, quality_score, token_counts,
                               content_hash, ann_cosine_topk,
                               ann_ivf_topk, ann_ivf_probe1/5,
                               ann_kmeans_topk, media_features,
                               media_frames, curated_corpus,
                               pack_sequences, stratified_sample
  curation suite (r3)       -> repetition_stats, top_bigrams,
                               decontaminate, pii_scrub,
                               source_dup_stats, corpus_report,
                               dedup_clusters, simhash_pairs
  code/search suite (r3)    -> code_subtokens, code_stats,
                               phrase_search, substring_search,
                               fuzzy_terms, prefix_terms,
                               related_terms
  Spark-primitive demos     -> lineitem_rollup, events_hourly,
                               sessionize, asof_latest_order,
                               tpch_q3ish
"""

from __future__ import annotations

import os

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SF = "/root/testdata/sf0.001"

# ----------------------------------------------------------------- shared SQL

# Exact-semantics tokenizer (reference main.c:104-123 incl. trailing-drop
# D0 and the 1..15 length filter) as DuckDB SQL.  NB: RE2's '$' does not
# match before a trailing newline, same as Python's \Z — verified.
TOKENIZE_CTE = """
raw AS (
  SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS l,
         regexp_matches(text, '[A-Za-z0-9]$') AS ends_alnum
  FROM documents
),
tok AS (
  SELECT doc_id, lower(t) AS term
  FROM (
    SELECT doc_id,
           unnest(CASE WHEN ends_alnum THEN l[1:len(l)-1] ELSE l END) AS t
    FROM raw
  )
  WHERE len(t) BETWEEN 1 AND 15
),
postings AS (
  SELECT term, doc_id, count(*)::BIGINT AS tf FROM tok GROUP BY term, doc_id
)
"""

BM25_PRELUDE = (
    "WITH "
    + TOKENIZE_CTE
    + """,
doclen AS (SELECT doc_id, length(text)::BIGINT AS doc_len FROM documents),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         (SELECT sum(doc_len) FROM doclen)::BIGINT AS sdl
),
tdf AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY term),
matched AS (SELECT q.term, q.w, t.df FROM qterms q JOIN tdf t USING (term)),
contrib AS (
  SELECT p.doc_id, m.term,
         m.w * log2((s.n - m.df + 0.5) / (m.df + 0.5)) * 2.2 * p.tf
         / (1.2 * (0.25 + 0.75 * d.doc_len / (s.sdl / (s.n - 1.0))) + p.tf) AS c
  FROM postings p
  JOIN matched m ON p.term = m.term
  JOIN doclen d ON p.doc_id = d.doc_id
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, round(sum(c), 5) AS score, count(DISTINCT term) AS nk
  FROM contrib GROUP BY doc_id
)
"""
)


def _bm25_sql(
    qterms: list[tuple[str, int]], mode: str, k: int, extra: str = ""
) -> str:
    """``extra``: additional predicate ANDed into the final agg filter
    (NOT-term exclusion, faceted doc filters)."""
    vals = ", ".join(f"('{t}', {w})" for t, w in qterms)
    conds = []
    if mode == "and":
        conds.append("nk = (SELECT count(*) FROM matched)")
    if extra:
        conds.append(extra)
    where = f"WHERE {' AND '.join(conds)}" if conds else ""
    return (
        f"WITH qterms(term, w) AS (VALUES {vals}),"
        + BM25_PRELUDE[len("WITH ") :]
        + f"SELECT doc_id, score FROM agg {where} "
        f"ORDER BY score DESC, doc_id LIMIT {k}"
    )


def _bm25_batch_sql(
    queries: list[tuple[int, list[tuple[str, int]]]], mode: str, k: int
) -> str:
    """Oracle twin of operators/query_batch.topk_bm25_batch: UNION ALL
    of the per-query single-query oracle, each re-ranked with the same
    (score DESC, doc_id) policy."""
    parts = []
    for qid, qterms in queries:
        inner = _bm25_sql(qterms, mode, k)
        parts.append(
            f"SELECT {qid}::BIGINT AS query_id, doc_id, score, "
            "(row_number() OVER (ORDER BY score DESC, doc_id))::INT AS rank "
            f"FROM ({inner})"
        )
    return " UNION ALL ".join(parts)


# The dedup corpus: documents plus deterministic exact copies
# (doc_id+100000) and mutated near-copies (doc_id+200000) of the first
# 20 docs — the shared tables contain no natural duplicates, so the
# dedup operators need planted ones (identical in Spark and SQL).
# The planted SHORT docs (0/1/2/3 tokens) exercise the sub-n-gram guard
# (Spark's unguarded sequence(1,0) is descending and crashes; DuckDB's
# generate_series(1,0) is empty — both must agree on the empty set).
# Batch-serving gate queries: known terms, duplicate-term weights, an
# unknown term (dropped -> single-found-term AND), disjoint per query.
BATCH_AND_QUERIES = [
    (1, [("data", 1), ("join", 1)]),
    (2, [("filter", 1), ("zzznotaterm", 1)]),
    (3, [("data", 2), ("window", 1)]),
]
BATCH_OR_QUERIES = [
    (1, [("spark", 1), ("merge", 1), ("vector", 1)]),
    (2, [("data", 2), ("window", 1)]),
    (3, [("merge", 1), ("filter", 1), ("data", 2)]),
]

DEDUP_SUFFIX = " mutated suffix tokens appended here"
SHORT_DOCS = [
    (300000, ""),
    (300001, "one"),
    (300002, "only two"),
    (300003, "three short tokens"),
]
_SHORT_VALUES = ", ".join(f"({i}, '{t}')" for i, t in SHORT_DOCS)
DEDUP_CORPUS_SQL = f"""
dd AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 20
  UNION ALL
  SELECT doc_id + 200000, text || '{DEDUP_SUFFIX}' FROM documents WHERE doc_id < 20
  UNION ALL
  SELECT * FROM (VALUES {_SHORT_VALUES}) sd(doc_id, text)
)
"""

SHINGLE_CTE = """
sl AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'), t -> t) AS l
  FROM dd
),
shing AS (
  SELECT DISTINCT doc_id, s AS shingle
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, greatest(len(l) - 2, 0)),
             i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS s
    FROM sl
  )
)
"""

JACCARD_CTES = """
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM shing GROUP BY doc_id),
inter AS (
  SELECT s1.doc_id AS doc_a, s2.doc_id AS doc_b, count(*)::BIGINT AS n_inter
  FROM shing s1
  JOIN shing s2 ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
  {cand_join}
  GROUP BY 1, 2
)
"""

JACCARD_SELECT = """
SELECT i.doc_a, i.doc_b, i.n_inter,
       round(i.n_inter / (sa.sz + sb.sz - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE round(i.n_inter / (sa.sz + sb.sz - i.n_inter), 6) >= {tau}
"""

JACCARD_TAIL = JACCARD_CTES + JACCARD_SELECT

MINHASH_CTE = """
mh AS (
  SELECT doc_id, ks.k,
         min(((1000003 * ks.k + 12345) * h + (40503 * ks.k + 17))
             % 2147483647) AS minhash
  FROM (SELECT doc_id,
               CAST('0x' || SUBSTR(md5(shingle), 1, 8) AS BIGINT) AS h
        FROM shing) s
  CROSS JOIN generate_series(0, 15) ks(k)
  GROUP BY doc_id, ks.k
),
banded AS (
  SELECT doc_id, k // 4 AS band,
         md5(string_agg(k || ':' || minhash, ',' ORDER BY k)) AS bucket
  FROM mh GROUP BY doc_id, k // 4
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
              AND a.doc_id < b.doc_id
)
"""

LANGS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "que", "es", "una"],
}


def _lang_hits_sql(lang: str) -> str:
    # non-overlapping left-to-right match counting — same semantics as
    # Spark's regexp_count on the padded text
    terms = [f"len(regexp_extract_all(p, ' {w} '))" for w in LANGS[lang]]
    return " + ".join(terms)


# winner = FIRST language (sorted order) achieving the positive max —
# mirrors the Spark loop's strict-> running max exactly
def _lang_ctes(src: str) -> str:
    """Composable CTE pair: p0/hits/lang over any doc source."""
    return (
        f"p0 AS (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM {src}), "
        + "hits AS (SELECT doc_id, "
        + ", ".join(f"{_lang_hits_sql(lg)} AS h_{lg}" for lg in sorted(LANGS))
        + " FROM p0), "
        + "lang AS (SELECT doc_id, CASE "
        + "WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'und' "
        + "WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de' "
        + "WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en' "
        + "WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es' "
        + "ELSE 'fr' END AS lang_pred FROM hits)"
    )


LANG_SQL = (
    "WITH " + _lang_ctes("documents") + " SELECT doc_id, lang_pred FROM lang"
)


def _quality_ctes(src: str) -> str:
    """Composable CTE pair: m/qual over any doc source (same formula as
    the quality_score gate)."""
    return (
        f"m AS (SELECT doc_id, length(text)::BIGINT AS n_chars, "
        "len(regexp_extract_all(trim(text), '\\S+'))::BIGINT AS n_ws, "
        "length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::BIGINT AS n_punct "
        f"FROM {src}), "
        "qual AS (SELECT doc_id, round("
        "(CASE WHEN n_chars BETWEEN 50 AND 10000 THEN 1.0 ELSE 0.5 END) * "
        "(CASE WHEN n_ws > 0 AND n_chars * 1.0 / n_ws BETWEEN 3.0 AND 12.0 "
        " THEN 1.0 ELSE 0.5 END) * "
        "(1.0 - CASE WHEN n_chars > 0 THEN n_punct * 1.0 / n_chars ELSE 1.0 END)"
        ", 6) AS quality FROM m)"
    )


# ------------------------------------------------------------ spark helpers

_INDEX_CACHE: dict[str, dict] = {}


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# The index_meta oracle derives n_blocks/payload geometry from the
# UNSALTED whole-list layout (ceil(df/128) full blocks); skew salting
# produces ragged-but-self-describing tail blocks that would legitimately
# differ.  Gate builds therefore pin salting OFF; the salted/chunked
# layout is gate-covered separately via the bm25_*_chunked entries,
# whose results are layout-independent.
UNSALTED = 1 << 62


def _built(spark: SparkSession, sf_dir: str) -> dict:
    """Build (once per sf_dir) the index/docs/stats over documents."""
    if sf_dir in _INDEX_CACHE:
        return _INDEX_CACHE[sf_dir]
    from invertedindexbuilder_spark.operators.index_build import build_index
    from invertedindexbuilder_spark.operators.postings import build_postings
    from invertedindexbuilder_spark.sources.docs_src import (
        docs_from_documents_table,
    )

    docs = docs_from_documents_table(_documents(spark, sf_dir)).cache()
    postings = build_postings(docs).cache()
    index = build_index(postings, salt_threshold=UNSALTED).cache()
    agg = docs.agg(
        F.count("*").alias("n"),
        F.sum("doc_len").alias("sdl"),
        F.min("doc_len").alias("mdl"),
    ).collect()[0]
    env = {
        "docs": docs,
        "postings": postings,
        "index": index,
        "stats": {
            "n_docs": int(agg["n"]),
            "sum_doc_len": int(agg["sdl"]),
            "min_doc_len": int(agg["mdl"]),
        },
    }
    _INDEX_CACHE[sf_dir] = env
    return env


def _chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunked SERVING index over the same corpus, with an artificially
    LOW salt threshold so common terms really do span several doc-range
    chunks — the gate then exercises multi-chunk distributed decode
    (the 100 TB stopword path), not just the 1-chunk degenerate case."""
    env = _built(spark, sf_dir)
    if "chunks" not in env:
        from invertedindexbuilder_spark.operators.index_build import (
            encode_chunks,
        )

        env["chunks"] = encode_chunks(
            env["postings"], salt_threshold=64, chunk_blocks=1
        ).cache()
    return env["chunks"]


_PAIRS_CACHE: dict[str, DataFrame] = {}


def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified MinHash-LSH near-dup pairs over the planted-duplicate
    corpus, computed ONCE per sf_dir — minhash_dedup localCheckpoints
    its (small) output, so the three gates that consume the pair set
    (dedup_minhash_lsh, dedup_clusters, curated_corpus) share one LSH
    pass instead of re-running the shingle pipeline each."""
    if sf_dir not in _PAIRS_CACHE:
        from invertedindexbuilder_spark.operators.dedup import minhash_dedup

        _PAIRS_CACHE[sf_dir] = minhash_dedup(
            _dedup_corpus(spark, sf_dir), threshold=0.6
        )
    return _PAIRS_CACHE[sf_dir]


def _dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("doc_id", "text")
    head = d.filter(F.col("doc_id") < 20)
    return (
        d.unionAll(head.select(F.col("doc_id") + 100000, "text"))
        .unionAll(
            head.select(
                F.col("doc_id") + 200000,
                F.concat(F.col("text"), F.lit(DEDUP_SUFFIX)).alias("text"),
            )
        )
        .unionAll(
            spark.createDataFrame(SHORT_DOCS, "doc_id long, text string")
        )
    )


# Near-dup embedding corpus: embeddings (as double) plus exact copies
# (vec_id+100000) and sign-preserving perturbed copies (vec_id+200000,
# first component doubled) of the first 10 vectors — the shared table
# has no natural near-duplicates.
def _embed_dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _embeddings(spark, sf_dir).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    head = e.filter(F.col("vec_id") < 10)
    exact = head.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    pert = head.select(
        (F.col("vec_id") + 200000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) * F.lit(2.0)),
            F.slice(F.col("embedding"), F.lit(2), F.size("embedding") - 1),
        ).alias("embedding"),
    )
    return e.unionAll(exact).unionAll(pert)


def _bm25_query(
    spark: SparkSession,
    sf_dir: str,
    qterms: list[tuple[str, int]],
    mode: str,
    k: int,
    exclude: str | None = None,
    doc_filter=None,
) -> DataFrame:
    from invertedindexbuilder_spark.operators.query_exec import topk_bm25

    env = _built(spark, sf_dir)
    query = " ".join(t for t, w in qterms for _ in range(w))
    out = topk_bm25(
        spark,
        env["index"],
        env["docs"],
        env["stats"],
        query,
        mode=mode,
        k=k,
        round_digits=5,
        exclude=exclude,
        doc_filter=doc_filter,
    )
    return out.select("doc_id", "score")


def _bm25_chunked_query(
    spark: SparkSession, sf_dir: str, qterms: list[tuple[str, int]], mode: str, k: int
) -> DataFrame:
    from invertedindexbuilder_spark.operators.query_exec import (
        topk_bm25_chunked,
    )

    env = _built(spark, sf_dir)
    chunks = _chunked(spark, sf_dir)
    query = " ".join(t for t, w in qterms for _ in range(w))
    out = topk_bm25_chunked(
        spark,
        chunks,
        env["docs"],
        env["stats"],
        query,
        mode=mode,
        k=k,
        round_digits=5,
    )
    return out.select("doc_id", "score")


# ------------------------------------------------------------------- contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: conjunctive BM25 top-10 over the sf0.001 corpus."""
    return _bm25_query(spark, DEFAULT_SF, [("data", 1), ("join", 1)], "and", 10)


def _gate_round() -> int:
    """Current driver round, derived from the CORRECTNESS_r{N}.json
    files already committed next to this file (max N + 1).  Lets the
    gate rotation below advance every round without a manual bump."""
    import glob
    import re as _re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        if (m := _re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0) + 1


def _rotate_gates(d: dict) -> dict:
    """Deterministic per-round rotation of the gate dict (VERDICT r4 #1).

    The driver's CORRECTNESS sweep walks ``queries()`` in dict order
    under a budget that empirically caps at the first 50 entries
    (CORRECTNESS_r03/r04 both hold exactly the first 50 rows).  With 60
    gates, a fixed order leaves the same 10-gate tail permanently
    unattested.  The step is ``len - 50`` — exactly the size of the
    window's shadow — so consecutive rounds' shadows are disjoint and
    EVERY gate lands inside the driver's 50-row window at least every
    other round (r5's step of 10 under a 61-gate list left an 11-gate
    shadow whose consecutive rounds overlapped by one gate,
    `simhash_pairs`; VERDICT r5 #1).
    """
    names = list(d)
    step = max(1, len(names) - 50)
    off = (step * _gate_round()) % len(names)
    return {k: d[k] for k in names[off:] + names[:off]}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from invertedindexbuilder_spark.functions.text import (
        alnum_token_count,
        content_hash64,
        lang_id,
        quality_score,
        ws_token_count,
    )
    from invertedindexbuilder_spark.operators.dedup import (
        exact_duplicate_groups,
        jaccard_pairs,
        simhash,
    )
    from invertedindexbuilder_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    def postings(spark, sf_dir):
        env = _built(spark, sf_dir)
        return env["postings"].select(
            "term", "doc_id", F.col("tf").cast("long").alias("tf")
        )

    def term_stats(spark, sf_dir):
        env = _built(spark, sf_dir)
        return env["postings"].groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").cast("long").alias("cf")
        )

    def corpus_stats(spark, sf_dir):
        env = _built(spark, sf_dir)
        n = env["stats"]["n_docs"]
        sdl = env["stats"]["sum_doc_len"]
        terms = env["index"].count()
        nposts = env["postings"].count()
        # round via Spark's HALF_UP (Python round() is half-even and
        # would disagree with SQL ROUND at exact .5 boundaries)
        return spark.createDataFrame(
            [(n, sdl, terms, nposts, float(sdl) / (n - 1))],
            "n_docs long, sum_doc_len long, n_terms long, n_postings long, d_avr double",
        ).withColumn("d_avr", F.round("d_avr", 6))

    def index_meta(spark, sf_dir):
        env = _built(spark, sf_dir)
        return env["index"].select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.size("last_doc_ids").cast("long").alias("n_blocks"),
            F.element_at("last_doc_ids", -1).cast("long").alias("last_doc"),
            F.length("payload").cast("long").alias("payload_bytes"),
        )

    def doc_table(spark, sf_dir):
        return _documents(spark, sf_dir).select(
            "doc_id",
            F.length("text").cast("long").alias("doc_len"),
            F.sha2("text", 256).alias("content_sha256"),
        )

    def sample_mod10(spark, sf_dir):
        return (
            _documents(spark, sf_dir)
            .filter(F.col("doc_id") % 10 == 0)
            .select("doc_id", F.col("n_chars").cast("long").alias("n_chars"))
        )

    def bm25_and(spark, sf_dir):
        return _bm25_query(spark, sf_dir, [("data", 1), ("join", 1)], "and", 10)

    def bm25_or(spark, sf_dir):
        return _bm25_query(
            spark, sf_dir, [("spark", 1), ("merge", 1), ("vector", 1)], "or", 10
        )

    def bm25_or_dup(spark, sf_dir):
        return _bm25_query(spark, sf_dir, [("data", 2), ("window", 1)], "or", 10)

    def bm25_and_unknown(spark, sf_dir):
        return _bm25_query(
            spark, sf_dir, [("filter", 1), ("zzznotaterm", 1)], "and", 10
        )

    def bm25_and_chunked(spark, sf_dir):
        return _bm25_chunked_query(
            spark, sf_dir, [("data", 1), ("spark", 1)], "and", 10
        )

    def bm25_or_chunked(spark, sf_dir):
        return _bm25_chunked_query(
            spark, sf_dir, [("merge", 1), ("filter", 1), ("data", 2)], "or", 10
        )

    def bm25_batch_and(spark, sf_dir):
        # one job answers a TABLE of queries (operators/query_batch):
        # each matched index row decodes once however many queries
        # share the term; per-query top-k is a window
        from invertedindexbuilder_spark.operators.query_batch import (
            topk_bm25_batch,
        )

        env = _built(spark, sf_dir)
        qdf = spark.createDataFrame(
            [(q, " ".join(t for t, w in terms for _ in range(w)))
             for q, terms in BATCH_AND_QUERIES],
            "query_id long, text string",
        )
        return topk_bm25_batch(
            spark, env["index"], env["docs"], env["stats"], qdf,
            mode="and", k=10, round_digits=5,
        )

    def bm25_batch_or(spark, sf_dir):
        # the same batch operator against the CHUNKED serving table
        from invertedindexbuilder_spark.operators.query_batch import (
            topk_bm25_batch,
        )

        env = _built(spark, sf_dir)
        chunks = _chunked(spark, sf_dir)
        qdf = spark.createDataFrame(
            [(q, " ".join(t for t, w in terms for _ in range(w)))
             for q, terms in BATCH_OR_QUERIES],
            "query_id long, text string",
        )
        return topk_bm25_batch(
            spark, chunks, env["docs"], env["stats"], qdf,
            mode="or", k=10, round_digits=5,
        )

    def bm25_and_not(spark, sf_dir):
        # boolean NOT: docs containing the excluded term leave the
        # ranking (anti-join after the per-doc aggregate); IDF/d_avr
        # stay full-corpus — classic filtered-search semantics
        return _bm25_query(
            spark, sf_dir, [("data", 1), ("join", 1)], "and", 10,
            exclude="window",
        )

    def bm25_filtered(spark, sf_dir):
        # faceted search: a docs-side predicate restricts scoring via
        # the inner doc_len join (pushes into the docs scan at scale)
        return _bm25_query(
            spark, sf_dir, [("data", 1), ("join", 1)], "and", 10,
            doc_filter=F.col("doc_id") % 3 == 0,
        )

    def lang_id_q(spark, sf_dir):
        return _documents(spark, sf_dir).select(
            "doc_id", lang_id(F.col("text")).alias("lang_pred")
        )

    def quality_q(spark, sf_dir):
        return _documents(spark, sf_dir).select(
            "doc_id", quality_score(F.col("text")).alias("quality")
        )

    def token_counts(spark, sf_dir):
        return _documents(spark, sf_dir).select(
            "doc_id",
            ws_token_count(F.col("text")).cast("long").alias("ws_tokens"),
            alnum_token_count(F.col("text")).cast("long").alias("alnum_tokens"),
        )

    def pack_sequences_q(spark, sf_dir):
        # LLM training-data packing (concatenate-and-chunk): doc ->
        # sequence segment map; distributed prefix sums, no global
        # window (operators/packing.py)
        from invertedindexbuilder_spark.operators.packing import (
            pack_sequences,
        )

        docs = _documents(spark, sf_dir).select(
            "doc_id",
            ws_token_count(F.col("text")).cast("long").alias("n_tokens"),
        )
        return pack_sequences(docs, seq_len=512)

    def stratified_sample_q(spark, sf_dir):
        # reproducible training-data MIX: per-language keep rates via a
        # content-hash threshold (pure function of the row — stable
        # across partitionings, engines, and re-runs)
        from invertedindexbuilder_spark.operators.sampling import (
            stratified_sample,
        )

        d = _documents(spark, sf_dir).select(
            "doc_id", lang_id(F.col("text")).alias("lang_pred")
        )
        return stratified_sample(
            d, "doc_id", "lang_pred", {"en": 0.5, "de": 0.25},
            default_rate=0.1,
        )

    def content_hash(spark, sf_dir):
        return _documents(spark, sf_dir).select(
            "doc_id", content_hash64(F.col("text")).alias("h64")
        )

    def corpus_report_q(spark, sf_dir):
        # the pre-training corpus summary: per predicted language,
        # doc count + mean quality + total whitespace tokens — one
        # groupBy over pure column expressions
        d = _documents(spark, sf_dir).select(
            lang_id(F.col("text")).alias("lang_pred"),
            quality_score(F.col("text")).alias("q"),
            ws_token_count(F.col("text")).cast("long").alias("t"),
        )
        return d.groupBy("lang_pred").agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("q"), 6).alias("mean_quality"),
            F.sum("t").alias("total_tokens"),
        )

    def unigram_xent_q(spark, sf_dir):
        # perplexity-proxy quality signal: per-doc unigram
        # cross-entropy against the corpus's own distribution
        from invertedindexbuilder_spark.operators.curation import (
            unigram_cross_entropy,
        )

        return unigram_cross_entropy(
            _documents(spark, sf_dir).select("doc_id", "text")
        )

    def repetition_stats_q(spark, sf_dir):
        # Gopher-style repeat filters: dup-word fraction + top-bigram
        # occupancy (operators/curation.py)
        from invertedindexbuilder_spark.operators.curation import (
            repetition_stats,
        )

        return repetition_stats(_documents(spark, sf_dir))

    def top_bigrams_q(spark, sf_dir):
        # global corpus n-gram statistics (threshold-picking pass)
        from invertedindexbuilder_spark.operators.curation import top_ngrams

        return top_ngrams(_documents(spark, sf_dir), n=2, k=100)

    def decontaminate_q(spark, sf_dir):
        # benchmark decontamination: docs vs the doc_id%97==0 subset
        # playing the held-out benchmark role
        from invertedindexbuilder_spark.operators.curation import decontaminate

        d = _documents(spark, sf_dir).select("doc_id", "text")
        bench = d.filter(F.col("doc_id") % 97 == 0)
        return decontaminate(
            d.filter(F.col("doc_id") % 97 != 0), bench, n=3, tau=0.5
        )

    def pii_scrub_q(spark, sf_dir):
        # PII planted deterministically (the shared corpus has none),
        # then counted + redacted by pure column expressions
        from invertedindexbuilder_spark.functions.text import (
            pii_email_count,
            pii_phone_count,
            redact_pii,
        )

        d = _documents(spark, sf_dir).select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.when(
                    F.col("doc_id") % 10 == 0,
                    F.concat(
                        F.lit(" contact user"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com now"),
                    ),
                ).otherwise(F.lit("")),
                F.when(
                    F.col("doc_id") % 7 == 0,
                    F.concat(
                        F.lit(" call 555-"),
                        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                        F.lit("-1234"),
                    ),
                ).otherwise(F.lit("")),
            ).alias("text"),
        )
        return d.select(
            "doc_id",
            pii_email_count(F.col("text")).alias("n_emails"),
            pii_phone_count(F.col("text")).alias("n_phones"),
            F.md5(redact_pii(F.col("text"))).alias("redacted_md5"),
        )

    def code_subtokens_q(spark, sf_dir):
        # identifier subtoken postings: camelCase / UPPERRun /
        # snake_case / digit boundaries split BEFORE tokenization, so a
        # code corpus's long identifiers survive the length filter
        # (reference main.c:104-123 drops >15-char tokens whole).
        # Identifiers are planted — the shared corpus has none.
        from invertedindexbuilder_spark.functions.code import subtokens

        d = _documents(spark, sf_dir).select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.when(
                    F.col("doc_id") % 5 == 0,
                    F.lit(
                        " getUserAccountManager parse_HTML_fast"
                        " HTTPServer2 utf8Decoder"
                    ),
                ).otherwise(F.lit("")),
            ).alias("text"),
        )
        return (
            d.select("doc_id", F.explode(subtokens(F.col("text"))).alias("subtoken"))
            .groupBy("doc_id", "subtoken")
            .agg(F.count("*").cast("long").alias("tf"))
        )

    def code_stats_q(spark, sf_dir):
        # per-line metrics (StarCoder/Codex pre-filters) over a corpus
        # with planted line structure (even doc_ids: spaces -> newlines)
        from invertedindexbuilder_spark.functions.code import (
            alnum_fraction,
            code_line_stats,
        )

        d = _documents(spark, sf_dir).select(
            "doc_id",
            F.when(
                F.col("doc_id") % 2 == 0, F.translate(F.col("text"), " ", "\n")
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        n_lines, max_len, mean_len = code_line_stats(F.col("text"))
        return d.select(
            "doc_id",
            n_lines.alias("n_lines"),
            max_len.alias("max_line_len"),
            mean_len.alias("mean_line_len"),
            alnum_fraction(F.col("text")).alias("alnum_frac"),
        )

    def phrase_search_q(spark, sf_dir):
        # positional phrase query (3 consecutive tokens) over
        # positional postings — the index class the reference computes
        # positions for but never stores (main.c:85-126)
        from invertedindexbuilder_spark.operators.textsearch import (
            phrase_match,
        )

        return phrase_match(
            _documents(spark, sf_dir).select("doc_id", "text"),
            "slow hash batch",
        )

    def substring_search_q(spark, sf_dir):
        # trigram-index substring search (Zoekt design): candidates
        # from trigram-posting intersection, exact contains verify
        from invertedindexbuilder_spark.operators.textsearch import (
            substring_search,
        )

        return substring_search(
            _documents(spark, sf_dir).select("doc_id", "text"), "le part"
        )

    def related_terms_q(spark, sf_dir):
        # query expansion: PMI-ranked co-occurring terms; the explode
        # is semi-join-restricted to docs containing the query term.
        # Served from MATERIALIZED artifacts (docs=None) — the at-scale
        # posture where no corpus-wide job runs at query time.
        from invertedindexbuilder_spark.operators.textsearch import (
            doc_term_postings,
            related_terms,
            term_dfs,
        )

        d = _documents(spark, sf_dir).select("doc_id", "text")
        dt = doc_term_postings(d)
        return related_terms(
            None, "data", k=20, min_co_df=2,
            doc_terms=dt, dfs=term_dfs(dt), n_docs=d.count(),
        )

    def fuzzy_terms_q(spark, sf_dir):
        # typo-tolerant vocabulary lookup (SymSpell deletion join):
        # candidates from shared deletion variants, exact levenshtein
        # verify on candidates only
        from invertedindexbuilder_spark.operators.dedup import tokens_expr
        from invertedindexbuilder_spark.operators.textsearch import (
            fuzzy_term_match,
        )

        vocab = _documents(spark, sf_dir).select(
            F.explode(tokens_expr("text")).alias("term")
        )
        return fuzzy_term_match(vocab, "tables", max_dist=1)

    def prefix_terms_q(spark, sf_dir):
        from invertedindexbuilder_spark.operators.dedup import tokens_expr
        from invertedindexbuilder_spark.operators.textsearch import (
            prefix_terms,
        )

        vocab = _documents(spark, sf_dir).select(
            F.explode(tokens_expr("text")).alias("term")
        )
        return prefix_terms(vocab, "s")

    def source_dup_stats_q(spark, sf_dir):
        # cross-source duplication with planted fork copies of the
        # first 20 docs under a synthetic 'planted' source
        from invertedindexbuilder_spark.operators.curation import (
            source_dup_stats,
        )

        d = _documents(spark, sf_dir).select("doc_id", "source", "text")
        planted = d.filter(F.col("doc_id") < 20).select(
            "doc_id", F.lit("planted").alias("source"), "text"
        )
        return source_dup_stats(d.unionAll(planted))

    def dedup_exact(spark, sf_dir):
        return exact_duplicate_groups(_dedup_corpus(spark, sf_dir)).select(
            "content_sha256",
            F.col("n_dups").cast("long").alias("n_dups"),
            "keep_doc_id",
            "max_doc_id",
        )

    def dedup_jaccard(spark, sf_dir):
        return jaccard_pairs(_dedup_corpus(spark, sf_dir), n=3, threshold=0.6)

    def dedup_minhash_lsh(spark, sf_dir):
        return _minhash_pairs(spark, sf_dir)

    def simhash_pairs_q(spark, sf_dir):
        # Hamming-banded simhash near-dup (Manku/Jain/Sarma): exact
        # pigeonhole candidates, popcount verify on candidates only
        from invertedindexbuilder_spark.operators.dedup import simhash_pairs

        return simhash_pairs(_dedup_corpus(spark, sf_dir), max_hamming=3)

    def dedup_clusters_q(spark, sf_dir):
        # transitive near-dup CLUSTERS: LSH pairs -> distributed
        # min-label propagation (connected components); pairwise
        # keep/lose under-merges chains, clusters are the correct
        # dedup decision unit
        from invertedindexbuilder_spark.operators.dedup import (
            dedup_clusters,
        )

        return dedup_clusters(
            _dedup_corpus(spark, sf_dir),
            threshold=0.6,
            pairs=_minhash_pairs(spark, sf_dir),
        )

    def simhash_q(spark, sf_dir):
        return simhash(_documents(spark, sf_dir).select("doc_id", "text"))

    def ann_cosine(spark, sf_dir):
        return cosine_topk(_embeddings(spark, sf_dir), query_vec_id=0, k=10)

    def ann_ivf(spark, sf_dir):
        return ivf_topk(
            _embeddings(spark, sf_dir), query_vec_id=0, k=10, probe_all=True
        )

    def ann_ivf_probe1(spark, sf_dir):
        # the pruned path that matters at scale: probe ONLY the query's
        # cell (oracle applies the identical cell restriction)
        return ivf_topk(
            _embeddings(spark, sf_dir), query_vec_id=0, k=10, probe_all=False
        )

    def ann_ivf_probe5(spark, sf_dir):
        # deterministic multi-probe (query cell + its 4 Hamming-1
        # neighbors): the recall knob, oracle-gated with the identical
        # 5-cell restriction
        return ivf_topk(
            _embeddings(spark, sf_dir), query_vec_id=0, k=10,
            probe_all=False, n_probes=5,
        )

    def ann_kmeans(spark, sf_dir):
        # trained-IVF (distributed Lloyd's) with probe_all: the cell
        # assignment is exercised end-to-end and the result is exact,
        # so centroid float jitter cannot leak into the gate; the
        # pruned-probe recall story is measured in test_kmeans_ivf.py
        from invertedindexbuilder_spark.operators.similarity import (
            ivf_kmeans_topk,
            kmeans_fit,
        )

        emb = _embeddings(spark, sf_dir)
        # at-scale posture (kmeans_fit docstring): train on a bounded
        # sample, assign the full corpus once.  probe_all keeps the
        # gate exact regardless of the trained centroids, so the fit
        # runs at GATE scale (k=4, one Lloyd iteration, 128-vector
        # sample — VERDICT r4 #2: this gate cost 45.6 s at k=8/iters=2
        # because each extra centroid doubles the assignment
        # expression Catalyst must codegen); the recall-vs-probes
        # story at real parameters lives in tests/test_kmeans_ivf.py.
        cents = kmeans_fit(emb.filter(F.col("vec_id") < 128), k=4, iters=1)
        return ivf_kmeans_topk(
            emb, query_vec_id=0, k=10, centroids=cents, probe_all=True,
        )

    def ann_ivf_stored(spark, sf_dir):
        # STORED IVF serving (r5): materialize the cell-partitioned ANN
        # table (cell=N/ dirs — probes prune file listings), serve the
        # single-probe top-k from it; the oracle applies the identical
        # cell restriction ad hoc.  localCheckpoint so the result
        # survives the tmpdir cleanup.
        import shutil as _sh
        import tempfile as _tf

        from invertedindexbuilder_spark.operators.similarity import (
            ann_topk_stored,
            build_ann_tables,
        )

        root = _tf.mkdtemp(prefix="gate_annidx_")
        try:
            build_ann_tables(spark, _embeddings(spark, sf_dir), root, dims=4)
            return ann_topk_stored(
                spark, root, query_vec_id=0, k=10, n_probes=1
            ).localCheckpoint()
        finally:
            _sh.rmtree(root, ignore_errors=True)

    def embed_near_dup(spark, sf_dir):
        from invertedindexbuilder_spark.operators.similarity import (
            embedding_near_dup,
        )

        return embedding_near_dup(
            _embed_dup_corpus(spark, sf_dir), threshold=0.8, planes=8
        )

    def fingerprint_winnow(spark, sf_dir):
        from invertedindexbuilder_spark.operators.dedup import (
            winnow_fingerprints,
        )

        corpus = (
            _documents(spark, sf_dir)
            .select("doc_id", "text")
            .unionAll(
                spark.createDataFrame(SHORT_DOCS, "doc_id long, text string")
            )
        )
        return winnow_fingerprints(corpus, k=5, window=4)

    def lineitem_rollup(spark, sf_dir):
        # grouping-sets primitive (reference has none, SURVEY §2.2)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        return (
            li.rollup("l_returnflag", "l_linestatus")
            .agg(
                F.count("*").alias("n_rows"),
                F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
                F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
                .alias("sum_disc_price"),
            )
            .select(
                F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
                F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
                "n_rows",
                "sum_qty",
                "sum_disc_price",
            )
        )

    def sessionize(spark, sf_dir):
        # gap-based sessionization (lag + cumulative-sum windows):
        # a >30-min silence starts a new session per user
        from pyspark.sql import Window as W

        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id",
            "user_id",
            F.col("ts").cast("timestamp").cast("long").alias("t"),
            "value",
        )
        w = W.partitionBy("user_id").orderBy("t", "event_id")
        sess = (
            ev.withColumn("prev_t", F.lag("t").over(w))
            .withColumn(
                "new_sess",
                F.when(
                    F.col("prev_t").isNull()
                    | (F.col("t") - F.col("prev_t") > 1800),
                    1,
                ).otherwise(0),
            )
            .withColumn(
                "session_id",
                F.sum("new_sess").over(
                    w.rowsBetween(W.unboundedPreceding, 0)
                ),
            )
        )
        return sess.groupBy("user_id", "session_id").agg(
            F.count("*").alias("n_events"),
            F.min("t").alias("t_start"),
            F.max("t").alias("t_end"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )

    def index_compacted(spark, sf_dir):
        # incremental compaction: index the first 400 docs, fold the
        # rest in as a delta WITHOUT re-encoding old postings; the
        # oracle sees only the final corpus-wide (term, df, last_doc)
        from invertedindexbuilder_spark.operators.index_build import (
            compact_chunks,
            encode_chunks,
            merge_chunks,
        )

        env = _built(spark, sf_dir)
        old_p = env["postings"].filter(F.col("doc_id") < 400)
        delta_p = env["postings"].filter(F.col("doc_id") >= 400)
        old_chunks = encode_chunks(old_p, salt_threshold=64, chunk_blocks=1)
        merged = merge_chunks(
            compact_chunks(
                old_chunks, delta_p, salt_threshold=64, chunk_blocks=1
            )
        )
        return merged.select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.element_at("last_doc_ids", -1).cast("long").alias("last_doc"),
        )

    def search_dfs_compacted(spark, sf_dir):
        # incremental SEARCH-TABLE maintenance (r4): build the stored
        # search indexes over the first half of the corpus, fold the
        # rest in with compact_search_tables (per-doc appends + one
        # atomic vocabulary-generation flip), and serve the global
        # term dfs from the stored table; the oracle computes the same
        # dfs over the WHOLE corpus in one shot — incremental ==
        # one-shot is the invariant
        import shutil as _sh
        import tempfile as _tf

        from invertedindexbuilder_spark.plans.build import (
            build_search_tables,
            compact_search_tables,
            load_search_tables,
        )

        # gate-scale slice (VERDICT r4 #2: this gate cost 42.7 s over
        # the full 500 docs): 150 base + 150 delta docs still exercise
        # the whole build -> compact -> atomic-flip -> serve path; the
        # oracle below applies the identical doc_id < 300 restriction
        d = (
            _documents(spark, sf_dir)
            .select("doc_id", "text")
            .filter(F.col("doc_id") < 300)
        )
        root = _tf.mkdtemp(prefix="gate_searchidx_")
        try:
            # partition=False: skips the ~10 range-boundary sampling
            # jobs whose fixed overhead dominates at 300 docs; the
            # at-scale layout (range-partitioned, sorted, pushdown-
            # prunable) is pinned by tests/test_search_tables.py
            build_search_tables(
                spark, d.filter(F.col("doc_id") < 150), root,
                max_dist=1, collect_counts=False, partition=False,
            )
            compact_search_tables(
                spark, d.filter(F.col("doc_id") >= 150), root,
                collect_counts=False, partition=False,
            )
            out = (
                load_search_tables(spark, root)["term_dfs"]
                .select(F.col("t").alias("term"), "df")
                .localCheckpoint()
            )
        finally:
            _sh.rmtree(root, ignore_errors=True)
        return out

    def index_federated(spark, sf_dir):
        # federated shard merge: two shards built INDEPENDENTLY with
        # their own dense ids; shard B's chunks rebase by +250 via the
        # one-varbyte-per-chunk first-gap patch (shift_chunks), union,
        # merge — the oracle sees only the corpus-wide result
        from invertedindexbuilder_spark.operators.index_build import (
            encode_chunks,
            merge_chunks,
            shift_chunks,
        )

        env = _built(spark, sf_dir)
        shard_a = env["postings"].filter(F.col("doc_id") < 250)
        shard_b = env["postings"].filter(F.col("doc_id") >= 250).withColumn(
            "doc_id", F.col("doc_id") - 250  # shard-local dense ids
        )
        chunks_a = encode_chunks(shard_a, salt_threshold=64, chunk_blocks=1)
        chunks_b = encode_chunks(shard_b, salt_threshold=64, chunk_blocks=1)
        merged = merge_chunks(
            chunks_a.unionByName(shift_chunks(chunks_b, 250))
        )
        return merged.select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.element_at("last_doc_ids", -1).cast("long").alias("last_doc"),
        )

    def index_purged(spark, sf_dir):
        # physical deletion (r6): purge doc_id % 7 == 3 from the
        # chunked index — untouched chunks take the one-varbyte
        # first-gap rebase, overlapping chunks decode/filter/re-encode,
        # survivor ids remap dense; the oracle rebuilds the same view
        # from the surviving corpus with a row_number remap
        import numpy as _np

        from invertedindexbuilder_spark.operators.index_build import (
            encode_chunks,
            merge_chunks,
            purge_chunks,
        )

        env = _built(spark, sf_dir)
        n = int(env["stats"]["n_docs"])
        deleted = _np.arange(3, n, 7, dtype=_np.int64)
        chunks = encode_chunks(
            env["postings"], salt_threshold=64, chunk_blocks=1
        )
        merged = merge_chunks(purge_chunks(chunks, deleted))
        return merged.select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.element_at("last_doc_ids", -1).cast("long").alias("last_doc"),
        )

    def bm25_and_deleted(spark, sf_dir):
        # logical deletion (tombstones, r6): docs with doc_id % 11 == 5
        # leave the ranking via exclude_doc_ids; IDF/d_avr stay
        # as-indexed — same filtered-search semantics as boolean NOT
        from invertedindexbuilder_spark.operators.query_exec import (
            topk_bm25,
        )

        env = _built(spark, sf_dir)
        tomb = env["docs"].select("doc_id").filter(F.col("doc_id") % 11 == 5)
        out = topk_bm25(
            spark, env["index"], env["docs"], env["stats"],
            "data join", mode="and", k=10, round_digits=5,
            exclude_doc_ids=tomb,
        )
        return out.select("doc_id", "score")

    def events_hourly(spark, sf_dir):
        # tumbling time-window aggregate (batch twin of the streaming
        # windowed_event_counts); session tz is pinned UTC so both
        # engines bucket identically
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return (
            ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 4).alias("sum_value"),
            )
            .select(
                # ts reads as TIMESTAMP_NTZ; NTZ -> LTZ is value-exact
                # under the session's pinned UTC tz, then -> epoch secs
                F.col("w.start")
                .cast("timestamp")
                .cast("long")
                .alias("window_start"),
                "event_type",
                "n_events",
                "sum_value",
            )
        )

    def curated_corpus(spark, sf_dir):
        # END-TO-END curation: near-dup removal (MinHash-LSH losers out
        # via ANTI join — §2.2 set-op/join row), language filter,
        # quality filter.  The integration shape of a training-data
        # pipeline, over the planted-duplicate corpus.
        from invertedindexbuilder_spark.functions.text import (
            lang_id,
            quality_score,
        )
        corpus = _dedup_corpus(spark, sf_dir)
        pairs = _minhash_pairs(spark, sf_dir)
        losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        return (
            corpus.join(losers, "doc_id", "left_anti")
            .filter(lang_id(F.col("text")) == "en")
            .filter(quality_score(F.col("text")) >= 0.9)
            .select("doc_id")
        )

    def asof_latest_order(spark, sf_dir):
        # as-of join (§2.2 'general joins'): every event gets the
        # latest order at-or-before its timestamp, per user; one
        # union + window shuffle, no range join
        from invertedindexbuilder_spark.operators.asof import (
            asof_join_latest,
        )

        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        out = asof_join_latest(
            events,
            orders,
            left_key="user_id",
            left_ts="ts",
            right_key="o_custkey",
            right_ts="o_orderdate",
            right_val="o_orderkey",
            out_val="last_orderkey",
            keep=["event_id"],
        )
        # timestamps stay out of the output: the engines agree on ts
        # COMPARISONS (both read the same parquet values) but not on a
        # portable epoch rendering
        return out.select("event_id", "user_id", "last_orderkey")

    def tpch_q3ish(spark, sf_dir):
        # multi-table join demo (§2.2): broadcast the filtered dim,
        # shuffle join the facts, aggregate, top-10
        cust = (
            spark.read.parquet(f"{sf_dir}/customer.parquet")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey")
        )
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey"
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        return (
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("l_orderkey")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
                ).alias("revenue"),
                F.count("*").alias("n_items"),
            )
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
            .limit(10)
        )

    def media_features(spark, sf_dir):
        # deterministic synthetic media (no media column exists in the
        # shared tables); the oracle is a pre-materialized expected
        # table (expected_media_features) embedded as SQL VALUES — the
        # feature VECTOR itself stays pytest-verified (not ANSI-SQL)
        from invertedindexbuilder_spark.operators.multimodal import (
            extract_features,
            synthetic_media,
        )

        return extract_features(synthetic_media(spark, 200), dim=8).select(
            "media_id", "kind", "payload_sha256", "n_bytes"
        )

    def media_frames(spark, sf_dir):
        # video frame sampling (1:N mapInPandas explode) against the
        # pre-materialized expected frame table
        from invertedindexbuilder_spark.operators.multimodal import (
            sample_frames,
            synthetic_media,
        )

        return sample_frames(synthetic_media(spark, 200), every=2).select(
            "media_id",
            "frame_idx",
            F.sha2("frame_bytes", 256).alias("frame_sha256"),
            F.length("frame_bytes").cast("long").alias("n_bytes"),
        )

    # CANONICAL gate order (r4 layout); _rotate_gates slides the
    # driver's 50-row coverage window over it deterministically per
    # round — see its docstring for the coverage contract.
    canonical = {
        "media_features": media_features,
        "media_frames": media_frames,
        "events_hourly": events_hourly,
        "sessionize": sessionize,
        "asof_latest_order": asof_latest_order,
        "tpch_q3ish": tpch_q3ish,
        "curated_corpus": curated_corpus,
        "index_compacted": index_compacted,
        "index_federated": index_federated,
        "postings": postings,
        "term_stats": term_stats,
        "corpus_stats": corpus_stats,
        "index_meta": index_meta,
        "doc_table": doc_table,
        "sample_mod10": sample_mod10,
        "bm25_and": bm25_and,
        "bm25_or": bm25_or,
        "bm25_or_dup": bm25_or_dup,
        "bm25_and_unknown": bm25_and_unknown,
        "bm25_and_chunked": bm25_and_chunked,
        "bm25_or_chunked": bm25_or_chunked,
        "bm25_batch_and": bm25_batch_and,
        "bm25_batch_or": bm25_batch_or,
        "bm25_and_not": bm25_and_not,
        "bm25_filtered": bm25_filtered,
        "lang_id": lang_id_q,
        "quality_score": quality_q,
        "token_counts": token_counts,
        "pack_sequences": pack_sequences_q,
        "stratified_sample": stratified_sample_q,
        "content_hash": content_hash,
        "corpus_report": corpus_report_q,
        "unigram_xent": unigram_xent_q,
        "repetition_stats": repetition_stats_q,
        "top_bigrams": top_bigrams_q,
        "decontaminate": decontaminate_q,
        "pii_scrub": pii_scrub_q,
        "source_dup_stats": source_dup_stats_q,
        "code_subtokens": code_subtokens_q,
        "code_stats": code_stats_q,
        "phrase_search": phrase_search_q,
        "substring_search": substring_search_q,
        "fuzzy_terms": fuzzy_terms_q,
        "prefix_terms": prefix_terms_q,
        "related_terms": related_terms_q,
        "dedup_exact": dedup_exact,
        "dedup_jaccard": dedup_jaccard,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_clusters": dedup_clusters_q,
        "simhash_pairs": simhash_pairs_q,
        "simhash": simhash_q,
        "ann_cosine_topk": ann_cosine,
        "ann_ivf_topk": ann_ivf,
        "ann_ivf_probe1": ann_ivf_probe1,
        "ann_ivf_probe5": ann_ivf_probe5,
        "ann_kmeans_topk": ann_kmeans,
        "embed_near_dup": embed_near_dup,
        "fingerprint_winnow": fingerprint_winnow,
        "lineitem_rollup": lineitem_rollup,
        "search_dfs_compacted": search_dfs_compacted,
        # r5 addition: canonical-LAST lands just inside this round's
        # rotated head window (position 11), so the new gate gets a
        # driver row in its debut round without displacing any of the
        # 60 the coverage contract already tracks
        "ann_ivf_stored": ann_ivf_stored,
        # r6 additions (document deletion): canonical-last again — with
        # 63 gates the r6 offset is 15, so positions 61/62 sit inside
        # the 50-row window and both debut with a driver row
        "index_purged": index_purged,
        "bm25_and_deleted": bm25_and_deleted,
    }
    return _rotate_gates(canonical)


def _cell_sql(vec: str, planes: int) -> str:
    """SQL twin of similarity.grid_cell_expr: sign bits of the first
    ``planes`` components."""
    return (
        "("
        + " + ".join(
            f"CASE WHEN {vec}[{d + 1}] > 0 THEN {1 << d} ELSE 0 END"
            for d in range(planes)
        )
        + ")"
    )


_COS_AB = (
    "round(list_dot_product(a.v, b.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)"
)


def oracle_sql() -> dict[str, str]:
    from invertedindexbuilder_spark.functions.code import (
        ALPHA_NUM as _ALPHA_NUM,
        CAMEL_1 as _CAMEL_1,
        CAMEL_2 as _CAMEL_2,
        NUM_ALPHA as _NUM_ALPHA,
    )
    from invertedindexbuilder_spark.functions.text import (
        EMAIL_PATTERN as _EMAIL_P,
        PHONE_PATTERN as _PHONE_P,
    )
    from invertedindexbuilder_spark.operators.multimodal import (
        expected_media_features,
        expected_media_frames,
    )

    media_vals = ", ".join(
        f"({i}, '{k}', '{s}', {nb})"
        for i, k, s, nb in expected_media_features(200)
    )
    frame_vals = ", ".join(
        f"({i}, {fi}, '{s}', {nb})"
        for i, fi, s, nb in expected_media_frames(200, every=2)
    )
    jaccard_brute = (
        "WITH "
        + DEDUP_CORPUS_SQL
        + ","
        + SHINGLE_CTE
        + ","
        + JACCARD_TAIL.format(cand_join="", tau=0.6)
    )
    jaccard_lsh = (
        "WITH "
        + DEDUP_CORPUS_SQL
        + ","
        + SHINGLE_CTE
        + ","
        + MINHASH_CTE
        + ","
        + JACCARD_TAIL.format(
            cand_join="JOIN cand c ON c.doc_a = s1.doc_id AND c.doc_b = s2.doc_id",
            tau=0.6,
        )
    )
    return {
        "postings": f"WITH {TOKENIZE_CTE} SELECT term, doc_id, tf FROM postings",
        "term_stats": (
            f"WITH {TOKENIZE_CTE} SELECT term, count(*)::BIGINT AS df, "
            "sum(tf)::BIGINT AS cf FROM postings GROUP BY term"
        ),
        "corpus_stats": (
            f"WITH {TOKENIZE_CTE} "
            "SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs, "
            "(SELECT sum(length(text)) FROM documents)::BIGINT AS sum_doc_len, "
            "(SELECT count(DISTINCT term) FROM postings)::BIGINT AS n_terms, "
            "(SELECT count(*) FROM postings)::BIGINT AS n_postings, "
            "round((SELECT sum(length(text)) FROM documents) * 1.0 "
            " / ((SELECT count(*) FROM documents) - 1), 6) AS d_avr"
        ),
        "index_meta": (
            f"WITH {TOKENIZE_CTE}, "
            "gaps AS (SELECT term, doc_id, tf, doc_id - coalesce(lag(doc_id) "
            "OVER (PARTITION BY term ORDER BY doc_id), 0) AS gap FROM postings), "
            "b AS (SELECT term, doc_id, "
            "CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2 "
            "WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4 ELSE 5 END + "
            "CASE WHEN tf < 128 THEN 1 WHEN tf < 16384 THEN 2 "
            "WHEN tf < 2097152 THEN 3 WHEN tf < 268435456 THEN 4 ELSE 5 END AS nb "
            "FROM gaps) "
            "SELECT term, count(*)::BIGINT AS df, "
            "CAST(ceil(count(*) / 128.0) AS BIGINT) AS n_blocks, "
            "max(doc_id)::BIGINT AS last_doc, sum(nb)::BIGINT AS payload_bytes "
            "FROM b GROUP BY term"
        ),
        "doc_table": (
            "SELECT doc_id, length(text)::BIGINT AS doc_len, "
            "sha256(text) AS content_sha256 FROM documents"
        ),
        "sample_mod10": (
            "SELECT doc_id, n_chars::BIGINT AS n_chars FROM documents "
            "WHERE doc_id % 10 = 0"
        ),
        "bm25_and": _bm25_sql([("data", 1), ("join", 1)], "and", 10),
        "bm25_or": _bm25_sql([("spark", 1), ("merge", 1), ("vector", 1)], "or", 10),
        "bm25_or_dup": _bm25_sql([("data", 2), ("window", 1)], "or", 10),
        "bm25_and_unknown": _bm25_sql(
            [("filter", 1), ("zzznotaterm", 1)], "and", 10
        ),
        "bm25_and_not": _bm25_sql(
            [("data", 1), ("join", 1)], "and", 10,
            extra=(
                "doc_id NOT IN (SELECT p.doc_id FROM postings p "
                "WHERE p.term = 'window')"
            ),
        ),
        "bm25_filtered": _bm25_sql(
            [("data", 1), ("join", 1)], "and", 10, extra="doc_id % 3 = 0"
        ),
        # tombstones: pure exclusion — stats stay full-corpus, so the
        # twin is the ordinary BM25 SQL with the deleted ids filtered
        "bm25_and_deleted": _bm25_sql(
            [("data", 1), ("join", 1)], "and", 10, extra="doc_id % 11 <> 5"
        ),
        # physical purge: the oracle rebuilds the post-purge view from
        # the surviving corpus — row_number over surviving doc ids IS
        # the dense remap the purge applies
        "index_purged": (
            f"WITH {TOKENIZE_CTE}, surv AS ("
            "SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 "
            "AS new_id FROM documents WHERE doc_id % 7 <> 3) "
            "SELECT term, count(*)::BIGINT AS df, "
            "max(s.new_id)::BIGINT AS last_doc "
            "FROM postings p JOIN surv s ON s.doc_id = p.doc_id "
            "GROUP BY term"
        ),
        # chunked serving must produce the SAME answers as the merged
        # index — the oracle is the ordinary BM25 twin
        "bm25_and_chunked": _bm25_sql([("data", 1), ("spark", 1)], "and", 10),
        "bm25_or_chunked": _bm25_sql(
            [("merge", 1), ("filter", 1), ("data", 2)], "or", 10
        ),
        "lang_id": LANG_SQL,
        "quality_score": (
            "WITH "
            + _quality_ctes("documents")
            + " SELECT doc_id, quality FROM qual"
        ),
        "token_counts": (
            "SELECT doc_id, "
            "len(regexp_extract_all(trim(text), '\\S+'))::BIGINT AS ws_tokens, "
            "(len(regexp_extract_all(text, '[A-Za-z0-9]+')) + "
            " length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')))::BIGINT "
            "AS alnum_tokens FROM documents"
        ),
        "content_hash": (
            "SELECT doc_id, CAST('0x' || SUBSTR(md5(text), 1, 15) AS BIGINT) "
            "AS h64 FROM documents"
        ),
        "corpus_report": (
            "WITH "
            + _lang_ctes("documents")
            + ", "
            + _quality_ctes("documents")
            + ", tok AS (SELECT doc_id, "
            "len(regexp_extract_all(trim(text), '\\S+'))::BIGINT AS t "
            "FROM documents) "
            "SELECT lang_pred, count(*)::BIGINT AS n_docs, "
            "round(avg(quality), 6) AS mean_quality, "
            "sum(t)::BIGINT AS total_tokens "
            "FROM lang JOIN qual USING (doc_id) JOIN tok USING (doc_id) "
            "GROUP BY lang_pred"
        ),
        "unigram_xent": (
            "WITH occ AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t "
            "FROM documents), "
            "counts AS (SELECT t, count(*)::BIGINT AS cf FROM occ GROUP BY t), "
            "tot AS (SELECT count(*)::DOUBLE AS n FROM occ) "
            "SELECT doc_id, count(*)::BIGINT AS n_tokens, "
            "round(-avg(log2(cf / tot.n)), 6) AS xent "
            "FROM occ JOIN counts USING (t) CROSS JOIN tot GROUP BY doc_id"
        ),
        "repetition_stats": (
            "WITH w AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS l FROM documents), "
            "ws AS (SELECT doc_id, len(l)::BIGINT AS n_words, "
            "len(list_distinct(l))::BIGINT AS n_distinct_words FROM w), "
            "bg AS (SELECT doc_id, unnest(list_transform("
            "generate_series(1, len(l) - 1), i -> l[i] || ' ' || l[i+1])) AS b "
            "FROM w WHERE len(l) >= 2), "
            "bgc AS (SELECT doc_id, b, count(*)::BIGINT AS c FROM bg GROUP BY 1, 2), "
            "bga AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM bgc GROUP BY 1) "
            "SELECT ws.doc_id, ws.n_words, ws.n_distinct_words, "
            "CASE WHEN n_words > 0 "
            "THEN round(1.0 - n_distinct_words * 1.0 / n_words, 6) "
            "ELSE 0.0 END AS dup_word_frac, "
            "coalesce(round(mx * 1.0 / tot, 6), 0.0) AS top_bigram_frac "
            "FROM ws LEFT JOIN bga ON ws.doc_id = bga.doc_id"
        ),
        "top_bigrams": (
            "WITH w AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS l FROM documents), "
            "bg AS (SELECT unnest(list_transform("
            "generate_series(1, len(l) - 1), i -> l[i] || ' ' || l[i+1])) AS ngram "
            "FROM w WHERE len(l) >= 2) "
            "SELECT ngram, count(*)::BIGINT AS n_occurrences FROM bg "
            "GROUP BY ngram ORDER BY n_occurrences DESC, ngram LIMIT 100"
        ),
        "decontaminate": (
            "WITH sl AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS l FROM documents), "
            "shing AS (SELECT DISTINCT doc_id, s AS shingle FROM ("
            "SELECT doc_id, unnest(list_transform("
            "generate_series(1, greatest(len(l) - 2, 0)), "
            "i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS s FROM sl)), "
            "bench AS (SELECT DISTINCT shingle FROM shing WHERE doc_id % 97 = 0), "
            "scored AS (SELECT s.doc_id, count(*)::BIGINT AS n_shingles, "
            "sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit "
            "FROM shing s LEFT JOIN bench b ON s.shingle = b.shingle "
            "WHERE s.doc_id % 97 <> 0 GROUP BY 1) "
            "SELECT d.doc_id, coalesce(n_shingles, 0)::BIGINT AS n_shingles, "
            "coalesce(n_hit, 0)::BIGINT AS n_hit, "
            "coalesce(round(n_hit * 1.0 / n_shingles, 6), 0.0) AS contamination, "
            "(CASE WHEN coalesce(round(n_hit * 1.0 / n_shingles, 6), 0.0) >= 0.5 "
            "THEN 1 ELSE 0 END)::INT AS contaminated "
            "FROM documents d LEFT JOIN scored ON d.doc_id = scored.doc_id "
            "WHERE d.doc_id % 97 <> 0"
        ),
        "pii_scrub": (
            "WITH pp AS (SELECT doc_id, text || "
            "CASE WHEN doc_id % 10 = 0 THEN ' contact user' || doc_id::VARCHAR "
            "|| '@example.com now' ELSE '' END || "
            "CASE WHEN doc_id % 7 = 0 THEN ' call 555-' "
            "|| lpad((doc_id % 10000)::VARCHAR, 4, '0') || '-1234' ELSE '' END "
            "AS text FROM documents) "
            f"SELECT doc_id, "
            f"len(regexp_extract_all(text, '{_EMAIL_P}'))::BIGINT AS n_emails, "
            f"len(regexp_extract_all(text, '{_PHONE_P}'))::BIGINT AS n_phones, "
            f"md5(regexp_replace(regexp_replace(text, '{_EMAIL_P}', '<EMAIL>', 'g'), "
            f"'{_PHONE_P}', '<PHONE>', 'g')) AS redacted_md5 FROM pp"
        ),
        "code_subtokens": (
            "WITH d AS (SELECT doc_id, text || "
            "CASE WHEN doc_id % 5 = 0 THEN ' getUserAccountManager "
            "parse_HTML_fast HTTPServer2 utf8Decoder' ELSE '' END AS text "
            "FROM documents), "
            "s AS (SELECT doc_id, lower(regexp_replace(regexp_replace("
            "regexp_replace(regexp_replace(regexp_replace(text, "
            f"'{_CAMEL_2}', '\\1 \\2', 'g'), "
            f"'{_CAMEL_1}', '\\1 \\2', 'g'), "
            f"'{_ALPHA_NUM}', '\\1 \\2', 'g'), "
            f"'{_NUM_ALPHA}', '\\1 \\2', 'g'), "
            "'_', ' ', 'g')) AS t FROM d), "
            "tok AS (SELECT doc_id, unnest(regexp_extract_all(t, '[a-z0-9]+')) "
            "AS subtoken FROM s) "
            "SELECT doc_id, subtoken, count(*)::BIGINT AS tf FROM tok "
            "GROUP BY doc_id, subtoken"
        ),
        "code_stats": (
            "WITH d AS (SELECT doc_id, CASE WHEN doc_id % 2 = 0 "
            "THEN translate(text, ' ', chr(10)) ELSE text END AS text "
            "FROM documents), "
            "l AS (SELECT doc_id, text, "
            "list_transform(string_split(text, chr(10)), x -> length(x)) AS ll "
            "FROM d) "
            "SELECT doc_id, len(ll)::BIGINT AS n_lines, "
            "list_max(ll)::BIGINT AS max_line_len, "
            "round(list_sum(ll) * 1.0 / len(ll), 6) AS mean_line_len, "
            "CASE WHEN length(text) > 0 THEN round(length("
            "regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) * 1.0 "
            "/ length(text), 6) ELSE 1.0 END AS alnum_frac "
            "FROM l"
        ),
        "phrase_search": (
            "WITH w AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS l FROM documents), "
            "m AS (SELECT doc_id, len(list_filter("
            "generate_series(1, len(l) - 2), "
            "i -> l[i] = 'slow' AND l[i+1] = 'hash' AND l[i+2] = 'batch'"
            "))::BIGINT AS n_occurrences FROM w WHERE len(l) >= 3) "
            "SELECT doc_id, n_occurrences FROM m WHERE n_occurrences > 0"
        ),
        "substring_search": (
            "SELECT doc_id, ((length(text) - "
            "length(replace(text, 'le part', ''))) / length('le part'))::BIGINT "
            "AS n_occurrences FROM documents WHERE contains(text, 'le part')"
        ),
        "search_dfs_compacted": (
            "SELECT t AS term, count(*)::BIGINT AS df FROM ("
            "SELECT DISTINCT doc_id, unnest(regexp_extract_all("
            "lower(text), '[a-z0-9]+')) AS t FROM documents "
            "WHERE doc_id < 300) GROUP BY t"
        ),
        "related_terms": (
            "WITH toks AS (SELECT DISTINCT doc_id, t FROM ("
            "SELECT doc_id, unnest(regexp_extract_all(lower(text), "
            "'[a-z0-9]+')) AS t FROM documents)), "
            "n AS (SELECT count(DISTINCT doc_id)::DOUBLE AS nd FROM documents), "
            "dfs AS (SELECT t, count(*)::BIGINT AS df FROM toks GROUP BY t), "
            "wt AS (SELECT doc_id FROM toks WHERE t = 'data'), "
            "dt AS (SELECT count(*)::DOUBLE AS dft FROM wt), "
            "co AS (SELECT t, count(*)::BIGINT AS co_df FROM toks "
            "WHERE doc_id IN (SELECT doc_id FROM wt) AND t <> 'data' "
            "GROUP BY t HAVING count(*) >= 2) "
            "SELECT co.t AS term, co_df, df, "
            "round(log2(co_df * n.nd / (dt.dft * df)), 6) AS pmi "
            "FROM co JOIN dfs ON co.t = dfs.t CROSS JOIN n CROSS JOIN dt "
            "ORDER BY pmi DESC, term LIMIT 20"
        ),
        "fuzzy_terms": (
            "WITH tok AS (SELECT DISTINCT unnest("
            "regexp_extract_all(lower(text), '[a-z0-9]+')) AS term "
            "FROM documents) "
            "SELECT term, levenshtein(term, 'tables')::INT AS distance "
            "FROM tok WHERE levenshtein(term, 'tables') <= 1"
        ),
        "prefix_terms": (
            "WITH tok AS (SELECT DISTINCT unnest("
            "regexp_extract_all(lower(text), '[a-z0-9]+')) AS term "
            "FROM documents) "
            "SELECT term FROM tok WHERE starts_with(term, 's')"
        ),
        "source_dup_stats": (
            "WITH sd AS (SELECT source, text FROM documents UNION ALL "
            "SELECT 'planted' AS source, text FROM documents WHERE doc_id < 20), "
            "th AS (SELECT source, md5(text) AS h FROM sd), "
            "hs AS (SELECT h, count(DISTINCT source) AS ns FROM th GROUP BY h) "
            "SELECT source, count(*)::BIGINT AS n_docs, "
            "sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END)::BIGINT AS n_cross_dup, "
            "round(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) "
            "AS cross_dup_frac FROM th JOIN hs ON th.h = hs.h GROUP BY source"
        ),
        "dedup_exact": (
            "WITH "
            + DEDUP_CORPUS_SQL
            + " SELECT sha256(text) AS content_sha256, count(*)::BIGINT AS n_dups, "
            "min(doc_id) AS keep_doc_id, max(doc_id) AS max_doc_id "
            "FROM dd GROUP BY sha256(text) HAVING count(*) > 1"
        ),
        "dedup_jaccard": jaccard_brute,
        "dedup_minhash_lsh": jaccard_lsh,
        # transitive closure of the SAME LSH pair set via recursive CTE
        "dedup_clusters": (
            "WITH RECURSIVE "
            + DEDUP_CORPUS_SQL.lstrip()
            + ","
            + SHINGLE_CTE
            + ","
            + MINHASH_CTE
            + ","
            + JACCARD_CTES.format(
                cand_join="JOIN cand c ON c.doc_a = s1.doc_id "
                "AND c.doc_b = s2.doc_id"
            )
            + ", pairs AS ("
            + JACCARD_SELECT.format(tau=0.6)
            + "), edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs "
            "UNION SELECT doc_b, doc_a FROM pairs), "
            "reach(node, r) AS ("
            "SELECT u, u FROM edges "
            "UNION "
            "SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node) "
            "SELECT node AS doc_id, min(r)::BIGINT AS cluster, "
            "(CASE WHEN node = min(r) THEN 1 ELSE 0 END)::INT AS keep "
            "FROM reach GROUP BY node"
        ),
        "simhash_pairs": (
            "WITH "
            + DEDUP_CORPUS_SQL.lstrip()
            + ", toks AS (SELECT DISTINCT doc_id, tok FROM ("
            "SELECT doc_id, unnest(regexp_extract_all(lower(text), "
            "'[a-z0-9]+')) AS tok FROM dd)), "
            "h AS (SELECT doc_id, "
            "CAST('0x' || SUBSTR(md5(tok), 1, 8) AS BIGINT) AS h FROM toks), "
            "bits AS (SELECT doc_id, t.b, "
            "sum(CASE WHEN (h >> t.b) & 1 = 1 THEN 1 ELSE -1 END) AS v "
            "FROM h CROSS JOIN generate_series(0, 31) t(b) GROUP BY doc_id, t.b), "
            "sig AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << b) "
            "ELSE 0 END)::BIGINT AS s FROM bits GROUP BY doc_id), "
            "banded AS (SELECT doc_id, s, t.band, "
            "(s >> (t.band * 8)) & 255 AS bval "
            "FROM sig CROSS JOIN generate_series(0, 3) t(band)), "
            "cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.s AS sa, "
            "b.doc_id AS doc_b, b.s AS sb FROM banded a JOIN banded b "
            "ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id) "
            "SELECT doc_a, doc_b, bit_count(xor(sa, sb))::BIGINT AS hamming "
            "FROM cand WHERE bit_count(xor(sa, sb)) <= 3"
        ),
        "simhash": (
            "WITH toks AS (SELECT DISTINCT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok "
            "FROM documents), "
            "h AS (SELECT doc_id, "
            "CAST('0x' || SUBSTR(md5(tok), 1, 8) AS BIGINT) AS h FROM toks), "
            "bits AS (SELECT doc_id, t.b, "
            "sum(CASE WHEN (h >> t.b) & 1 = 1 THEN 1 ELSE -1 END) AS v "
            "FROM h CROSS JOIN generate_series(0, 31) t(b) GROUP BY doc_id, t.b) "
            "SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << b) "
            "ELSE 0 END)::BIGINT AS simhash FROM bits GROUP BY doc_id"
        ),
        "ann_cosine_topk": (
            "WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings "
            "WHERE vec_id = 0) "
            "SELECT e.vec_id, round("
            "list_dot_product(e.embedding::DOUBLE[], q.qv) / "
            "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) "
            " * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine "
            "FROM embeddings e CROSS JOIN q WHERE e.vec_id != 0 "
            "ORDER BY cosine DESC, e.vec_id LIMIT 10"
        ),
        "fingerprint_winnow": (
            "WITH wd AS (SELECT doc_id, text FROM documents UNION ALL "
            f"SELECT * FROM (VALUES {_SHORT_VALUES}) sd(doc_id, text)), "
            "t AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS l FROM wd), "
            "g0 AS (SELECT doc_id, greatest(len(l) - 4, 0) AS n_grams, "
            "unnest(list_transform(generate_series(1, greatest(len(l) - 4, 0)), "
            "i -> {'pos': i, 'gram': l[i] || ' ' || l[i+1] || ' ' || l[i+2] "
            "|| ' ' || l[i+3] || ' ' || l[i+4]})) AS u FROM t), "
            "g AS (SELECT doc_id, n_grams, u.pos AS pos, "
            "CAST('0x' || SUBSTR(md5(u.gram), 1, 8) AS BIGINT) AS h FROM g0), "
            "w AS (SELECT doc_id, pos, n_grams, min(h) OVER ("
            "PARTITION BY doc_id ORDER BY pos "
            "ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin FROM g) "
            # 1-based pos: last full window starts at n_grams - 3
            "SELECT DISTINCT doc_id, wmin AS fingerprint FROM w "
            "WHERE pos <= n_grams - 3"
        ),
        "lineitem_rollup": (
            "SELECT coalesce(l_returnflag, 'ALL') AS returnflag, "
            "coalesce(l_linestatus, 'ALL') AS linestatus, "
            "count(*)::BIGINT AS n_rows, round(sum(l_quantity), 4) AS sum_qty, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price "
            "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
        ),
        "ann_ivf_topk": (
            "WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings "
            "WHERE vec_id = 0) "
            "SELECT e.vec_id, round("
            "list_dot_product(e.embedding::DOUBLE[], q.qv) / "
            "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) "
            " * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine "
            "FROM embeddings e CROSS JOIN q WHERE e.vec_id != 0 "
            "ORDER BY cosine DESC, e.vec_id LIMIT 10"
        ),
        # probe_all trained IVF is exact by construction -> same twin
        "ann_kmeans_topk": (
            "WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings "
            "WHERE vec_id = 0) "
            "SELECT e.vec_id, round("
            "list_dot_product(e.embedding::DOUBLE[], q.qv) / "
            "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) "
            " * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine "
            "FROM embeddings e CROSS JOIN q WHERE e.vec_id != 0 "
            "ORDER BY cosine DESC, e.vec_id LIMIT 10"
        ),
        "ann_ivf_probe1": (
            "WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v, "
            + _cell_sql("embedding", 4)
            + " AS cell FROM embeddings), "
            "q AS (SELECT v AS qv, cell AS qc FROM c WHERE vec_id = 0) "
            "SELECT e.vec_id, round(list_dot_product(e.v, q.qv) / "
            "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)))"
            ", 6) AS cosine "
            "FROM c e CROSS JOIN q WHERE e.vec_id != 0 AND e.cell = q.qc "
            "ORDER BY cosine DESC, e.vec_id LIMIT 10"
        ),
        # stored-IVF serving must equal the ad hoc single-probe IVF:
        # identical cell restriction, computed ad hoc by the oracle
        "ann_ivf_stored": (
            "WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v, "
            + _cell_sql("embedding", 4)
            + " AS cell FROM embeddings), "
            "q AS (SELECT v AS qv, cell AS qc FROM c WHERE vec_id = 0) "
            "SELECT e.vec_id, round(list_dot_product(e.v, q.qv) / "
            "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)))"
            ", 6) AS cosine "
            "FROM c e CROSS JOIN q WHERE e.vec_id != 0 AND e.cell = q.qc "
            "ORDER BY cosine DESC, e.vec_id LIMIT 10"
        ),
        "stratified_sample": (
            "WITH "
            + _lang_ctes("documents")
            + " SELECT doc_id, lang_pred FROM lang WHERE "
            "CAST('0x' || SUBSTR(md5(doc_id::VARCHAR), 1, 8) AS BIGINT) "
            "% 1000000 < CASE lang_pred WHEN 'en' THEN 500000 "
            "WHEN 'de' THEN 250000 ELSE 100000 END"
        ),
        "pack_sequences": (
            "WITH t AS (SELECT doc_id, "
            "len(regexp_extract_all(text, '\\S+'))::BIGINT AS n "
            "FROM documents), "
            "o AS (SELECT doc_id, n, coalesce(sum(n) OVER ("
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING), 0)::BIGINT AS off FROM t), "
            "seg AS (SELECT doc_id, n, off, "
            "unnest(generate_series(off // 512, (off + n - 1) // 512)) "
            "AS seq_id FROM o WHERE n > 0) "
            "SELECT seq_id::BIGINT AS seq_id, doc_id, "
            "greatest(seq_id * 512 - off, 0)::BIGINT AS doc_begin, "
            "least((seq_id + 1) * 512 - off, n)::BIGINT AS doc_end, "
            "greatest(off - seq_id * 512, 0)::BIGINT AS seq_begin "
            "FROM seg"
        ),
        "bm25_batch_and": _bm25_batch_sql(BATCH_AND_QUERIES, "and", 10),
        "bm25_batch_or": _bm25_batch_sql(BATCH_OR_QUERIES, "or", 10),
        "ann_ivf_probe5": (
            "WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v, "
            + _cell_sql("embedding", 4)
            + " AS cell FROM embeddings), "
            "q AS (SELECT v AS qv, cell AS qc FROM c WHERE vec_id = 0) "
            "SELECT e.vec_id, round(list_dot_product(e.v, q.qv) / "
            "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)))"
            ", 6) AS cosine "
            "FROM c e CROSS JOIN q WHERE e.vec_id != 0 AND ("
            "e.cell = q.qc OR e.cell = xor(q.qc, 1) OR e.cell = xor(q.qc, 2) "
            "OR e.cell = xor(q.qc, 4) OR e.cell = xor(q.qc, 8)) "
            "ORDER BY cosine DESC, e.vec_id LIMIT 10"
        ),
        "embed_near_dup": (
            "WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v "
            "FROM embeddings), "
            "ee AS (SELECT vec_id, v FROM base "
            "UNION ALL SELECT vec_id + 100000, v FROM base WHERE vec_id < 10 "
            "UNION ALL SELECT vec_id + 200000, [v[1] * 2.0] || v[2:] "
            "FROM base WHERE vec_id < 10), "
            "cells AS (SELECT vec_id, v, "
            + _cell_sql("v", 8)
            + " AS cell FROM ee) "
            "SELECT * FROM ("
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            + _COS_AB
            + " AS cosine "
            "FROM cells a JOIN cells b "
            "ON a.cell = b.cell AND a.vec_id < b.vec_id"
            ") WHERE cosine >= 0.8"
        ),
        "sessionize": (
            # floor(epoch()): DuckDB's ::BIGINT cast ROUNDS fractional
            # seconds; Spark's timestamp->long cast truncates
            "WITH ev AS (SELECT event_id, user_id, "
            "floor(epoch(ts))::BIGINT AS t, value FROM events), "
            "g AS (SELECT *, lag(t) OVER "
            "(PARTITION BY user_id ORDER BY t, event_id) AS prev_t FROM ev), "
            "s AS (SELECT *, CASE WHEN prev_t IS NULL OR t - prev_t > 1800 "
            "THEN 1 ELSE 0 END AS new_sess FROM g), "
            "sid AS (SELECT *, sum(new_sess) OVER "
            "(PARTITION BY user_id ORDER BY t, event_id "
            "ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id FROM s) "
            "SELECT user_id, session_id, count(*)::BIGINT AS n_events, "
            "min(t)::BIGINT AS t_start, max(t)::BIGINT AS t_end, "
            "round(sum(value), 4) AS sum_value "
            "FROM sid GROUP BY user_id, session_id"
        ),
        "index_compacted": (
            f"WITH {TOKENIZE_CTE} SELECT term, count(*)::BIGINT AS df, "
            "max(doc_id)::BIGINT AS last_doc FROM postings GROUP BY term"
        ),
        # the federated merge must reproduce the same corpus-wide view
        "index_federated": (
            f"WITH {TOKENIZE_CTE} SELECT term, count(*)::BIGINT AS df, "
            "max(doc_id)::BIGINT AS last_doc FROM postings GROUP BY term"
        ),
        "events_hourly": (
            "SELECT epoch(time_bucket(INTERVAL 1 HOUR, ts))::BIGINT "
            "AS window_start, event_type, count(*)::BIGINT AS n_events, "
            "round(sum(value), 4) AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        "curated_corpus": (
            "WITH "
            + DEDUP_CORPUS_SQL
            + ","
            + SHINGLE_CTE
            + ","
            + MINHASH_CTE
            + ","
            + JACCARD_CTES.format(
                cand_join=(
                    "JOIN cand c ON c.doc_a = s1.doc_id AND c.doc_b = s2.doc_id"
                )
            )
            + ", pairs AS ("
            + JACCARD_SELECT.format(tau=0.6)
            + "), losers AS (SELECT DISTINCT doc_b AS doc_id FROM pairs), "
            + _lang_ctes("dd")
            + ", "
            + _quality_ctes("dd")
            + " SELECT d.doc_id FROM dd d "
            "JOIN lang l ON l.doc_id = d.doc_id "
            "JOIN qual q ON q.doc_id = d.doc_id "
            "WHERE l.lang_pred = 'en' AND q.quality >= 0.9 "
            "AND d.doc_id NOT IN (SELECT doc_id FROM losers)"
        ),
        "asof_latest_order": (
            "WITH m AS (SELECT e.event_id, e.user_id, "
            "max(o.o_orderdate) AS last_ts "
            "FROM events e JOIN orders o ON o.o_custkey = e.user_id "
            "AND o.o_orderdate <= e.ts GROUP BY 1, 2) "
            "SELECT m.event_id, m.user_id, "
            "max(o.o_orderkey)::BIGINT AS last_orderkey "
            "FROM m JOIN orders o ON o.o_custkey = m.user_id "
            "AND o.o_orderdate = m.last_ts GROUP BY 1, 2"
        ),
        "tpch_q3ish": (
            "SELECT l_orderkey, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue, "
            "count(*)::BIGINT AS n_items "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON c_custkey = o_custkey "
            "WHERE c_mktsegment = 'BUILDING' GROUP BY l_orderkey "
            "ORDER BY revenue DESC, l_orderkey LIMIT 10"
        ),
        "media_features": (
            "SELECT media_id::BIGINT AS media_id, kind, payload_sha256, "
            "n_bytes::BIGINT AS n_bytes "
            f"FROM (VALUES {media_vals}) "
            "t(media_id, kind, payload_sha256, n_bytes)"
        ),
        "media_frames": (
            "SELECT media_id::BIGINT AS media_id, frame_idx::BIGINT AS "
            "frame_idx, frame_sha256, n_bytes::BIGINT AS n_bytes "
            f"FROM (VALUES {frame_vals}) "
            "t(media_id, frame_idx, frame_sha256, n_bytes)"
        ),
    }
