"""Deduplication gates: exact sha256 groups, brute/LSH Jaccard pairs,
transitive clusters, simhash signatures + Hamming-banded pairs, and
winnowing fingerprints (operators/dedup.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .shared import (
    DEDUP_CORPUS_SQL,
    JACCARD_CTES,
    JACCARD_SELECT,
    JACCARD_TAIL,
    MINHASH_CTE,
    SHINGLE_CTE,
    SHORT_DOCS,
    SHORT_VALUES,
    dedup_corpus,
    documents,
    minhash_pairs,
)


def queries() -> dict:
    from invertedindexbuilder_spark.operators.dedup import (
        exact_duplicate_groups,
        jaccard_pairs,
        simhash,
    )

    def dedup_exact(spark, sf_dir):
        return exact_duplicate_groups(dedup_corpus(spark, sf_dir)).select(
            "content_sha256",
            F.col("n_dups").cast("long").alias("n_dups"),
            "keep_doc_id",
            "max_doc_id",
        )

    def dedup_jaccard(spark, sf_dir):
        return jaccard_pairs(dedup_corpus(spark, sf_dir), n=3, threshold=0.6)

    def dedup_minhash_lsh(spark, sf_dir):
        return minhash_pairs(spark, sf_dir)

    def simhash_pairs_q(spark, sf_dir):
        # Hamming-banded simhash near-dup (Manku/Jain/Sarma): exact
        # pigeonhole candidates, popcount verify on candidates only
        from invertedindexbuilder_spark.operators.dedup import simhash_pairs

        return simhash_pairs(dedup_corpus(spark, sf_dir), max_hamming=3)

    def dedup_clusters_q(spark, sf_dir):
        # transitive near-dup CLUSTERS: LSH pairs -> distributed
        # min-label propagation (connected components); pairwise
        # keep/lose under-merges chains, clusters are the correct
        # dedup decision unit
        from invertedindexbuilder_spark.operators.dedup import (
            dedup_clusters,
        )

        return dedup_clusters(
            dedup_corpus(spark, sf_dir),
            threshold=0.6,
            pairs=minhash_pairs(spark, sf_dir),
        )

    def simhash_q(spark, sf_dir):
        return simhash(documents(spark, sf_dir).select("doc_id", "text"))

    def fingerprint_winnow(spark, sf_dir):
        from invertedindexbuilder_spark.operators.dedup import (
            winnow_fingerprints,
        )

        corpus = (
            documents(spark, sf_dir)
            .select("doc_id", "text")
            .unionAll(
                spark.createDataFrame(SHORT_DOCS, "doc_id long, text string")
            )
        )
        return winnow_fingerprints(corpus, k=5, window=4)

    return {
        "dedup_exact": dedup_exact,
        "dedup_jaccard": dedup_jaccard,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_clusters": dedup_clusters_q,
        "simhash_pairs": simhash_pairs_q,
        "simhash": simhash_q,
        "fingerprint_winnow": fingerprint_winnow,
    }


def oracle_sql() -> dict:
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
        "fingerprint_winnow": (
            "WITH wd AS (SELECT doc_id, text FROM documents UNION ALL "
            f"SELECT * FROM (VALUES {SHORT_VALUES}) sd(doc_id, text)), "
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
    }
