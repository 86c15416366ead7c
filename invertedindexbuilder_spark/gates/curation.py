"""Training-data curation gates: language ID, quality scoring, token
counting, sequence packing, stratified sampling, content hashing,
corpus reporting, cross-entropy, repetition/n-gram stats,
decontamination, PII scrubbing, and cross-source duplication."""

from __future__ import annotations

from pyspark.sql import functions as F

from .shared import LANG_SQL, documents, lang_ctes, quality_ctes


def queries() -> dict:
    from invertedindexbuilder_spark.functions.text import (
        alnum_token_count,
        content_hash64,
        lang_id,
        quality_score,
        ws_token_count,
    )

    def lang_id_q(spark, sf_dir):
        return documents(spark, sf_dir).select(
            "doc_id", lang_id(F.col("text")).alias("lang_pred")
        )

    def quality_q(spark, sf_dir):
        return documents(spark, sf_dir).select(
            "doc_id", quality_score(F.col("text")).alias("quality")
        )

    def token_counts(spark, sf_dir):
        return documents(spark, sf_dir).select(
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

        docs = documents(spark, sf_dir).select(
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

        d = documents(spark, sf_dir).select(
            "doc_id", lang_id(F.col("text")).alias("lang_pred")
        )
        return stratified_sample(
            d, "doc_id", "lang_pred", {"en": 0.5, "de": 0.25},
            default_rate=0.1,
        )

    def content_hash(spark, sf_dir):
        return documents(spark, sf_dir).select(
            "doc_id", content_hash64(F.col("text")).alias("h64")
        )

    def corpus_report_q(spark, sf_dir):
        # the pre-training corpus summary: per predicted language,
        # doc count + mean quality + total whitespace tokens — one
        # groupBy over pure column expressions
        d = documents(spark, sf_dir).select(
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
            documents(spark, sf_dir).select("doc_id", "text")
        )

    def repetition_stats_q(spark, sf_dir):
        # Gopher-style repeat filters: dup-word fraction + top-bigram
        # occupancy (operators/curation.py)
        from invertedindexbuilder_spark.operators.curation import (
            repetition_stats,
        )

        return repetition_stats(documents(spark, sf_dir))

    def top_bigrams_q(spark, sf_dir):
        # global corpus n-gram statistics (threshold-picking pass)
        from invertedindexbuilder_spark.operators.curation import top_ngrams

        return top_ngrams(documents(spark, sf_dir), n=2, k=100)

    def decontaminate_q(spark, sf_dir):
        # benchmark decontamination: docs vs the doc_id%97==0 subset
        # playing the held-out benchmark role
        from invertedindexbuilder_spark.operators.curation import decontaminate

        d = documents(spark, sf_dir).select("doc_id", "text")
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

        d = documents(spark, sf_dir).select(
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

    def source_dup_stats_q(spark, sf_dir):
        # cross-source duplication with planted fork copies of the
        # first 20 docs under a synthetic 'planted' source
        from invertedindexbuilder_spark.operators.curation import (
            source_dup_stats,
        )

        d = documents(spark, sf_dir).select("doc_id", "source", "text")
        planted = d.filter(F.col("doc_id") < 20).select(
            "doc_id", F.lit("planted").alias("source"), "text"
        )
        return source_dup_stats(d.unionAll(planted))

    return {
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
    }


def oracle_sql() -> dict:
    from invertedindexbuilder_spark.functions.text import (
        EMAIL_PATTERN as _EMAIL_P,
        PHONE_PATTERN as _PHONE_P,
    )

    return {
        "lang_id": LANG_SQL,
        "quality_score": (
            "WITH "
            + quality_ctes("documents")
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
            + lang_ctes("documents")
            + ", "
            + quality_ctes("documents")
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
        "stratified_sample": (
            "WITH "
            + lang_ctes("documents")
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
    }
