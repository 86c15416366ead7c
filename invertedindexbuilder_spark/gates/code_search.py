"""Code-corpus and search-extension gates: identifier subtokens,
per-line code stats, phrase/substring/fuzzy/prefix lookup, and PMI
query expansion (operators/textsearch.py, functions/code.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .shared import documents


def queries() -> dict:
    def code_subtokens_q(spark, sf_dir):
        # identifier subtoken postings: camelCase / UPPERRun /
        # snake_case / digit boundaries split BEFORE tokenization, so a
        # code corpus's long identifiers survive the length filter
        # (reference main.c:104-123 drops >15-char tokens whole).
        # Identifiers are planted — the shared corpus has none.
        from invertedindexbuilder_spark.functions.code import subtokens

        d = documents(spark, sf_dir).select(
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

        d = documents(spark, sf_dir).select(
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
            documents(spark, sf_dir).select("doc_id", "text"),
            "slow hash batch",
        )

    def substring_search_q(spark, sf_dir):
        # trigram-index substring search (Zoekt design): candidates
        # from trigram-posting intersection, exact contains verify
        from invertedindexbuilder_spark.operators.textsearch import (
            substring_search,
        )

        return substring_search(
            documents(spark, sf_dir).select("doc_id", "text"), "le part"
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

        d = documents(spark, sf_dir).select("doc_id", "text")
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

        vocab = documents(spark, sf_dir).select(
            F.explode(tokens_expr("text")).alias("term")
        )
        return fuzzy_term_match(vocab, "tables", max_dist=1)

    def prefix_terms_q(spark, sf_dir):
        from invertedindexbuilder_spark.operators.dedup import tokens_expr
        from invertedindexbuilder_spark.operators.textsearch import (
            prefix_terms,
        )

        vocab = documents(spark, sf_dir).select(
            F.explode(tokens_expr("text")).alias("term")
        )
        return prefix_terms(vocab, "s")

    return {
        "code_subtokens": code_subtokens_q,
        "code_stats": code_stats_q,
        "phrase_search": phrase_search_q,
        "substring_search": substring_search_q,
        "fuzzy_terms": fuzzy_terms_q,
        "prefix_terms": prefix_terms_q,
        "related_terms": related_terms_q,
    }


def oracle_sql() -> dict:
    from invertedindexbuilder_spark.functions.code import (
        ALPHA_NUM as _ALPHA_NUM,
        CAMEL_1 as _CAMEL_1,
        CAMEL_2 as _CAMEL_2,
        NUM_ALPHA as _NUM_ALPHA,
    )

    return {
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
    }
