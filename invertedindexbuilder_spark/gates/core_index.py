"""Gates for the index-build pipeline itself: postings, lexicon stats,
encoder geometry, incremental compaction, federated merge, physical
purge, and the incremental search tables (SURVEY §2.1 rows P1/P1b/A1,
M2/F2, C1/C2/F1, Q1, S4 + the r3-r6 maintenance extensions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .shared import TOKENIZE_CTE, built, documents


def queries() -> dict:
    def postings(spark, sf_dir):
        env = built(spark, sf_dir)
        return env["postings"].select(
            "term", "doc_id", F.col("tf").cast("long").alias("tf")
        )

    def term_stats(spark, sf_dir):
        env = built(spark, sf_dir)
        return env["postings"].groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").cast("long").alias("cf")
        )

    def corpus_stats(spark, sf_dir):
        env = built(spark, sf_dir)
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
        env = built(spark, sf_dir)
        return env["index"].select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.size("last_doc_ids").cast("long").alias("n_blocks"),
            F.element_at("last_doc_ids", -1).cast("long").alias("last_doc"),
            F.length("payload").cast("long").alias("payload_bytes"),
        )

    def doc_table(spark, sf_dir):
        return documents(spark, sf_dir).select(
            "doc_id",
            F.length("text").cast("long").alias("doc_len"),
            F.sha2("text", 256).alias("content_sha256"),
        )

    def sample_mod10(spark, sf_dir):
        return (
            documents(spark, sf_dir)
            .filter(F.col("doc_id") % 10 == 0)
            .select("doc_id", F.col("n_chars").cast("long").alias("n_chars"))
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

        env = built(spark, sf_dir)
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
            documents(spark, sf_dir)
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

        env = built(spark, sf_dir)
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

        env = built(spark, sf_dir)
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

    def _make_min_catalog(spark, d, root):
        """Smallest catalog purge_deletes can run against: docs (with
        doc_len), chunk-only index, stats — skipping build()'s
        fingerprint/manifest/URL phases whose fixed job count dominates
        at gate scale."""
        from invertedindexbuilder_spark.catalog import Catalog
        from invertedindexbuilder_spark.operators.index_build import (
            encode_chunks,
        )
        from invertedindexbuilder_spark.operators.postings import (
            build_postings,
        )
        from invertedindexbuilder_spark.plans.build import _write_stats

        cat = Catalog(spark, root)
        docs = d.select(
            "doc_id",
            F.col("text").alias("content"),
            F.length("text").cast("long").alias("doc_len"),
        ).coalesce(1)
        cat.write(docs.drop("content"), "docs")
        cat.write(
            encode_chunks(
                build_postings(docs), salt_threshold=64, chunk_blocks=1
            ).coalesce(1),
            "index_chunks",
        )
        agg = docs.agg(
            F.count("*").alias("n"), F.sum("doc_len").alias("sdl"),
            F.min("doc_len").alias("mdl"),
        ).collect()[0]
        m = (
            spark.read.parquet(cat.path("index_chunks"))
            .agg(
                F.count_distinct("term").alias("terms"),
                F.sum("df").alias("postings"),
            )
            .collect()[0]
        )
        _write_stats(
            spark, cat, int(agg["n"]), int(agg["sdl"]), m, int(agg["mdl"])
        )

    def search_dfs_purged(spark, sf_dir):
        # r6 search-table purge: build a full catalog (chunked index +
        # stored search tables) over doc_id < 120, tombstone
        # doc_id % 13 == 1, physically purge, and serve the term dfs
        # from the REWRITTEN stored table; the oracle computes the same
        # dfs over the surviving slice directly (dfs are
        # remap-invariant).  localCheckpoint so the result survives
        # the tmpdir cleanup.
        import shutil as _sh
        import tempfile as _tf

        from invertedindexbuilder_spark.plans.build import (
            build_search_tables,
            load_search_tables,
        )
        from invertedindexbuilder_spark.plans.deletes import (
            delete_docs,
            purge_deletes,
        )

        d = (
            documents(spark, sf_dir)
            .select("doc_id", "text")
            .filter(F.col("doc_id") < 120)
        )
        root = _tf.mkdtemp(prefix="gate_purgeidx_")
        try:
            # minimal catalog by hand instead of the full build() —
            # purge_deletes only reads docs/stats/index_chunks, and the
            # full build's phase machinery (fingerprint, manifest
            # resume, URL derivation) cost this gate ~25 s of pure
            # fixed overhead at 120 docs
            _make_min_catalog(spark, d, root)
            build_search_tables(
                spark, d, root, max_dist=1,
                collect_counts=False, partition=False,
            )
            delete_docs(spark, root, [i for i in range(120) if i % 13 == 1])
            purge_deletes(spark, root, partition=False)
            out = (
                load_search_tables(spark, root)["term_dfs"]
                .select(F.col("t").alias("term"), "df")
                .localCheckpoint()
            )
        finally:
            _sh.rmtree(root, ignore_errors=True)
        return out

    def purge_id_remap(spark, sf_dir):
        # r7: the purge's atomic flip publishes an id_remap table
        # (old_doc_id -> new_doc_id, survivors only) so a CDC upstream
        # holding pre-assigned ids resyncs with one join on its own
        # ids (plans/deletes.py).  The oracle computes the same dense
        # remap with row_number over the surviving ids.
        import shutil as _sh
        import tempfile as _tf

        from invertedindexbuilder_spark.catalog import Catalog
        from invertedindexbuilder_spark.plans.deletes import (
            delete_docs,
            purge_deletes,
        )

        d = (
            documents(spark, sf_dir)
            .select("doc_id", "text")
            .filter(F.col("doc_id") < 150)
        )
        root = _tf.mkdtemp(prefix="gate_idremap_")
        try:
            _make_min_catalog(spark, d, root)
            delete_docs(spark, root, [i for i in range(150) if i % 11 == 2])
            purge_deletes(spark, root)
            out = Catalog(spark, root).read("id_remap").localCheckpoint()
        finally:
            _sh.rmtree(root, ignore_errors=True)
        return out

    return {
        "index_compacted": index_compacted,
        "index_federated": index_federated,
        "postings": postings,
        "term_stats": term_stats,
        "corpus_stats": corpus_stats,
        "index_meta": index_meta,
        "doc_table": doc_table,
        "sample_mod10": sample_mod10,
        "search_dfs_compacted": search_dfs_compacted,
        "index_purged": index_purged,
        "search_dfs_purged": search_dfs_purged,
        "purge_id_remap": purge_id_remap,
    }


def oracle_sql() -> dict:
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
        "search_dfs_compacted": (
            "SELECT t AS term, count(*)::BIGINT AS df FROM ("
            "SELECT DISTINCT doc_id, unnest(regexp_extract_all("
            "lower(text), '[a-z0-9]+')) AS t FROM documents "
            "WHERE doc_id < 300) GROUP BY t"
        ),
        # dfs are remap-invariant, so the purged stored table must
        # equal the direct dfs over the surviving corpus slice
        "search_dfs_purged": (
            "SELECT t AS term, count(*)::BIGINT AS df FROM ("
            "SELECT DISTINCT doc_id, unnest(regexp_extract_all("
            "lower(text), '[a-z0-9]+')) AS t FROM documents "
            "WHERE doc_id < 120 AND doc_id % 13 <> 1) GROUP BY t"
        ),
        # the purge's published old->new survivor map IS the dense
        # remap: row_number over surviving ids in id order
        "purge_id_remap": (
            "SELECT doc_id::BIGINT AS old_doc_id, "
            "(row_number() OVER (ORDER BY doc_id) - 1)::BIGINT "
            "AS new_doc_id FROM documents "
            "WHERE doc_id < 150 AND doc_id % 11 <> 2"
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
    }
