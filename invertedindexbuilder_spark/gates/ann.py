"""ANN / embedding-similarity gates: brute cosine top-k, sign-grid IVF
(probe_all / 1 / 5), trained k-means IVF, the stored cell-partitioned
index, and sign-LSH embedding near-dup (operators/similarity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .shared import COS_AB, cell_sql, embed_dup_corpus, embeddings


def queries() -> dict:
    from invertedindexbuilder_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    def ann_cosine(spark, sf_dir):
        return cosine_topk(embeddings(spark, sf_dir), query_vec_id=0, k=10)

    def ann_ivf(spark, sf_dir):
        return ivf_topk(
            embeddings(spark, sf_dir), query_vec_id=0, k=10, probe_all=True
        )

    def ann_ivf_probe1(spark, sf_dir):
        # the pruned path that matters at scale: probe ONLY the query's
        # cell (oracle applies the identical cell restriction)
        return ivf_topk(
            embeddings(spark, sf_dir), query_vec_id=0, k=10, probe_all=False
        )

    def ann_ivf_probe5(spark, sf_dir):
        # deterministic multi-probe (query cell + its 4 Hamming-1
        # neighbors): the recall knob, oracle-gated with the identical
        # 5-cell restriction
        return ivf_topk(
            embeddings(spark, sf_dir), query_vec_id=0, k=10,
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

        emb = embeddings(spark, sf_dir)
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
            build_ann_tables(spark, embeddings(spark, sf_dir), root, dims=4)
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
            embed_dup_corpus(spark, sf_dir), threshold=0.8, planes=8
        )

    return {
        "ann_cosine_topk": ann_cosine,
        "ann_ivf_topk": ann_ivf,
        "ann_ivf_probe1": ann_ivf_probe1,
        "ann_ivf_probe5": ann_ivf_probe5,
        "ann_kmeans_topk": ann_kmeans,
        "embed_near_dup": embed_near_dup,
        "ann_ivf_stored": ann_ivf_stored,
    }


def oracle_sql() -> dict:
    return {
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
            + cell_sql("embedding", 4)
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
            + cell_sql("embedding", 4)
            + " AS cell FROM embeddings), "
            "q AS (SELECT v AS qv, cell AS qc FROM c WHERE vec_id = 0) "
            "SELECT e.vec_id, round(list_dot_product(e.v, q.qv) / "
            "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)))"
            ", 6) AS cosine "
            "FROM c e CROSS JOIN q WHERE e.vec_id != 0 AND e.cell = q.qc "
            "ORDER BY cosine DESC, e.vec_id LIMIT 10"
        ),
        "ann_ivf_probe5": (
            "WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v, "
            + cell_sql("embedding", 4)
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
            + cell_sql("v", 8)
            + " AS cell FROM ee) "
            "SELECT * FROM ("
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            + COS_AB
            + " AS cosine "
            "FROM cells a JOIN cells b "
            "ON a.cell = b.cell AND a.vec_id < b.vec_id"
            ") WHERE cosine >= 0.8"
        ),
    }
