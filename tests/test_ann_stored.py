"""Stored ANN index (operators/similarity.build_ann_tables): served
top-k must equal the ad hoc IVF operators, probes must prune FILES
(the cell partitioning is the point — at 100 TB a 1-of-16 probe reads
1/16th of the objects), and compaction must append under the frozen
cell rule with the same replay guard as the search tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from invertedindexbuilder_spark.operators.similarity import (
    ann_topk_stored,
    build_ann_tables,
    compact_ann_tables,
    cosine_topk,
    ivf_kmeans_topk,
    ivf_topk,
    kmeans_fit,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def grid_root(spark, embeddings, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ann_grid"))
    info = build_ann_tables(spark, embeddings, root, dims=4)
    assert info["n_vectors"] == embeddings.count()
    return root


def _ids(df):
    return [tuple(r) for r in df.collect()]


def test_stored_equals_adhoc_grid(spark, embeddings, grid_root):
    for n_probes in (1, 5):
        served = ann_topk_stored(
            spark, grid_root, query_vec_id=0, k=10, n_probes=n_probes
        )
        adhoc = ivf_topk(
            embeddings, query_vec_id=0, k=10, n_probes=n_probes
        )
        assert _ids(served) == _ids(adhoc), n_probes
    # probe_all == exact brute force
    assert _ids(
        ann_topk_stored(spark, grid_root, query_vec_id=0, k=10, probe_all=True)
    ) == _ids(cosine_topk(embeddings, query_vec_id=0, k=10))


def test_stored_literal_query_vector(spark, embeddings, grid_root):
    """The serving case: the query vector is NOT in the table."""
    qv = [
        float(x)
        for x in embeddings.filter(F.col("vec_id") == 0)
        .collect()[0]["embedding"]
    ]
    served = ann_topk_stored(spark, grid_root, query_vec=qv, k=11, n_probes=5)
    byid = ann_topk_stored(
        spark, grid_root, query_vec_id=0, k=10, n_probes=5
    )
    # literal query keeps vec_id 0 itself (cosine 1.0) at rank 1
    rows = _ids(served)
    assert rows[0][0] == 0 and rows[0][1] == 1.0
    assert rows[1:] == _ids(byid)


def test_probe_prunes_files(spark, grid_root):
    """cell IN (...) must reach the FILE listing: the probed scan's
    input files are a strict subset living only in probed cell=N/
    directories."""
    from invertedindexbuilder_spark.catalog import Catalog

    vecs = Catalog(spark, grid_root).read("ann_vectors")
    probed = vecs.filter(F.col("cell").isin([3, 7]))
    # the probe predicate must land in the scan's PartitionFilters
    # (directory pruning), not merely a post-scan row filter
    plan = probed._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "cell" in pf[0], plan
    # and at runtime only probed cell=N/ files are ever read
    pfiles = {
        r[0] for r in probed.select(F.input_file_name()).distinct().collect()
    }
    assert pfiles
    assert all(("cell=3" in f) or ("cell=7" in f) for f in pfiles)


def test_stored_trained_equals_adhoc(spark, embeddings, tmp_path):
    cents = kmeans_fit(
        embeddings.filter(F.col("vec_id") < 64), k=4, iters=1
    )
    root = str(tmp_path / "ann_kmeans")
    info = build_ann_tables(spark, embeddings, root, centroids=cents)
    assert info["trained"]
    served = ann_topk_stored(spark, root, query_vec_id=0, k=10, n_probes=2)
    adhoc = ivf_kmeans_topk(
        embeddings, query_vec_id=0, k=10, centroids=cents, n_probes=2
    )
    assert _ids(served) == _ids(adhoc)


def test_compact_equals_rebuild_and_replay_raises(spark, embeddings, tmp_path):
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    base = embeddings.filter(F.col("vec_id") < 60)
    delta = embeddings.filter(F.col("vec_id") >= 60)
    build_ann_tables(spark, base, inc, dims=4)
    out = compact_ann_tables(spark, delta, inc)
    build_ann_tables(spark, embeddings, full, dims=4)
    assert out["n_vectors"] == embeddings.count()
    for pa in (False, True):
        assert _ids(
            ann_topk_stored(spark, inc, query_vec_id=0, k=10, probe_all=pa)
        ) == _ids(
            ann_topk_stored(spark, full, query_vec_id=0, k=10, probe_all=pa)
        )

    with pytest.raises(ValueError, match="overlap"):
        compact_ann_tables(spark, delta, inc)
    with pytest.raises(ValueError, match="empty delta"):
        compact_ann_tables(spark, delta.filter("vec_id < 0"), inc)
    # rejected replays left the stats generation untouched
    from invertedindexbuilder_spark.catalog import Catalog

    st = Catalog(spark, inc).read("ann_stats").collect()[0]
    assert int(st["n_vectors"]) == embeddings.count()


# ------------------------------------------------------------ ANN deletion


def test_ann_delete_and_purge(spark, embeddings, tmp_path):
    """Two-phase vector deletion (r6): tombstones exclude instantly
    from every serving path; purge rewrites ONLY the affected cell
    partitions and equals a fresh build over the survivors."""
    from invertedindexbuilder_spark.catalog import Catalog
    from invertedindexbuilder_spark.operators.similarity import (
        compact_ann_tables as _compact,
        delete_ann_vectors,
        purge_ann_deletes,
    )

    root = str(tmp_path / "ann_del")
    build_ann_tables(spark, embeddings, root, dims=4)
    top = ann_topk_stored(
        spark, root, query_vec_id=0, k=3, probe_all=True
    ).collect()
    dead = [int(top[0]["vec_id"]), int(top[1]["vec_id"])]

    assert delete_ann_vectors(spark, root, dead) == {"n_tombstones": 2}
    # tombstoned ids vanish from pruned AND exhaustive serving
    for pa in (False, True):
        got = {
            int(r["vec_id"])
            for r in ann_topk_stored(
                spark, root, query_vec_id=0, k=10, probe_all=pa
            ).collect()
        }
        assert not (got & set(dead)), pa
    # a deleted id can no longer anchor a query
    with pytest.raises(ValueError, match="not in index"):
        ann_topk_stored(spark, root, query_vec_id=dead[0], k=3)
    # replay is idempotent; unknown ids are rejected
    assert delete_ann_vectors(spark, root, dead) == {"n_tombstones": 2}
    with pytest.raises(ValueError, match="do not exist"):
        delete_ann_vectors(spark, root, [10**9])

    res = purge_ann_deletes(spark, root)
    assert res["n_purged"] == 2
    assert res["n_vectors"] == embeddings.count() - 2
    full = str(tmp_path / "ann_surv")
    build_ann_tables(
        spark,
        embeddings.filter(~F.col("vec_id").isin([int(x) for x in dead])),
        full,
        dims=4,
    )
    for pa in (False, True):
        assert _ids(
            ann_topk_stored(spark, root, query_vec_id=0, k=10, probe_all=pa)
        ) == _ids(
            ann_topk_stored(spark, full, query_vec_id=0, k=10, probe_all=pa)
        ), pa
    # the stored table itself matches row-for-row
    def rows(r):
        return sorted(
            (int(x["cell"]), int(x["vec_id"]))
            for x in Catalog(spark, r).read("ann_vectors")
            .select("cell", "vec_id").collect()
        )

    assert rows(root) == rows(full)
    # purge with nothing tombstoned is a no-op
    assert purge_ann_deletes(spark, root)["n_purged"] == 0
    # the watermark survives the purge: re-inserting a purged id is
    # still rejected (no id reuse through the deletion path)
    with pytest.raises(ValueError, match="overlap"):
        _compact(spark, embeddings.filter(F.col("vec_id") == dead[0]), root)


def test_ann_purge_drops_fully_deleted_cell(spark, embeddings, tmp_path):
    """Dynamic partition overwrite only touches partitions present in
    the staged frame — a cell whose EVERY vector is tombstoned must be
    removed explicitly; pin that branch."""
    import os

    from invertedindexbuilder_spark.catalog import Catalog
    from invertedindexbuilder_spark.operators.similarity import (
        delete_ann_vectors,
        purge_ann_deletes,
    )

    root = str(tmp_path / "ann_cell")
    build_ann_tables(spark, embeddings, root, dims=4)
    cat = Catalog(spark, root)
    vecs = cat.read("ann_vectors")
    c = int(
        vecs.groupBy("cell").count().orderBy("count", "cell").first()["cell"]
    )
    dead = [
        int(r["vec_id"])
        for r in vecs.filter(F.col("cell") == c).select("vec_id").collect()
    ]
    delete_ann_vectors(spark, root, dead)
    res = purge_ann_deletes(spark, root)
    assert res["n_purged"] == len(dead)
    assert not os.path.exists(
        os.path.join(cat.path("ann_vectors"), f"cell={c}")
    )
    full = str(tmp_path / "ann_cell_surv")
    build_ann_tables(
        spark,
        embeddings.filter(~F.col("vec_id").isin([int(x) for x in dead])),
        full,
        dims=4,
    )
    assert _ids(
        ann_topk_stored(spark, root, query_vec_id=0, k=10, probe_all=True)
    ) == _ids(
        ann_topk_stored(spark, full, query_vec_id=0, k=10, probe_all=True)
    )
