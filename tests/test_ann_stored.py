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
