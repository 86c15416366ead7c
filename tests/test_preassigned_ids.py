"""Pre-assigned doc_id ingestion path (plans.build.prepare_docs).

A source that already carries ``doc_id`` skips the id-map assignment
and its sort-merge join, so content never enters a shuffle — the
property that lets 30M-doc bench builds fit one node's disk.  Scores
must be identical to a rank-assigned build of the same corpus (BM25
depends on tf/df/doc_len/N only, none of which change under an id
permutation); invalid ids must fail the build's validation agg.
"""

import pytest
from pyspark.sql import functions as F

from invertedindexbuilder_spark.catalog import Catalog
from invertedindexbuilder_spark.operators.local_query import (
    LocalIndex,
    topk_local,
)
from invertedindexbuilder_spark.plans.build import build
from invertedindexbuilder_spark.sources.docs_src import synthetic_docs_src

N_DOCS = 400


@pytest.fixture(scope="module")
def both_builds(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("preids")
    out_ids = str(root / "with_ids")
    out_rank = str(root / "rank")
    build(spark, synthetic_docs_src(spark, N_DOCS, with_ids=True), out_ids)
    build(spark, synthetic_docs_src(spark, N_DOCS), out_rank)
    return out_ids, out_rank


def test_provided_ids_are_used_verbatim(spark, both_builds):
    out_ids, out_rank = both_builds
    ids = sorted(
        r["doc_id"]
        for r in Catalog(spark, out_ids).read("docs").select("doc_id").collect()
    )
    # row index = doc_id: dense 0..N-1 by construction of the fixture
    assert ids == list(range(N_DOCS))
    # and the branch genuinely differs from rank assignment: the rank
    # order (repo, path, commit) is NOT the row order, so at least one
    # doc must map to a different id in the rank-assigned build
    url_to_id = {
        r["url"]: r["doc_id"]
        for r in Catalog(spark, out_ids).read("docs").collect()
    }
    rank_pairs = Catalog(spark, out_rank).read("docs").collect()
    assert any(url_to_id[r["url"]] != r["doc_id"] for r in rank_pairs)


def test_scores_invariant_under_id_permutation(spark, both_builds):
    out_ids, out_rank = both_builds
    docs_a = {
        r["doc_id"]: r["url"]
        for r in Catalog(spark, out_ids).read("docs").collect()
    }
    docs_b = {
        r["doc_id"]: r["url"]
        for r in Catalog(spark, out_rank).read("docs").collect()
    }
    ix_a, ix_b = LocalIndex(out_ids), LocalIndex(out_rank)
    for mode in ("and", "or"):
        # k > corpus candidate count so ties can't crop either list
        res_a = topk_local(ix_a, "alpha common", mode=mode, k=N_DOCS)
        res_b = topk_local(ix_b, "alpha common", mode=mode, k=N_DOCS)
        by_url_a = sorted((docs_a[d], round(s, 9)) for d, s in res_a)
        by_url_b = sorted((docs_b[d], round(s, 9)) for d, s in res_b)
        assert by_url_a == by_url_b


def test_duplicate_provided_ids_raise(spark, tmp_path):
    src = synthetic_docs_src(spark, 50, with_ids=True).withColumn(
        "doc_id", F.col("doc_id") % 25
    )
    with pytest.raises(ValueError, match="pre-assigned doc_id"):
        build(spark, src, str(tmp_path / "dup"))


def test_negative_provided_ids_raise(spark, tmp_path):
    src = synthetic_docs_src(spark, 50, with_ids=True).withColumn(
        "doc_id", F.col("doc_id") - 10
    )
    with pytest.raises(ValueError, match="pre-assigned doc_id"):
        build(spark, src, str(tmp_path / "neg"))


def test_sparse_provided_ids_raise(spark, tmp_path):
    # unique and non-negative but NOT dense 0..n-1: compact() addresses
    # delta docs at n..n+d-1 and merge_builds() shifts shard B by
    # n_docs(A), so a gap-ful id space would later collide or orphan ids
    # — the build must reject it up front (ADVICE r5 high)
    src = synthetic_docs_src(spark, 50, with_ids=True).withColumn(
        "doc_id", F.col("doc_id") * 2
    )
    with pytest.raises(ValueError, match="dense"):
        build(spark, src, str(tmp_path / "sparse"))
