"""End-to-end curation plan (plans/curate.py): staged removal
attribution, keep-list semantics, resume, and the curate -> build ->
query round trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from invertedindexbuilder_spark.catalog import Catalog
from invertedindexbuilder_spark.plans.curate import curate, curated_docs


def _src(spark):
    """Synthetic docs_src with one planted problem per stage.
    Key order == doc_id order (paths ascend), so ids are predictable."""
    good = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the field with steady effort and calm focus every day"
    )
    near = good + " extra trailing words appended here for a near copy"
    rows = [
        ("r", "a000", "c", "txt", good),                      # 0 keep
        ("r", "a001", "c", "txt", good),                      # 1 exact dup of 0
        ("r", "a002", "c", "txt", "der und die das ist gut " * 8),  # 2 lang=de
        # 3: lang=en (one marker) but punctuation-swamped -> quality
        ("r", "a003", "c", "txt", "the " + "!" * 40),
        # 4: pure repetition of an en marker -> high dup_word_frac,
        # passes lang and quality
        ("r", "a004", "c", "txt", ("the " * 40).strip()),
        ("r", "a005", "c", "txt", near),                      # 5 near dup of 0
        ("r", "a006", "c", "txt",
         "completely different content about distributed systems and "
         "inverted index construction pipelines running on clusters"),  # 6 keep
    ]
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )


@pytest.fixture()
def curated(spark, tmp_out):
    m = curate(
        spark,
        _src(spark),
        tmp_out,
        langs=["en"],
        min_quality=0.2,
        max_dup_word_frac=0.9,
        near_dup_threshold=0.5,
    )
    return m, tmp_out


def test_stage_attribution(spark, curated):
    m, out = curated
    rep = m["phases"]["curate"]
    assert rep["docs_in"] == 7 and rep["docs_out"] == 2
    assert rep["removed_exact_dup"] == 1
    assert rep["removed_lang"] == 1
    assert rep["removed_quality"] == 1
    assert rep["removed_repetition"] == 1
    assert rep["removed_near_dup"] == 1
    reasons = {
        r["doc_id"]: r["reason"]
        for r in Catalog(spark, out).read("removals").collect()
    }
    assert reasons == {
        1: "exact_dup",
        2: "lang",
        3: "quality",
        4: "repetition",
        5: "near_dup",
    }
    keep = {
        r["doc_id"] for r in Catalog(spark, out).read("keep_list").collect()
    }
    assert keep == {0, 6}


def test_each_doc_removed_once(spark, curated):
    _, out = curated
    rm = Catalog(spark, out).read("removals")
    assert rm.count() == rm.select("doc_id").distinct().count()


def test_curated_view_and_resume(spark, curated):
    m, out = curated
    view = curated_docs(spark, _src(spark), out)
    assert view.count() == 2
    assert set(view.columns) == {"repo", "path", "commit", "lang", "content"}
    # resume: unchanged source -> no-op, same report object
    m2 = curate(
        spark,
        _src(spark),
        out,
        langs=["en"],
        min_quality=0.2,
        max_dup_word_frac=0.9,
        near_dup_threshold=0.5,
    )
    assert m2["phases"]["curate"] == m["phases"]["curate"]


def test_roundtrip_curate_build_query(spark, curated, tmp_path):
    """The curated VIEW feeds the index build directly; queries over
    the curated index see no removed doc's vocabulary."""
    from invertedindexbuilder_spark.operators.local_query import (
        LocalIndex,
        topk_local,
    )
    from invertedindexbuilder_spark.plans.build import build

    _, out = curated
    idx_root = str(tmp_path / "idx")
    build(spark, curated_docs(spark, _src(spark), out), idx_root)
    li = LocalIndex(idx_root)
    # 'spam' only existed in the repetition-removed doc
    assert topk_local(li, "spam", mode="or", k=5) == []
    # surviving vocabulary answers (both kept docs match one term each)
    assert len(topk_local(li, "fox pipelines", mode="or", k=5)) == 2


def test_near_dup_chain_keeps_exactly_one(spark, tmp_out):
    """a~b and b~c (c may or may not pair with a directly): connected
    components must keep exactly the minimum of the chain — the
    pairwise larger-id rule this replaced also passed 2-chains, so the
    3-chain is the distinguishing case."""
    base = (
        "the quick brown fox jumps over the lazy dog while steady "
        "effort and calm focus carry the work through every day"
    )
    rows = [
        ("r", "a000", "c", "txt", base),
        ("r", "a001", "c", "txt", base + " xone"),
        ("r", "a002", "c", "txt", base + " xone xtwo"),
    ]
    src = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    m = curate(
        spark, src, tmp_out,
        langs=None, min_quality=None, max_dup_word_frac=None,
        near_dup_threshold=0.5,
    )
    keep = {
        r["doc_id"] for r in Catalog(spark, tmp_out).read("keep_list").collect()
    }
    assert keep == {0}
    assert m["phases"]["curate"]["removed_near_dup"] == 2


def test_stages_can_be_disabled(spark, tmp_out):
    m = curate(
        spark,
        _src(spark),
        tmp_out,
        langs=None,
        min_quality=None,
        max_dup_word_frac=None,
        near_dup_threshold=None,
    )
    rep = m["phases"]["curate"]
    assert rep["docs_out"] == rep["docs_in"] - rep["removed_exact_dup"]
