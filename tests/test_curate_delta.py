"""Incremental curation (plans/curate.curate_delta): delta docs dedup
against the base corpus through STORED fingerprints (content hashes +
LSH band buckets) — base content read only for candidate verify."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from invertedindexbuilder_spark.catalog import Catalog
from invertedindexbuilder_spark.plans.curate import (
    curate,
    curate_delta,
    curated_docs,
)

A = (
    "the quick brown fox jumps over the lazy dog and keeps running "
    "through the field with calm focus and steady effort every day"
)
B = (
    "distributed systems need careful partitioning and the shuffle "
    "boundaries decide how well the whole pipeline can ever scale"
)
C = (
    "inverted index construction proceeds by parsing sorting merging "
    "and finally encoding the posting lists into compressed blocks"
)
D = (
    "a completely fresh document about vector search and embedding "
    "quantization that shares nothing with the base corpus text"
)


def _src(spark, rows):
    return spark.createDataFrame(
        [("r", p, "c", "txt", t) for p, t in rows],
        "repo string, path string, commit string, lang string, content string",
    )


@pytest.fixture()
def base_root(spark, tmp_out):
    base = _src(spark, [("a0", A), ("a1", B), ("a2", C)])
    curate(
        spark, base, tmp_out,
        langs=None, min_quality=None, max_dup_word_frac=None,
        near_dup_threshold=0.5,
    )
    return tmp_out, base


def test_delta_stages_and_append(spark, base_root):
    root, base = base_root
    delta = _src(
        spark,
        [
            ("b0", A),                  # exact copy of base doc 0
            ("b1", B + " zzz"),         # near copy of base doc 1
            ("b2", D),                  # genuinely new -> keep
            ("b3", D + " qqq"),         # near copy WITHIN delta
            ("b4", "the " + "!" * 40),  # quality junk
        ],
    )
    m = curate_delta(
        spark, delta, root, base_src=base,
        langs=None, min_quality=0.2, max_dup_word_frac=None,
        near_dup_threshold=0.5,
    )
    phase = [v for k, v in m["phases"].items() if k.startswith("curate_delta")][0]
    assert phase["docs_in"] == 5 and phase["docs_out"] == 1
    assert phase["removed_exact_dup_base"] == 1
    assert phase["removed_near_dup_base"] == 1
    assert phase["removed_near_dup"] == 1
    assert phase["removed_quality"] == 1
    # delta ids continue after the 3 base docs: b0..b4 -> 3..7
    reasons = {
        r["doc_id"]: r["reason"]
        for r in Catalog(spark, root).read("removals").collect()
    }
    assert reasons == {
        3: "exact_dup_base",
        4: "near_dup_base",
        6: "near_dup",
        7: "quality",
    }
    keep = {r["doc_id"] for r in Catalog(spark, root).read("keep_list").collect()}
    assert keep == {0, 1, 2, 5}
    # the curated view resolves per slice with the documented offsets
    view = curated_docs(spark, base, root).unionByName(
        curated_docs(spark, delta, root, id_offset=3)
    )
    texts = {r["content"] for r in view.collect()}
    assert texts == {A, B, C, D}


def test_replayed_delta_self_heals(spark, base_root):
    root, base = base_root
    delta = _src(spark, [("b0", D)])
    curate_delta(spark, delta, root, base_src=base, langs=None,
                 min_quality=None, near_dup_threshold=0.5)
    n_keep = Catalog(spark, root).read("keep_list").count()
    # same delta again: its survivor is now IN the base hashes
    m = curate_delta(spark, delta, root, base_src=base, langs=None,
                     min_quality=None, near_dup_threshold=0.5)
    phases = [v for k, v in m["phases"].items() if k.startswith("curate_delta")]
    # each RUN keeps its own phase entry (ordinal keys): the replay's
    # consumed id range must count toward the next delta's offset
    assert len(phases) == 2
    assert any(
        p["docs_out"] == 0 and p["removed_exact_dup_base"] == 1 for p in phases
    )
    assert Catalog(spark, root).read("keep_list").count() == n_keep
    # a third delta's ids start past BOTH runs: no id reuse anywhere
    third = _src(spark, [("c0", A + " unique tail")])
    m3 = curate_delta(spark, third, root, base_src=base, langs=None,
                      min_quality=None, near_dup_threshold=0.99)
    all_ids = [
        r["doc_id"]
        for t in ("keep_list", "removals")
        for r in Catalog(spark, root).read(t).collect()
    ]
    assert len(all_ids) == len(set(all_ids))


def test_delta_requires_fingerprints(spark, tmp_out):
    base = _src(spark, [("a0", A)])
    curate(
        spark, base, tmp_out,
        langs=None, min_quality=None, near_dup_threshold=None,
        store_fingerprints=False,
    )
    with pytest.raises(ValueError, match="content_hashes"):
        curate_delta(spark, _src(spark, [("b0", D)]), tmp_out, base_src=base)
