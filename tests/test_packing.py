"""Sequence packing (concatenate-and-chunk): structural invariants and
partition-count independence of the distributed prefix-sum layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from invertedindexbuilder_spark.operators.packing import pack_sequences

L = 100


@pytest.fixture(scope="module")
def docs(spark):
    # lengths exercise every edge: zero-token, shorter than L, exactly
    # L, boundary-straddling, and many-sequence giants
    lens = [7, 0, 120, 100, 1, 333, 99, 0, 250, 42, 613, 5]
    return spark.createDataFrame(
        list(enumerate(lens)), "doc_id long, n_tokens long"
    ).cache()


def test_packing_invariants(spark, docs):
    segs = pack_sequences(docs, L, num_partitions=4).collect()
    lens = {r["doc_id"]: r["n_tokens"] for r in docs.collect()}
    total = sum(lens.values())

    # 1. every doc's segments cover exactly its token span, contiguously
    by_doc: dict[int, list] = {}
    for r in segs:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, n in lens.items():
        parts = sorted(by_doc.get(d, []), key=lambda r: r["doc_begin"])
        if n == 0:
            assert not parts
            continue
        assert parts[0]["doc_begin"] == 0
        assert parts[-1]["doc_end"] == n
        for a, b in zip(parts, parts[1:]):
            assert a["doc_end"] == b["doc_begin"]

    # 2. every sequence except the last is exactly full, with segments
    # tiling [0, L) without gaps or overlaps
    by_seq: dict[int, list] = {}
    for r in segs:
        by_seq.setdefault(r["seq_id"], []).append(r)
    n_seqs = -(-total // L)
    assert set(by_seq) == set(range(n_seqs))
    for s, rows in by_seq.items():
        rows = sorted(rows, key=lambda r: r["seq_begin"])
        assert rows[0]["seq_begin"] == 0
        covered = 0
        for r in rows:
            assert r["seq_begin"] == covered
            covered += r["doc_end"] - r["doc_begin"]
        want = L if s < n_seqs - 1 else total - L * (n_seqs - 1)
        assert covered == want


def test_packing_is_partition_count_independent(spark, docs):
    a = sorted(map(tuple, pack_sequences(docs, L, num_partitions=1).collect()))
    b = sorted(map(tuple, pack_sequences(docs, L, num_partitions=7).collect()))
    assert a == b


def test_packing_giant_doc_explodes_bounded(spark):
    giant = spark.createDataFrame([(0, 1000), (1, 50)], "doc_id long, n_tokens long")
    segs = pack_sequences(giant, L, num_partitions=2).collect()
    g = [r for r in segs if r["doc_id"] == 0]
    assert len(g) == 10  # 1000 tokens / 100 per sequence
    assert all(r["seq_begin"] == 0 for r in g)
    tail = [r for r in segs if r["doc_id"] == 1]
    assert len(tail) == 1 and tail[0]["seq_id"] == 10
