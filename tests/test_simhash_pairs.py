"""simhash_pairs (Manku/Jain/Sarma banding): candidate generation must
be EXACT (pigeonhole) — banded output equals brute-force Hamming scan."""

from __future__ import annotations

import pytest

from invertedindexbuilder_spark.operators.dedup import simhash, simhash_pairs


def _docs(spark):
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = [
        (0, base),
        (1, base),                       # identical -> hamming 0
        (2, base + " extra"),            # near
        (3, "totally different words about completely other topics here"),
        (4, base.replace("alpha", "alpna")),  # near
        (5, "x"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_banded_equals_bruteforce(spark):
    docs = _docs(spark)
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    want = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(sigs[a] ^ sigs[b]).count("1")
            if d <= 3:
                want[(a, b)] = d
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(docs, max_hamming=3).collect()
    }
    assert got == want
    assert got[(0, 1)] == 0  # the planted identical pair is present


def test_parameter_guards(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="must exceed"):
        simhash_pairs(docs, max_hamming=4, bands=4)
    with pytest.raises(ValueError, match="evenly"):
        simhash_pairs(docs, nbits=32, bands=5, max_hamming=3)
