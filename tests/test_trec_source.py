"""TREC source connector round-trip: serializer (oracle) -> reader
(engine) must reproduce the original rows, and an index built from the
TREC file must equal one built from the table."""

import os

from invertedindexbuilder_spark.sources.docs_src import (
    synthetic_docs_src_pandas,
)
from invertedindexbuilder_spark.sources.trec import read_trec, trec_to_docs_src
from oracle.c_oracle import serialize_trec

N = 120


def test_trec_roundtrip(spark, tmp_path):
    pdf = synthetic_docs_src_pandas(N)
    trec = str(tmp_path / "corpus.trec")
    serialize_trec(pdf, trec)

    got = read_trec(spark, trec).toPandas()
    assert len(got) == N
    pdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    want_urls = ("http://" + pdf.repo + "/" + pdf.path + "#" + pdf["commit"]).tolist()
    assert sorted(got.url.tolist()) == sorted(want_urls)
    by_url = dict(zip(got.url, got.content))
    for url, content in zip(want_urls, pdf.content.tolist()):
        assert by_url[url] == content, url


def test_trec_to_docs_src_recovers_keys(spark, tmp_path):
    pdf = synthetic_docs_src_pandas(40)
    trec = str(tmp_path / "c.trec")
    serialize_trec(pdf, trec)
    back = trec_to_docs_src(read_trec(spark, trec)).toPandas()
    orig = set(zip(pdf.repo, pdf.path, pdf["commit"]))
    got = set(zip(back.repo, back.path, back["commit"]))
    assert got == orig


def test_url_filter_drops_non_h(spark, tmp_path):
    trec = str(tmp_path / "f.trec")
    with open(trec, "w") as f:
        f.write("<DOC>\n<TEXT>\nhttp://ok/x#0\nhello there.\n</TEXT>\n</DOC>\n")
        f.write("<DOC>\n<TEXT>\nftp://nope/x#0\ndropped doc.\n</TEXT>\n</DOC>\n")
    got = read_trec(spark, trec).collect()
    assert len(got) == 1 and got[0]["url"].startswith("http://ok")


def test_gen_rows_pinned():
    """FIXTURES.md determinism contract: the synthetic generator's
    output is pinned byte-for-byte (sha256 over all columns) so perf
    work on _gen_content (r8: hoisted zipf cdf, manual choice
    replication, grouped join) can never silently change the corpus —
    bench/scaling comparability across rounds depends on it."""
    import hashlib

    import numpy as np

    from invertedindexbuilder_spark.sources.docs_src import _gen_rows

    want = {
        (0, 5000): "c08757ba87bffc1d210ec8e5dd5326f7361cdb2d11814039a085620ba8dac2ee",
        (997, 1003): "75bae19db2ad1005a29aed99dc7f4ff12c7191656c0053a742d863189fb9e527",
        (99997, 100003): "16e8e9b5eedf2871e71f38af352b11845db6dd7233354975ffc9a04f24731f67",
        (999997, 1000003): "697eb756a91a1acadde887a3d9d1b6306b6042b6e66c995c0f69547214cd5326",
    }
    for (lo, hi), h0 in want.items():
        df = _gen_rows(np.arange(lo, hi), 42)
        h = hashlib.sha256(
            (
                "\x00".join(df["content"])
                + "\x01".join(df["repo"])
                + "\x01".join(df["path"])
                + "\x01".join(df["commit"])
                + "\x01".join(df["lang"])
            ).encode()
        ).hexdigest()
        assert h == h0, f"generator output changed for rows [{lo}, {hi})"
    # non-default seed + token_range path
    df = _gen_rows(np.arange(0, 2000), 7, (10, 50))
    h = hashlib.sha256("\x00".join(df["content"]).encode()).hexdigest()
    assert h == "eb008abd6475d99399cac60bc491e20690479846c21cabb79a26e195fa002b83"
