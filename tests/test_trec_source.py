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
