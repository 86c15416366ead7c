"""Tokenizer fidelity tests vs a character-level C-loop oracle
(SURVEY §5.4.1): trailing-drop quirk D0, 15/16-char boundary, digits,
case folding, delimiter soup, empties."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from invertedindexbuilder_spark.functions.tokenize import (
    char_scan_tokenize,
    postings_frame,
    tokenize_series,
    tokenize_text,
)

CASES = [
    ("hello world",       ["hello"]),              # D0: trailing 'world' dropped
    ("hello world.",      ["hello", "world"]),     # ends non-alnum: kept
    ("hello world!",      ["hello", "world"]),
    ("",                  []),
    (".",                 []),
    ("a",                 []),                      # single in-flight token dropped
    ("a ",                ["a"]),
    ("abcdefghijklmno.",  ["abcdefghijklmno"]),     # exactly 15: kept
    ("abcdefghijklmnop.", []),                      # 16: dropped entirely
    ("getUserAccountManager done.", ["done"]),      # >15 identifier dropped
    ("Hello HELLO hello.", ["hello", "hello", "hello"]),
    ("foo_bar-baz.qux(x,y) end.", ["foo", "bar", "baz", "qux", "x", "y", "end"]),
    ("42 0xdeadbeef v2.", ["42", "0xdeadbeef", "v2"]),
    ("tab\tand\nnewline split.", ["tab", "and", "newline", "split"]),
    ("trailing42", []),                             # only token is in-flight
    ("x trailing42", ["x"]),
]


@pytest.mark.parametrize("text,expected", CASES)
def test_known_cases(text, expected):
    assert tokenize_text(text) == expected
    assert char_scan_tokenize(text) == expected


@settings(max_examples=500, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            list("abcXYZ019 .,_-()\t\n!") + ["abcdefghijklmno", "abcdefghijklmnop"]
        ),
        max_size=60,
    ).map("".join)
)
def test_regex_path_equals_char_scan(text):
    assert tokenize_text(text) == char_scan_tokenize(text)


def test_series_path_equals_scalar_path():
    texts = pd.Series([c[0] for c in CASES] + [None])
    out = tokenize_series(texts)
    assert out.tolist()[:-1] == [c[1] for c in CASES]
    assert out.tolist()[-1] == []


def test_postings_frame_tf_and_types():
    df = postings_frame(
        pd.Series([7, 8], dtype="int64"),
        pd.Series(["a a b a b c.", ""]),
    )
    got = {(r.term, r.doc_id): r.tf for r in df.itertuples()}
    assert got == {("a", 7): 3, ("b", 7): 2, ("c", 7): 1}
    assert str(df["doc_id"].dtype) == "int64"
    assert str(df["tf"].dtype) == "int32"


def _arrow_postings(doc_ids, texts):
    import pyarrow as pa

    from invertedindexbuilder_spark.operators.postings import _postings_batch

    batch = pa.record_batch(
        [pa.array(doc_ids, type=pa.int64()), pa.array(texts, type=pa.string())],
        names=["doc_id", "content"],
    )
    out = _postings_batch(batch)
    if out is None:
        return set()
    return set(
        zip(
            out.column(0).to_pylist(),
            out.column(1).to_pylist(),
            out.column(2).to_pylist(),
        )
    )


def test_arrow_batch_equals_pandas_frame():
    """The r8 Arrow-native build_postings kernel must emit the exact
    (term, doc_id, tf) multiset of the pandas spec path on every known
    edge case (D0, 15/16 boundary, empties, None)."""
    texts = [c[0] for c in CASES] + [None]
    ids = list(range(len(texts)))
    ref = postings_frame(
        pd.Series(ids, dtype="int64"), pd.Series(texts, dtype="object")
    )
    want = {(r.term, r.doc_id, r.tf) for r in ref.itertuples()}
    assert _arrow_postings(ids, texts) == want


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(
                list("abcXYZ019 .,_-()\t\n!é")
                + ["abcdefghijklmno", "abcdefghijklmnop"]
            ),
            max_size=40,
        ).map("".join),
        min_size=1,
        max_size=8,
    )
)
def test_arrow_batch_equals_pandas_frame_property(texts):
    ids = list(range(len(texts)))
    ref = postings_frame(
        pd.Series(ids, dtype="int64"), pd.Series(texts, dtype="object")
    )
    want = {(r.term, r.doc_id, r.tf) for r in ref.itertuples()}
    assert _arrow_postings(ids, texts) == want


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
