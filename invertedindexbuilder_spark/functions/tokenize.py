"""Exact-semantics tokenizer (reference main.c:85-135), vectorized.

Reference behavior being replicated (SURVEY §2 P1/P1b, §5.3 D0):

- tokens are maximal ``[A-Za-z0-9]+`` runs of the document body,
  lowercased (``main.c:119-120``);
- a token is kept iff ``1 <= len(token) <= 15`` — longer tokens are
  dropped ENTIRELY, not truncated (``main.c:106``, lexicon.h:8-9);
- quirk D0: the scan loop only emits a token when it hits a non-alnum
  delimiter and exits at end-of-body without flushing the in-flight
  token, so the LAST token of a document is dropped whenever the body
  ends in an alphanumeric character (``main.c:104-123`` + ``274``);
- only the body after the URL line is tokenized; the URL itself is not.

The core is pure pandas/numpy so it can run inside Arrow-batched UDFs
and be unit-tested without Spark.  ``char_scan_tokenize`` is a slow
1:1 character-level reimplementation of the C loop used as the test
oracle for the vectorized path.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

from invertedindexbuilder_spark import WORD_LENGTH_MAX, WORD_LENGTH_MIN

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")
# NB: \Z not $ — "$" would match before a trailing newline and wrongly
# trigger the D0 drop for bodies ending "...token\n"
_TRAILING_ALNUM_RE = re.compile(r"[A-Za-z0-9]\Z")


def tokenize_text(text: str) -> list[str]:
    """Tokens of one document body, exact reference semantics."""
    if not text:
        return []
    tokens = _TOKEN_RE.findall(text)
    if tokens and _TRAILING_ALNUM_RE.search(text):
        tokens = tokens[:-1]  # D0: in-flight final token never emitted
    return [
        t.lower() for t in tokens if WORD_LENGTH_MIN <= len(t) <= WORD_LENGTH_MAX
    ]


def _is_alnum(c: str) -> bool:
    # reference IS_ALPHANUM (model.h:69-72) is ASCII [A-Za-z0-9] only
    return ("a" <= c <= "z") or ("A" <= c <= "Z") or ("0" <= c <= "9")


def char_scan_tokenize(text: str) -> list[str]:
    """Character-level reimplementation of main.c:104-123 (test oracle).

    Mirrors the C pointer walk: a token is emitted only at a non-alnum
    delimiter, so an in-flight token at end-of-body is dropped (D0).
    """
    out: list[str] = []
    prev = 0
    i = 0
    n = len(text)
    while i < n:
        if not _is_alnum(text[i]):
            if 0 < i - prev <= WORD_LENGTH_MAX and _is_alnum(text[prev]):
                out.append(text[prev:i].lower())
            i += 1
            prev = i
        else:
            if not _is_alnum(text[prev]):
                prev = i
            i += 1
    return [t for t in out if len(t) >= WORD_LENGTH_MIN]


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized tokenization of a pandas Series of bodies -> Series of
    lists of kept tokens (lowercased, length-filtered, D0 applied)."""
    filled = texts.fillna("")
    toks = filled.str.findall(_TOKEN_RE)
    ends_alnum = filled.str.contains(_TRAILING_ALNUM_RE, regex=True)

    def finish(pair):
        tokens, drop = pair
        if drop and tokens:
            tokens = tokens[:-1]
        return [
            t.lower()
            for t in tokens
            if WORD_LENGTH_MIN <= len(t) <= WORD_LENGTH_MAX
        ]

    return pd.Series(
        map(finish, zip(toks.tolist(), ends_alnum.tolist())), index=texts.index
    )


def postings_frame(doc_ids: pd.Series, texts: pd.Series) -> pd.DataFrame:
    """(doc_id, body) batch -> (term, doc_id, tf) postings frame.

    The per-(term, doc) tf aggregation happens here, inside the batch
    (the Spark analog of the reference's in-memory hash agg A1,
    main.c:186-204) — so no Spark-level shuffle is needed for tf.
    """
    tok_lists = tokenize_series(texts)
    terms: list[str] = []
    dids: list[int] = []
    tfs: list[int] = []
    for did, toks in zip(doc_ids.tolist(), tok_lists.tolist()):
        if not toks:
            continue
        for term, tf in Counter(toks).items():
            terms.append(term)
            dids.append(did)
            tfs.append(tf)
    return pd.DataFrame(
        {
            "term": pd.Series(terms, dtype="object"),
            "doc_id": pd.Series(dids, dtype="int64"),
            "tf": pd.Series(tfs, dtype="int32"),
        }
    )


def count_tokens(text: str) -> int:
    """Number of KEPT tokens (post D0 + length filter)."""
    return len(tokenize_text(text))
