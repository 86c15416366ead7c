"""Decoders for the reference's binary artifacts (validated in-sandbox
against running the reference; formats from README.md:282-317 and the
writer code lexicon.c:69-75, model_support.c:127-270,388-425)."""

from __future__ import annotations

import os
import struct

import numpy as np

from invertedindexbuilder_spark.functions.compress import vb_decode


def read_lexicon(path: str) -> list[tuple[str, int]]:
    """output/lexicon -> [(term, offset)] in file (= term-sorted) order.
    Record: int32 term_length, term bytes, int64 offset."""
    out = []
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos + 4 <= len(data):
        (tlen,) = struct.unpack_from("<i", data, pos)
        pos += 4
        term = data[pos : pos + tlen].decode("utf-8", errors="replace")
        pos += tlen
        (offset,) = struct.unpack_from("<q", data, pos)
        pos += 8
        out.append((term, offset))
    return out


def read_doc_table(path: str) -> list[tuple[int, int, int, str]]:
    """output/doc_table -> [(doc_id, size_of_doc, offset, url)].
    Header: int32 total; record: int32 unit_len, int32 doc_id,
    int32 size_of_doc, int64 offset, url bytes (unit_len - 20)."""
    with open(path, "rb") as f:
        data = f.read()
    (total,) = struct.unpack_from("<i", data, 0)
    pos = 4
    out = []
    while pos + 4 <= len(data) and len(out) < total:
        unit_len, doc_id, size_of_doc = struct.unpack_from("<iii", data, pos)
        (offset,) = struct.unpack_from("<q", data, pos + 12)
        url_len = unit_len - 20
        url = data[pos + 20 : pos + 20 + url_len].decode("utf-8", errors="replace")
        pos += 20 + url_len
        out.append((doc_id, size_of_doc, offset, url))
    return out


def read_inverted_list_at(data: bytes, offset: int):
    """Decode one term record of output/inverted_list at byte offset.

    Layout (model_support.c:213-258): vb(df), vb(lastdoc_tbl_bytes),
    vb(sizetbl_bytes), lastdoc table, size table, then blocks of
    <=128 postings (gaps then freqs, chain across blocks).
    Returns (doc_ids, tfs, end_offset).
    """
    pos = offset
    head = []
    for _ in range(3):
        val = 0
        shift = 0
        while True:
            b = data[pos]
            pos += 1
            val += (b & 0x7F) << shift
            shift += 7
            if b >= 128:
                break
        head.append(val)
    df, lastdoc_bytes, sizetbl_bytes = head
    last_doc_ids = vb_decode(data[pos : pos + lastdoc_bytes])
    pos += lastdoc_bytes
    block_sizes = vb_decode(data[pos : pos + sizetbl_bytes])
    pos += sizetbl_bytes
    doc_ids = np.empty(df, dtype=np.int64)
    tfs = np.empty(df, dtype=np.int64)
    done = 0
    prev = 0
    for bs in block_sizes:
        cnt = min(128, df - done)
        vals = vb_decode(data[pos : pos + int(bs)], count=2 * cnt)
        docs = np.cumsum(vals[:cnt]) + prev
        doc_ids[done : done + cnt] = docs
        tfs[done : done + cnt] = vals[cnt : 2 * cnt]
        prev = int(docs[-1])
        pos += int(bs)
        done += cnt
    return doc_ids, tfs, pos


def read_reference_index(output_dir: str) -> dict[str, list[tuple[int, int]]]:
    """Full decode: term -> [(doc_id, tf)], using lexicon offsets."""
    lex = read_lexicon(os.path.join(output_dir, "lexicon"))
    with open(os.path.join(output_dir, "inverted_list"), "rb") as f:
        data = f.read()
    out = {}
    for term, offset in lex:
        docs, tfs, _ = read_inverted_list_at(data, offset)
        out[term] = list(zip(docs.tolist(), tfs.tolist()))
    return out
