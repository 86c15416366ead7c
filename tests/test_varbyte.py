"""Property + edge tests for the varbyte/gap codec (SURVEY §5.4.1)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from invertedindexbuilder_spark.functions.compress import (
    decode_blocks_pruned,
    decode_posting_list,
    encode_posting_list,
    reference_record_bytes,
    vb_byte_lengths,
    vb_decode,
    vb_encode,
)


def c_vb_encode_one(n: int) -> bytes:
    """Byte-level reimplementation of the reference vb_encode
    (var_bytes.c:5-18) used as the byte-exactness oracle."""
    m, d = n, 0
    if m == 0:
        d = 1
    while m != 0:
        m //= 128
        d += 1
    out = bytearray()
    for _ in range(d):
        out.append(n % 128)
        n //= 128
    out[-1] += 128
    return bytes(out)


EDGE_VALUES = [0, 1, 127, 128, 129, 16383, 16384, 2**21 - 1, 2**21, 2**31 - 1]


def test_edge_values_byte_exact_vs_c():
    for v in EDGE_VALUES:
        assert vb_encode(np.array([v])) == c_vb_encode_one(v), v


def test_zero_encodes_as_0x80():
    assert vb_encode(np.array([0])) == b"\x80"


def test_concatenated_roundtrip():
    vals = np.array(EDGE_VALUES, dtype=np.int64)
    data = vb_encode(vals)
    assert data == b"".join(c_vb_encode_one(int(v)) for v in vals)
    out = vb_decode(data)
    np.testing.assert_array_equal(out, vals)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**31 - 1), max_size=300))
def test_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.int64)
    data = vb_encode(arr)
    np.testing.assert_array_equal(vb_decode(data), arr)
    np.testing.assert_array_equal(
        vb_byte_lengths(arr), [len(c_vb_encode_one(int(v)) ) for v in vals]
    )


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**30),
            st.integers(min_value=1, max_value=10_000),
        ),
        min_size=1,
        max_size=700,
        unique_by=lambda t: t[0],
    )
)
def test_posting_list_roundtrip(postings):
    postings.sort()
    docs = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    last, sizes, max_tf, payload = encode_posting_list(docs, tfs)
    assert len(last) == (len(docs) - 1) // 128 + 1
    assert int(np.asarray(sizes).sum()) == len(payload)
    d2, t2 = decode_posting_list(payload, len(docs), sizes)
    np.testing.assert_array_equal(d2, docs)
    np.testing.assert_array_equal(t2, tfs)
    # block metadata: last doc per block, max tf per block
    for b in range(len(last)):
        lo, hi = b * 128, min((b + 1) * 128, len(docs))
        assert last[b] == docs[hi - 1]
        assert max_tf[b] == tfs[lo:hi].max()


def test_gap_chain_across_block_boundary():
    """Delta chain must continue across blocks (model_support.c:234-249):
    block 1's first gap is relative to block 0's last doc_id."""
    docs = np.arange(0, 300, dtype=np.int64) * 7 + 3
    tfs = np.ones(300, dtype=np.int64)
    last, sizes, _, payload = encode_posting_list(docs, tfs)
    assert list(last) == [int(docs[127]), int(docs[255]), int(docs[299])]
    # decode block 1 alone with base=last[0] must give docs[128:256]
    off = int(sizes[0])
    vals = vb_decode(payload[off : off + int(sizes[1])], count=256)
    np.testing.assert_array_equal(np.cumsum(vals[:128]) + int(last[0]), docs[128:256])


def test_first_gap_is_absolute_doc_id():
    docs = np.array([5], dtype=np.int64)
    tfs = np.array([2], dtype=np.int64)
    _, _, _, payload = encode_posting_list(docs, tfs)
    assert payload == c_vb_encode_one(5) + c_vb_encode_one(2)


def test_doc_id_zero_first_posting():
    docs = np.array([0, 1], dtype=np.int64)
    tfs = np.array([1, 1], dtype=np.int64)
    _, _, _, payload = encode_posting_list(docs, tfs)
    # gap 0 encodes as 0x80
    assert payload == b"\x80" + c_vb_encode_one(1) + c_vb_encode_one(1) * 2


def test_chunked_encoding_equals_whole_list():
    """Skew-salted chunk encoding (SURVEY §7.4): encoding doc-range
    chunks with prev_doc_id continuation, then concatenating, must be
    byte-identical to encoding the whole list (chunks block-aligned)."""
    rng = np.random.default_rng(42)
    docs = np.sort(rng.choice(10**6, size=1000, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=1000).astype(np.int64)
    l0, s0, m0, p0 = encode_posting_list(docs, tfs)
    cut = 512  # block-aligned (4 blocks)
    l1, s1, m1, p1 = encode_posting_list(docs[:cut], tfs[:cut])
    l2, s2, m2, p2 = encode_posting_list(
        docs[cut:], tfs[cut:], prev_doc_id=int(docs[cut - 1])
    )
    assert p1 + p2 == p0
    np.testing.assert_array_equal(np.concatenate([l1, l2]), l0)
    np.testing.assert_array_equal(np.concatenate([s1, s2]), s0)
    np.testing.assert_array_equal(np.concatenate([m1, m2]), m0)


def test_pruned_decode_matches_suffix():
    docs = np.arange(1, 1001, dtype=np.int64) * 3
    tfs = (docs % 7 + 1).astype(np.int64)
    last, sizes, _, payload = encode_posting_list(docs, tfs)
    for k in [0, 1, 3, 384 * 3, 999 * 3, 1000 * 3, 5000]:
        d2, t2 = decode_blocks_pruned(payload, 1000, last, sizes, min_doc_id=k)
        # the suffix starts at the first block whose last doc >= k
        blk = int(np.searchsorted(last, k, side="left"))
        lo = blk * 128
        np.testing.assert_array_equal(d2, docs[lo:])
        np.testing.assert_array_equal(t2, tfs[lo:])


def test_pruned_decode_max_bound_truncates_blocks():
    """[min, max] block pruning: every kept doc range is a superset of
    the exact [min, max] rows and never includes blocks wholly outside;
    boundary blocks may straddle (callers row-filter)."""
    docs = np.arange(1, 1001, dtype=np.int64) * 3
    tfs = (docs % 7 + 1).astype(np.int64)
    last, sizes, _, payload = encode_posting_list(docs, tfs)
    for lo_doc, hi_doc in [
        (0, 0), (0, 3), (0, 384), (5, 2000), (1200, 1201),
        (0, 10**6), (2999, 3000), (3000, 3001), (3001, 10**6),
    ]:
        d2, t2 = decode_blocks_pruned(
            payload, 1000, last, sizes, min_doc_id=lo_doc, max_doc_id=hi_doc
        )
        exact = (docs >= lo_doc) & (docs <= hi_doc)
        keep = np.isin(docs, d2)
        # superset of the exact range rows...
        assert (keep | ~exact).all()
        # ...and at most one boundary block of slack on each side
        assert d2.size <= exact.sum() + 2 * 128
        # decoded rows are internally consistent
        pos = np.searchsorted(docs, d2)
        np.testing.assert_array_equal(docs[pos], d2)
        np.testing.assert_array_equal(tfs[pos], t2)


def test_reference_record_layout():
    docs = np.array([3, 10], dtype=np.int64)
    tfs = np.array([1, 4], dtype=np.int64)
    last, sizes, _, payload = encode_posting_list(docs, tfs)
    rec = reference_record_bytes(2, last, sizes, payload)
    # vb(df=2) vb(lastdoc_tbl=1B) vb(size_tbl=1B) [vb(10)] [vb(4B)] payload
    assert rec == (
        c_vb_encode_one(2)
        + c_vb_encode_one(1)
        + c_vb_encode_one(1)
        + c_vb_encode_one(10)
        + c_vb_encode_one(4)
        + payload
    )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**30),
            st.integers(min_value=1, max_value=10_000),
        ),
        min_size=1,
        max_size=700,
        unique_by=lambda t: t[0],
    ),
    st.data(),
)
def test_block_run_decode_equals_whole_and_per_block(postings, data):
    """decode_block_run (the local session's one-vb_decode-per-run
    path) == decode_posting_list for the full list AND for every
    contiguous sub-run started at a block boundary (base from
    last_doc_ids, exactly how LocalIndex._decode_blocks calls it)."""
    from invertedindexbuilder_spark.functions.compress import (
        decode_block_run,
        full_block_counts,
    )

    postings.sort()
    docs = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    last, sizes, _max_tf, payload = encode_posting_list(docs, tfs)
    sizes = np.asarray(sizes, dtype=np.int64)
    counts = full_block_counts(len(docs), 128)
    offs = np.concatenate(([0], np.cumsum(sizes)))

    d_all, t_all = decode_block_run(payload, sizes, counts)
    np.testing.assert_array_equal(d_all, docs)
    np.testing.assert_array_equal(t_all, tfs)

    n_blocks = len(sizes)
    b0 = data.draw(st.integers(min_value=0, max_value=n_blocks - 1))
    b1 = data.draw(st.integers(min_value=b0, max_value=n_blocks - 1))
    base = int(last[b0 - 1]) if b0 > 0 else 0
    d_run, t_run = decode_block_run(
        bytes(payload)[offs[b0] : offs[b1 + 1]],
        sizes[b0 : b1 + 1],
        counts[b0 : b1 + 1],
        prev_doc_id=base,
    )
    lo = int(counts[:b0].sum())
    hi = int(counts[: b1 + 1].sum())
    np.testing.assert_array_equal(d_run, docs[lo:hi])
    np.testing.assert_array_equal(t_run, tfs[lo:hi])
