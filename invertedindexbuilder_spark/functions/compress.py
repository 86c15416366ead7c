"""Varbyte + gap compression codecs (numpy-vectorized).

Byte format matches the reference exactly (var_bytes.c:5-40,
model_support.c:127-270):

- varbyte: little-endian base-128 digits, stop bit (``+128``) on the
  most-significant (LAST) byte; value 0 encodes as the single byte 0x80.
- posting payload per term: blocks of <= 128 postings; per block all
  doc-gap varbytes then all freq varbytes.  Doc-ids are delta-coded
  against the previous posting and the delta chain CONTINUES across
  block boundaries; the first gap of a list is the absolute doc_id
  (prev starts at 0).  Freqs are varbyte but NOT gap-coded.
- per-term metadata: ``df``, last-absolute-doc-id per block (varbyte
  table), block payload size in bytes per block (varbyte table).

These are plain numpy functions so they can run inside Arrow-batched
pandas UDFs with no Spark dependency (and be property-tested directly).
"""

from __future__ import annotations

import numpy as np

from invertedindexbuilder_spark import BLOCK_SIZE

_U64 = np.uint64
_MAX_VB_BYTES = 10  # enough for any uint64


def vb_byte_lengths(values: np.ndarray) -> np.ndarray:
    """Number of varbyte bytes for each non-negative int (0 -> 1 byte)."""
    v = np.asarray(values, dtype=_U64)
    lens = np.ones(v.shape, dtype=np.int64)
    thresh = _U64(128)
    while True:
        mask = v >= thresh
        if not mask.any():
            break
        lens[mask] += 1
        # shift threshold by 7 bits; cap to avoid overflow past 2**63
        if int(thresh) > (1 << 56):
            lens[v >= _U64(1 << 63)] = _MAX_VB_BYTES
            break
        thresh = _U64(int(thresh) << 7)
    return lens


def vb_encode(values: np.ndarray) -> bytes:
    """Concatenated varbyte encoding of a 1-D array of non-negative ints."""
    v = np.asarray(values, dtype=_U64)
    if v.size == 0:
        return b""
    lens = vb_byte_lengths(v)
    total = int(lens.sum())
    out = np.zeros(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    max_len = int(lens.max())
    for d in range(max_len):
        mask = lens > d
        out[starts[mask] + d] = (v[mask] >> _U64(7 * d)).astype(_U64) & _U64(0x7F)
    out[starts + lens - 1] += 128  # stop bit on most-significant byte
    return out.tobytes()


def vb_decode(data: bytes, count: int | None = None) -> np.ndarray:
    """Decode a concatenated varbyte byte string into an int64 array.

    If ``count`` is given, stops after that many values (ignoring any
    trailing bytes); otherwise decodes the whole buffer.
    """
    b = np.frombuffer(data, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.int64)
    is_stop = b >= 128
    if is_stop.all():
        # every value is a single byte (v < 128) — dense posting lists
        # are dominated by 1-byte gaps/tfs, so this skips the
        # repeat/scatter machinery below entirely
        vals = (b & 0x7F).astype(np.int64)
        return vals[:count] if count is not None else vals
    stops = np.flatnonzero(is_stop)
    if count is not None:
        stops = stops[:count]
    starts = np.concatenate(([0], stops[:-1] + 1))
    n_vals = stops.size
    lens = stops - starts + 1
    # accumulate per byte POSITION (<= ~5 vectorized passes, the mirror
    # of vb_encode's layout loop) — the np.add.at scatter this replaces
    # cost ~136 ns/value on mixed-width buffers
    out = np.zeros(n_vals, dtype=_U64)
    for d in range(int(lens.max())):
        m = lens > d
        out[m] += (b[starts[m] + d] & 0x7F).astype(_U64) << _U64(7 * d)
    return out.astype(np.int64)


def encode_posting_list(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    prev_doc_id: int = 0,
    block_size: int = BLOCK_SIZE,
):
    """Encode one (chunk of a) doc_id-sorted posting list.

    ``prev_doc_id`` is the delta-chain base: 0 for a whole list (the
    reference's semantics, model_support.c:150 ``prev_doc_id = 0``), or
    the previous chunk's last doc_id when a skew-salted heavy term is
    encoded in doc-range chunks (SURVEY §7.4).

    Returns ``(last_doc_ids, block_bytes, max_tf, payload)`` where the
    first three are per-block int arrays (max_tf is our block-max WAND
    addition; the reference stores only last-doc + size tables) and
    ``payload`` is the concatenated block bytes (gaps then freqs per
    block), byte-identical to the reference's block region.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    n = doc_ids.size
    if n == 0:
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int64),
            b"",
        )
    gaps = np.diff(doc_ids, prepend=np.int64(prev_doc_id))
    gap_lens = vb_byte_lengths(gaps)
    tf_lens = vb_byte_lengths(tfs)

    n_blocks = (n - 1) // block_size + 1
    pad = n_blocks * block_size - n
    if pad:
        pad_z = np.zeros(pad, dtype=np.int64)
        gap_lens_p = np.concatenate([gap_lens, pad_z])
        tf_lens_p = np.concatenate([tf_lens, pad_z])
        tfs_p = np.concatenate([tfs, pad_z])
        docs_p = np.concatenate([doc_ids, np.full(pad, -1, dtype=np.int64)])
    else:
        gap_lens_p, tf_lens_p, tfs_p, docs_p = gap_lens, tf_lens, tfs, doc_ids

    gl = gap_lens_p.reshape(n_blocks, block_size)
    tl = tf_lens_p.reshape(n_blocks, block_size)
    block_bytes = (gl.sum(axis=1) + tl.sum(axis=1)).astype(np.int64)
    last_doc_ids = docs_p.reshape(n_blocks, block_size).max(axis=1)
    max_tf = tfs_p.reshape(n_blocks, block_size).max(axis=1)

    # payload: per block, gap bytes then freq bytes.  Build via one
    # interleaved value array so a single vb_encode call suffices.
    vals = np.empty(2 * n, dtype=np.int64)
    w = 0
    for blk in range(n_blocks):
        lo = blk * block_size
        hi = min(lo + block_size, n)
        cnt = hi - lo
        vals[w : w + cnt] = gaps[lo:hi]
        w += cnt
        vals[w : w + cnt] = tfs[lo:hi]
        w += cnt
    payload = vb_encode(vals)
    return last_doc_ids, block_bytes, max_tf, payload


def full_block_counts(df: int, block_size: int = BLOCK_SIZE) -> np.ndarray:
    """Postings-per-block for a regular (unsalted) list: all full except
    the tail — the reference's implicit layout."""
    n_blocks = (df - 1) // block_size + 1 if df else 0
    counts = np.full(n_blocks, block_size, dtype=np.int64)
    if n_blocks:
        counts[-1] = df - block_size * (n_blocks - 1)
    return counts


def decode_posting_list(
    payload: bytes,
    df: int,
    block_bytes: np.ndarray,
    prev_doc_id: int = 0,
    block_size: int = BLOCK_SIZE,
    block_counts: np.ndarray | None = None,
):
    """Inverse of :func:`encode_posting_list` -> (doc_ids, tfs).

    ``block_counts`` overrides the regular full-blocks layout (needed
    for merged skew-salted chunks, whose interior blocks may be short).
    """
    if block_counts is None:
        block_counts = full_block_counts(df, block_size)
    # the gap chain is unbroken across block boundaries, so the whole
    # list is one contiguous run — a single varbyte pass (r6; the
    # per-block vb_decode loop this replaces paid ~30 us of fixed
    # overhead per 128-posting block in every executor chunk decode)
    return decode_block_run(
        payload, block_bytes, block_counts, prev_doc_id=prev_doc_id
    )


def decode_block_run(
    payload: bytes,
    block_bytes: np.ndarray,
    block_counts: np.ndarray,
    prev_doc_id: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode a CONTIGUOUS run of blocks with ONE varbyte pass.

    Within a list the gap chain continues across block boundaries
    (block b's first gap is relative to the previous block's last doc
    — encode_posting_list writes one unbroken delta stream), so a run
    [b0, b1] decodes as: single vb_decode of the byte range, split the
    flat value array into each block's [gaps | tfs] halves
    (vectorized), cumsum ALL gaps against last_doc_ids[b0-1].  The
    per-block vb_decode loop this replaces paid ~30 us of fixed numpy
    overhead per 128-posting block — the dominant cost of wide
    disjunctions in the driver-local session (local_query).
    """
    bc = np.asarray(block_counts, dtype=np.int64)
    total = int(bc.sum())
    vals = vb_decode(payload, count=2 * total)
    if len(bc) == 1:  # common fast path: one block / whole-run slice
        gaps, tfs = vals[: bc[0]], vals[bc[0] :]
    else:
        starts = np.concatenate(([0], np.cumsum(2 * bc)[:-1]))
        block_of = np.repeat(np.arange(bc.size), 2 * bc)
        within = np.arange(vals.size) - starts[block_of]
        is_gap = within < bc[block_of]
        gaps, tfs = vals[is_gap], vals[~is_gap]
    return np.cumsum(gaps) + prev_doc_id, tfs


def decode_blocks_pruned(
    payload: bytes,
    df: int,
    last_doc_ids: np.ndarray,
    block_bytes: np.ndarray,
    min_doc_id: int,
    prev_doc_id: int = 0,
    block_size: int = BLOCK_SIZE,
    block_counts: np.ndarray | None = None,
    max_doc_id: int | None = None,
):
    """Decode only blocks intersecting [min_doc_id, max_doc_id] (the
    Spark analog of the reference's nextGEQ block skipping,
    inverted_list.c:36-77) plus correct delta-chain re-basing: skipped
    block K's base is last_doc_ids[K-1], which is stored, so no skipped
    bytes are read.  Blocks below keep-range are skipped by offset;
    blocks wholly ABOVE max_doc_id (their preceding last >= max) are
    truncated off the tail — a conjunctive query bounded by the rarest
    term's last doc never decodes them.

    Returns (doc_ids, tfs) of the surviving middle of the list; rows
    inside the boundary blocks may still straddle the range — callers
    apply the exact row filter.
    """
    last_doc_ids = np.asarray(last_doc_ids, dtype=np.int64)
    block_bytes = np.asarray(block_bytes, dtype=np.int64)
    if block_counts is None:
        block_counts = full_block_counts(df, block_size)
    block_counts = np.asarray(block_counts, dtype=np.int64)
    first = int(np.searchsorted(last_doc_ids, min_doc_id, side="left"))
    if first >= last_doc_ids.size:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    if max_doc_id is not None:
        # keep block b iff its exclusive lower bound last[b-1] < max
        # (last[b-1] == max means block b holds no doc <= max; side=
        # 'left' implements exactly that strict comparison)
        stop = int(
            np.searchsorted(last_doc_ids[:-1], max_doc_id, side="left")
        ) + 1
    else:
        stop = last_doc_ids.size
    if stop <= first:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    off = int(block_bytes[:first].sum())
    end = off + int(block_bytes[first:stop].sum())
    base = int(last_doc_ids[first - 1]) if first > 0 else prev_doc_id
    remaining = int(block_counts[first:stop].sum())
    return decode_posting_list(
        payload[off:end],
        remaining,
        block_bytes[first:stop],
        prev_doc_id=base,
        block_size=block_size,
        block_counts=block_counts[first:stop],
    )


def decode_blocks_selected(
    payload: bytes,
    last_doc_ids: np.ndarray,
    block_bytes: np.ndarray,
    block_counts: np.ndarray,
    keep: np.ndarray,
    prev_doc_id: int = 0,
):
    """Decode an arbitrary SUBSET of blocks (indices ``keep``, sorted)
    -> concatenated (doc_ids, tfs).  Each block decodes independently:
    block b's delta-chain base is the stored last_doc_ids[b-1]
    (``prev_doc_id`` for block 0), so skipped blocks cost zero bytes —
    the primitive under distributed block-max (BMW-style) pruning.
    """
    last_doc_ids = np.asarray(last_doc_ids, dtype=np.int64)
    block_bytes = np.asarray(block_bytes, dtype=np.int64)
    block_counts = np.asarray(block_counts, dtype=np.int64)
    keep = np.asarray(keep, dtype=np.int64)
    if keep.size == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(block_bytes)))
    out_d, out_t = [], []
    # consecutive kept indices decode as one run (single varbyte pass
    # each — the chain is continuous inside a run, and a skipped run's
    # base is the stored last_doc_ids of the block before it)
    cuts = np.flatnonzero(np.diff(keep) != 1) + 1
    for run in np.split(keep, cuts):
        b0, b1 = int(run[0]), int(run[-1])
        d, t = decode_block_run(
            payload[offs[b0] : offs[b1 + 1]],
            block_bytes[b0 : b1 + 1],
            block_counts[b0 : b1 + 1],
            prev_doc_id=int(last_doc_ids[b0 - 1]) if b0 > 0 else prev_doc_id,
        )
        out_d.append(d)
        out_t.append(t)
    return np.concatenate(out_d), np.concatenate(out_t)


def reference_record_bytes(
    df: int,
    last_doc_ids: np.ndarray,
    block_bytes: np.ndarray,
    payload: bytes,
) -> bytes:
    """Assemble the reference's exact on-disk per-term record
    (model_support.c:213-258): vb(df), vb(len(lastdoc_table)),
    vb(len(size_table)), lastdoc table, size table, payload."""
    lastdoc_tbl = vb_encode(np.asarray(last_doc_ids, dtype=np.int64))
    size_tbl = vb_encode(np.asarray(block_bytes, dtype=np.int64))
    head = vb_encode(np.array([df, len(lastdoc_tbl), len(size_tbl)], dtype=np.int64))
    return head + lastdoc_tbl + size_tbl + payload
