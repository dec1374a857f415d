"""docID-delta + varbyte posting-list codec with a block-max directory.

SURVEY.md §4 item 1: per-term sorted docID lists are stored as
delta-then-varbyte bytes (Lester et al.; the classic VByte of the IR
literature) with a per-block directory carrying (first_doc, last_doc, byte
offsets, max BM25 weight) for block-max pruning (Ding & Suel BM-WAND).

Layout (per term):

- postings are cut into blocks of ``block_size`` entries;
- within a block the FIRST docID is stored absolute and the rest as
  ``delta - 1`` gaps (strictly increasing ids → gaps >= 1, so the -1 buys a
  byte on dense runs); blocks restart absolute so a block is decodable
  without its predecessors (random access for skipping);
- tf and dl streams are plain varbyte, also block-aligned;
- ``max_weight`` = max over the block of tf/(tf + k1·(1-b+b·dl/avgdl)) —
  the docID-independent part of BM25; multiplied by idf·(k1+1) at query
  time it upper-bounds any posting's contribution (the block-max bound).

Everything is vectorized numpy — no per-int Python loops (the fill loop is
over BYTE POSITIONS within a varint, <= 10 iterations).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

DEFAULT_BLOCK = 128


def varbyte_encode_with_ends(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 array -> (varbyte bytes, cumulative byte end per value).

    Little-endian 7-bit groups, high bit = continuation.  Vectorized: loops
    only over the max byte width (<=10).  The ends array lets batch callers
    slice the encoded stream per value range without re-encoding."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += tmp > 0
        tmp >>= np.uint64(7)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for k in range(int(nbytes.max())):
        sel = nbytes > k
        byte = ((v[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[sel] - 1 > k).astype(np.uint8) << 7
        out[starts[sel] + k] = byte | cont
    return out, ends


def varbyte_encode(values: np.ndarray) -> np.ndarray:
    """uint64 array -> varbyte bytes (see :func:`varbyte_encode_with_ends`)."""
    return varbyte_encode_with_ends(values)[0]


def varbyte_decode(buf: np.ndarray | bytes, offset: int = 0, count: int | None = None) -> np.ndarray:
    """varbyte bytes -> uint64 array; decode ``count`` values from ``offset``
    (None = all).  Vectorized via segment-id cumsum + np.add.at."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    b = b[offset:]
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    if count is not None:
        # cut the buffer after the count-th terminator
        last_pos = np.flatnonzero(is_last)
        if count > last_pos.size:
            raise ValueError("varbyte_decode: not enough values in buffer")
        b = b[: last_pos[count - 1] + 1]
        is_last = is_last[: b.size]
    starts_mask = np.empty(b.size, dtype=bool)
    starts_mask[0] = True
    starts_mask[1:] = is_last[:-1]
    seg = np.cumsum(starts_mask) - 1  # segment id per byte
    n = int(seg[-1]) + 1
    pos = np.arange(b.size, dtype=np.int64)
    seg_starts = np.flatnonzero(starts_mask)
    shift = (pos - seg_starts[seg]).astype(np.uint64) * np.uint64(7)
    vals = np.zeros(n, dtype=np.uint64)
    np.bitwise_or.at(vals, seg, (b & 0x7F).astype(np.uint64) << shift)
    return vals


class Block(NamedTuple):
    first_doc: int
    last_doc: int
    n: int
    doc_off: int
    tf_off: int
    dl_off: int
    max_weight: float


class EncodedPostings(NamedTuple):
    docs: bytes
    tfs: bytes
    dls: bytes
    blocks: list[Block]


def bm25_weight(tfs: np.ndarray, dls: np.ndarray, avgdl: float,
                k1: float = 1.2, b: float = 0.75) -> np.ndarray:
    """The idf-free BM25 factor tf/(tf + k1·(1-b+b·dl/avgdl)) (multiply by
    idf·(k1+1) for the full term score)."""
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    return tf / (tf + k1 * ((1.0 - b) + b * dl / avgdl))


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                    avgdl: float, k1: float = 1.2, b: float = 0.75,
                    block_size: int = DEFAULT_BLOCK) -> EncodedPostings:
    """Sorted (doc_ids, tfs, dls) -> compressed streams + block directory."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    assert doc_ids.size and np.all(np.diff(doc_ids) > 0), "docIDs must be strictly increasing"
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    weights = bm25_weight(tfs, dls, avgdl, k1, b)

    doc_parts: list[np.ndarray] = []
    tf_parts: list[np.ndarray] = []
    dl_parts: list[np.ndarray] = []
    blocks: list[Block] = []
    doc_off = tf_off = dl_off = 0
    for s in range(0, doc_ids.size, block_size):
        e = min(s + block_size, doc_ids.size)
        ids = doc_ids[s:e]
        gaps = np.empty(ids.size, dtype=np.uint64)
        gaps[0] = np.uint64(ids[0])
        if ids.size > 1:
            gaps[1:] = (np.diff(ids) - 1).astype(np.uint64)
        dpart = varbyte_encode(gaps)
        tpart = varbyte_encode(tfs[s:e].astype(np.uint64))
        lpart = varbyte_encode(dls[s:e].astype(np.uint64))
        blocks.append(
            Block(int(ids[0]), int(ids[-1]), int(e - s), doc_off, tf_off, dl_off,
                  float(weights[s:e].max()))
        )
        doc_parts.append(dpart)
        tf_parts.append(tpart)
        dl_parts.append(lpart)
        doc_off += dpart.size
        tf_off += tpart.size
        dl_off += lpart.size
    return EncodedPostings(
        np.concatenate(doc_parts).tobytes(),
        np.concatenate(tf_parts).tobytes(),
        np.concatenate(dl_parts).tobytes(),
        blocks,
    )


def encode_postings_many(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                         offsets: np.ndarray, avgdl: float,
                         k1: float = 1.2, b: float = 0.75,
                         block_size: int = DEFAULT_BLOCK) -> list[EncodedPostings]:
    """Batch-encode MANY terms' postings in one vectorized pass.

    ``offsets`` has length n_terms+1; term t owns rows
    ``[offsets[t], offsets[t+1])`` and its doc_ids must be strictly
    increasing.  The gap/varbyte/block math runs ONCE over the concatenated
    arrays (no per-term numpy calls); the only per-term Python is slicing the
    three encoded streams.  Output is byte-identical to calling
    :func:`encode_postings` per term (tests/test_codec.py asserts it)."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = doc_ids.size
    n_terms = offsets.size - 1
    if n == 0:
        return []

    term_lens = np.diff(offsets)
    term_of = np.repeat(np.arange(n_terms, dtype=np.int64), term_lens)
    idx_in_term = np.arange(n, dtype=np.int64) - offsets[term_of]
    block_start = (idx_in_term % block_size) == 0

    # gap stream: absolute docID at block starts, (delta - 1) elsewhere
    gaps = np.empty(n, dtype=np.int64)
    gaps[block_start] = doc_ids[block_start]
    rest = ~block_start
    gaps[rest] = doc_ids[rest] - doc_ids[np.flatnonzero(rest) - 1] - 1
    assert np.all(gaps >= 0), "docIDs must be strictly increasing per term"

    docs_b, doc_ends = varbyte_encode_with_ends(gaps.astype(np.uint64))
    tfs_b, tf_ends = varbyte_encode_with_ends(tfs.astype(np.uint64))
    dls_b, dl_ends = varbyte_encode_with_ends(dls.astype(np.uint64))
    doc_starts = doc_ends - np.diff(np.concatenate([[0], doc_ends]))
    tf_starts = tf_ends - np.diff(np.concatenate([[0], tf_ends]))
    dl_starts = dl_ends - np.diff(np.concatenate([[0], dl_ends]))

    weights = bm25_weight(tfs, dls, avgdl, k1, b)
    bs_rows = np.flatnonzero(block_start)  # global block start rows
    block_max = np.maximum.reduceat(weights, bs_rows)
    block_end_row = np.concatenate([bs_rows[1:], [n]]) - 1  # last row per block
    # block index range per term (terms always begin on a block boundary)
    term_first_block = np.searchsorted(bs_rows, offsets[:-1], side="left")
    term_last_block = np.searchsorted(bs_rows, offsets[1:], side="left")

    out: list[EncodedPostings] = []
    for t in range(n_terms):
        s, e = int(offsets[t]), int(offsets[t + 1])
        if s == e:
            out.append(EncodedPostings(b"", b"", b"", []))
            continue
        d0, t0, l0 = int(doc_starts[s]), int(tf_starts[s]), int(dl_starts[s])
        d1 = int(doc_ends[e - 1])
        t1 = int(tf_ends[e - 1])
        l1 = int(dl_ends[e - 1])
        blocks = []
        for bi in range(int(term_first_block[t]), int(term_last_block[t])):
            r0, r1 = int(bs_rows[bi]), int(block_end_row[bi])
            blocks.append(Block(
                int(doc_ids[r0]), int(doc_ids[r1]), r1 - r0 + 1,
                int(doc_starts[r0]) - d0, int(tf_starts[r0]) - t0,
                int(dl_starts[r0]) - l0, float(block_max[bi]),
            ))
        out.append(EncodedPostings(
            docs_b[d0:d1].tobytes(), tfs_b[t0:t1].tobytes(),
            dls_b[l0:l1].tobytes(), blocks,
        ))
    return out


def decode_block(enc: EncodedPostings | tuple, bi: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one block -> (doc_ids, tfs, dls); random access via offsets."""
    docs_b, tfs_b, dls_b, blocks = enc[0], enc[1], enc[2], enc[3]
    blk = blocks[bi]
    first, _, n, doff, toff, loff = blk[0], blk[1], blk[2], blk[3], blk[4], blk[5]
    gaps = varbyte_decode(docs_b, doff, n).astype(np.int64)
    ids = np.empty(n, dtype=np.int64)
    ids[0] = gaps[0]
    if n > 1:
        ids[1:] = gaps[1:] + 1
        np.cumsum(ids, out=ids)
    tfs = varbyte_decode(tfs_b, toff, n).astype(np.int64)
    dls = varbyte_decode(dls_b, loff, n).astype(np.int64)
    return ids, tfs, dls


def decode_all(enc: EncodedPostings | tuple) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode every block of a term's postings."""
    blocks = enc[3]
    parts = [decode_block(enc, i) for i in range(len(blocks))]
    if not parts:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    return (
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
        np.concatenate([p[2] for p in parts]),
    )
