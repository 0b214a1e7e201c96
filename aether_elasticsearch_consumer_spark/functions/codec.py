"""Posting-list compression (X4) + block-max metadata (X5).

Lucene keeps postings as delta + FOR/varbyte-compressed blocks with impact
(block-max) metadata enabling WAND skipping; the reference relies on that
engine wholesale. Here: docID deltas + LEB128-style varbyte, fully
vectorized in numpy (no per-element Python loops — loops run over the ≤10
*byte positions*, not over the values), packaged in 128-posting blocks each
carrying ``first_doc_id``, ``last_doc_id``, ``count`` and an exact
``max_score`` upper bound (computed with true per-doc lengths at build time,
so WAND pruning is exact, never lossy).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import BLOCK_SIZE


def varbyte_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128 varbyte encode + per-value byte lengths (for slicing a batch
    encode into per-block buffers without re-encoding)."""
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b"", np.empty(0, dtype=np.int64)
    nbytes = np.ones(n, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > np.uint64(0)).astype(np.int64)
        tmp >>= np.uint64(7)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offsets[1:])
    out = np.zeros(int(offsets[-1] + nbytes[-1]), dtype=np.uint8)
    for b in range(int(nbytes.max())):
        mask = nbytes > b
        payload = (v[mask] >> np.uint64(7 * b)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > b).astype(np.uint8) << 7
        out[offsets[mask] + b] = payload.astype(np.uint8) | cont
    return out.tobytes(), nbytes


def varbyte_encode(values: np.ndarray) -> bytes:
    """LEB128 varbyte encode a non-negative int array (vectorized)."""
    return varbyte_encode_with_lengths(values)[0]


def varbyte_decode(buf: bytes | bytearray | memoryview) -> np.ndarray:
    """Decode a varbyte buffer → uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    payload = (b & 0x7F).astype(np.uint64)
    byte_idx = np.arange(len(b), dtype=np.int64) - np.repeat(starts, lengths)
    contrib = payload << (np.uint64(7) * byte_idx.astype(np.uint64))
    return np.add.reduceat(contrib, starts)


# -- PForDelta (NewPFD) — the alternative block coding -----------------------
# The north-star names "varbyte/PForDelta"; both are implemented and
# measured (BENCH/BASELINE.md round 4). NewPFD packs each 128-value block
# at a fixed bit-width b chosen to minimize size, with values ≥ 2^b stored
# as exceptions (position + overflow bits, varbyte'd). Fully vectorized:
# the only Python loop in the codec runs over candidate bit-widths.
# Varbyte remains the wire format — see the measurement for why.


def pfor_encode(values: np.ndarray) -> bytes:
    """NewPFD-encode a non-negative uint64 array → bytes.

    Layout: [b:1][n:2][n_exc:2][packed low bits][varbyte exc positions
    (delta-1)][varbyte exc overflow (value >> b)]."""
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b"\x00\x00\x00\x00\x00"
    if n > 0xFFFF:
        raise ValueError("pfor block too large")
    maxbits = int(v.max()).bit_length()
    best_b, best_cost = maxbits, None
    for b in range(maxbits + 1):
        n_exc = int((v >= (np.uint64(1) << np.uint64(b))).sum()) if b < 64 else 0
        if b == 0 and n_exc:
            exc_cost = n_exc * 3
        else:
            exc_cost = n_exc * 3  # ~1-2 bytes position delta + ~1+ overflow
        cost = (n * b + 7) // 8 + exc_cost
        if best_cost is None or cost < best_cost:
            best_b, best_cost = b, cost
    b = best_b
    if b >= 64:
        lows = v
        exc_idx = np.empty(0, dtype=np.int64)
    else:
        thresh = np.uint64(1) << np.uint64(b)
        exc_mask = v >= thresh
        exc_idx = np.flatnonzero(exc_mask)
        lows = v & (thresh - np.uint64(1)) if b else np.zeros(n, np.uint64)
    if b:
        bits = (
            (lows[:, None] >> np.arange(b, dtype=np.uint64)) & np.uint64(1)
        ).astype(np.uint8)
        packed = np.packbits(bits.reshape(-1), bitorder="little").tobytes()
    else:
        packed = b""
    if len(exc_idx):
        pos_deltas = np.empty(len(exc_idx), dtype=np.uint64)
        pos_deltas[0] = exc_idx[0]
        pos_deltas[1:] = np.diff(exc_idx) - 1
        exc_pos = varbyte_encode(pos_deltas)
        exc_val = varbyte_encode(v[exc_idx] >> np.uint64(b))
    else:
        exc_pos = exc_val = b""
    head = bytes([b]) + n.to_bytes(2, "little") + len(exc_idx).to_bytes(2, "little")
    return (
        head
        + len(exc_pos).to_bytes(2, "little")
        + packed
        + exc_pos
        + exc_val
    )


def pfor_decode(buf: bytes | bytearray | memoryview) -> np.ndarray:
    """Decode a ``pfor_encode`` buffer → uint64 array."""
    mv = memoryview(buf)
    b = mv[0]
    n = int.from_bytes(mv[1:3], "little")
    n_exc = int.from_bytes(mv[3:5], "little")
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    exc_pos_len = int.from_bytes(mv[5:7], "little")
    off = 7
    packed_len = (n * b + 7) // 8
    if b:
        bits = np.unpackbits(
            np.frombuffer(mv[off:off + packed_len], dtype=np.uint8),
            bitorder="little",
        )[: n * b].reshape(n, b)
        out = (
            bits.astype(np.uint64)
            << np.arange(b, dtype=np.uint64)[None, :]
        ).sum(axis=1, dtype=np.uint64)
    else:
        out = np.zeros(n, dtype=np.uint64)
    off += packed_len
    if n_exc:
        pos_deltas = varbyte_decode(mv[off:off + exc_pos_len]).astype(np.int64)
        pos_deltas[1:] += 1
        idx = np.cumsum(pos_deltas)
        overflow = varbyte_decode(mv[off + exc_pos_len:])[:n_exc]
        out[idx] |= overflow << np.uint64(b)
    return out


def delta_encode(doc_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing doc_ids → first-value + gaps-1 (denser varbytes)."""
    d = np.asarray(doc_ids, dtype=np.int64)
    out = np.empty_like(d)
    out[0] = d[0]
    out[1:] = np.diff(d) - 1
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    d = np.asarray(deltas, dtype=np.int64)
    d = d.copy()
    d[1:] += 1
    return np.cumsum(d)


@dataclass(frozen=True)
class PostingBlock:
    first_doc_id: int
    last_doc_id: int
    count: int
    max_score: float
    doc_deltas: bytes  # varbyte(delta_encode(doc_ids))
    tfs: bytes         # varbyte(tf - 1)


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    scores: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> list[PostingBlock]:
    """Pack a (sorted by doc_id) posting list into compressed blocks.

    ``scores`` are the exact BM25 contributions of each posting (computed at
    build time with the final N/avgdl/df) — block max is an exact bound.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    blocks: list[PostingBlock] = []
    for s in range(0, len(doc_ids), block_size):
        e = min(s + block_size, len(doc_ids))
        ids = doc_ids[s:e]
        blocks.append(
            PostingBlock(
                first_doc_id=int(ids[0]),
                last_doc_id=int(ids[-1]),
                count=int(e - s),
                max_score=float(scores[s:e].max()),
                doc_deltas=varbyte_encode(delta_encode(ids)),
                tfs=varbyte_encode(tfs[s:e] - 1),
            )
        )
    return blocks


def decode_block(doc_deltas: bytes, tfs: bytes) -> tuple[np.ndarray, np.ndarray]:
    ids = delta_decode(varbyte_decode(doc_deltas).astype(np.int64))
    tf = varbyte_decode(tfs).astype(np.int64) + 1
    return ids, tf
