"""Varbyte codec for posting blocks (frozen spec, FIXTURES.md §4).

Encoding: little-endian base-128; 7 payload bits per byte, MSB set means
"continuation" (more bytes follow). Doc ids are delta-coded (first value
absolute... actually: deltas against ``prev``, with the block's first
delta taken against the block's ``first_doc`` base stored in block
metadata — see spimi.py).

Vectorized with numpy: encode/decode operate on whole int64 arrays, no
per-element Python in the steady state beyond one pass to split byte
runs. These run INSIDE Arrow UDFs (mapInPandas), so the per-batch numpy
cost is the whole story.
"""

from __future__ import annotations

import numpy as np

_MASK = 0x7F
_CONT = 0x80


def encode(values: np.ndarray) -> bytes:
    """Varbyte-encode a non-negative int64 array."""
    return encode_with_lengths(values)[0]


def encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """(buffer, per-value byte lengths). The lengths let callers slice a
    single whole-array encoding into per-block byte ranges (the block
    builder encodes one shard in one call instead of one call per block)."""
    vals = np.asarray(values, dtype=np.uint64)
    if vals.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    if np.asarray(values).min() < 0:
        raise ValueError("varbyte requires non-negative values")
    # vectorized byte-length: ceil(bit_length/7), min 1
    bl = np.zeros(vals.shape, dtype=np.int64)
    tmp = vals.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        bl[nz] += 1
        tmp >>= np.uint64(7)
    bl[bl == 0] = 1
    total = int(bl.sum())
    out = np.empty(total, dtype=np.uint8)
    # write bytes: position offsets per value
    ends = np.cumsum(bl)
    starts = ends - bl
    # up to 10 byte-planes for 64-bit values
    max_len = int(bl.max())
    v = vals.copy()
    for plane in range(max_len):
        sel = bl > plane
        idx = starts[sel] + plane
        chunk = (v[sel] & np.uint64(_MASK)).astype(np.uint8)
        more = (plane + 1) < bl[sel]
        out[idx] = chunk | (more.astype(np.uint8) << 7)
        v[sel] >>= np.uint64(7)
    return out.tobytes(), bl


def decode(buf: bytes) -> np.ndarray:
    """Decode varbyte bytes back to an int64 array (vectorized)."""
    if not buf:
        return np.empty(0, dtype=np.int64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_last = (b & _CONT) == 0
    n = int(is_last.sum())
    # group index per byte: 0-based value index
    group = np.zeros(b.size, dtype=np.int64)
    group[1:] = np.cumsum(is_last)[:-1]
    # position within group
    starts = np.zeros(n, dtype=np.int64)
    ends = np.flatnonzero(is_last)
    starts[1:] = ends[:-1] + 1
    pos = np.arange(b.size, dtype=np.int64) - starts[group]
    vals = np.zeros(n, dtype=np.uint64)
    np.add.at(vals, group,
              (b & np.uint8(_MASK)).astype(np.uint64) << (7 * pos).astype(np.uint64))
    return vals.astype(np.int64)


_BIAS = np.uint64(1) << np.uint64(63)


def delta_encode(sorted_ids: np.ndarray, base: int) -> bytes:
    """Delta against a base (the block's first_doc anchor).

    Ids are signed int64 (xxhash64 doc ids span the full range), so deltas
    are computed in biased uint64 space — int64 ascending order is
    preserved by the +2^63 bias, and uint64 differences can't overflow.
    """
    ids = np.asarray(sorted_ids, dtype=np.int64).astype(np.uint64)
    ids ^= _BIAS  # flip sign bit == +2^63 bias, order-preserving, no overflow
    b = np.uint64((int(base) + (1 << 63)) % (1 << 64))
    prev = np.concatenate(([b], ids[:-1]))
    if (ids < prev).any():
        raise ValueError("doc ids must be sorted ascending")
    return encode(ids - prev)


def delta_decode(buf: bytes, base: int) -> np.ndarray:
    deltas = decode(buf).astype(np.uint64)
    b = np.uint64((int(base) + (1 << 63)) % (1 << 64))
    return ((np.cumsum(deltas) + b) - _BIAS).astype(np.int64)
