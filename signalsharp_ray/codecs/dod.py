"""Delta-of-delta timestamp compression.

Public algorithm from Gorilla (Pelkonen et al., VLDB 2015) §4.1.1, adapted to
microsecond-resolution int64 timestamps (the paper uses seconds with a 14-bit
first delta; we store the first timestamp and first delta raw as 64-bit):

- header: uint32 n, then first ts (64b) and first delta (64b, zigzag)
- each later delta-of-delta D:
  * D == 0                 -> '0'
  * D in [-63, 64]         -> '10'  + 7 bits  (D + 63)
  * D in [-255, 256]       -> '110' + 9 bits  (D + 255)
  * D in [-2047, 2048]     -> '1110' + 12 bits (D + 2047)
  * else                   -> '1111' + 64 bits zigzag
Regular-interval series (the common rolled-up tier case) collapse to one bit
per point after the first two.

Contract: consecutive deltas must fit in int64 (always true for microsecond
epoch timestamps, which are < 2^51 in magnitude).
"""

from __future__ import annotations

import struct

import numpy as np

from .bitstream import BitReader, BitWriter, pack_tokens_msb


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def encode_timestamps_dod(timestamps: np.ndarray) -> bytes:
    ts = np.asarray(timestamps, dtype=np.int64)
    n = ts.size
    header = struct.pack("<I", n)
    if n == 0:
        return header
    w = BitWriter()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if n == 1:
        return header + w.to_bytes()
    deltas = np.diff(ts)
    w.write(_zigzag(int(deltas[0])) & ((1 << 64) - 1), 64)
    dods_arr = np.diff(deltas)
    nonzero_idx = np.flatnonzero(dods_arr)
    k = nonzero_idx.size
    if k < _SCALAR_MAX:
        return _encode_dods_scalar(
            header + w.to_bytes(), dods_arr, nonzero_idx, int(dods_arr.size)
        )

    # fully vectorized (no sequential state, unlike Gorilla values): bucket
    # each nonzero dod into its size class, then pack ctrl + payload tokens
    # with the shared word-level packer. Zero runs need no tokens.
    d = dods_arr[nonzero_idx]
    runs = np.diff(np.concatenate([[-1], nonzero_idx])) - 1
    tail_zeros = int(dods_arr.size) - (int(nonzero_idx[-1]) + 1)

    c1 = (d >= -63) & (d <= 64)
    c2 = ~c1 & (d >= -255) & (d <= 256)
    c3 = ~c1 & ~c2 & (d >= -2047) & (d <= 2048)
    c4 = ~(c1 | c2 | c3)
    ctrl_v = np.select([c1, c2, c3], [2, 6, 14], default=15).astype(np.uint64)
    ctrl_w = np.select([c1, c2, c3], [2, 3, 4], default=4).astype(np.int64)
    zz = ((d << 1) ^ (d >> 63)).astype(np.uint64)  # vectorized zigzag
    pay_v = np.select(
        [c1, c2, c3], [d + 63, d + 255, d + 2047], default=0
    ).astype(np.uint64)
    pay_v[c4] = zz[c4]
    pay_w = np.select([c1, c2, c3], [7, 9, 12], default=64).astype(np.int64)

    width = ctrl_w + pay_w
    ends = np.cumsum(runs + width)
    elem_start = 128 + ends - width
    total = 128 + int(ends[-1]) + tail_zeros

    tok_v = np.concatenate(
        [
            np.array([int(ts[0]) & ((1 << 64) - 1)], dtype=np.uint64),
            np.array([_zigzag(int(deltas[0])) & ((1 << 64) - 1)], dtype=np.uint64),
            ctrl_v,
            pay_v,
        ]
    )
    tok_w = np.concatenate([[64, 64], ctrl_w, pay_w])
    tok_s = np.concatenate([[0, 64], elem_start, elem_start + ctrl_w])
    return header + pack_tokens_msb(tok_v, tok_w, tok_s, total)


_SCALAR_MAX = 192  # below this the per-point loop beats numpy setup


def _encode_dods_scalar(prefix: bytes, dods_arr, nonzero_idx, n_dods: int) -> bytes:
    """Short-stream path: prefix already holds header + ts0 + delta0."""
    w = BitWriter()
    dods = dods_arr.tolist()
    pos = 0
    for nz in nonzero_idx.tolist():
        run = nz - pos
        if run:
            w.write(0, run)
        pos = nz + 1
        d = dods[nz]
        if -63 <= d <= 64:
            w.write(2, 2)
            w.write(d + 63, 7)
        elif -255 <= d <= 256:
            w.write(6, 3)
            w.write(d + 255, 9)
        elif -2047 <= d <= 2048:
            w.write(14, 4)
            w.write(d + 2047, 12)
        else:
            w.write(15, 4)
            w.write(_zigzag(int(d)) & ((1 << 64) - 1), 64)
    tail = n_dods - pos
    if tail:
        w.write(0, tail)
    return prefix + w.to_bytes()


def decode_timestamps_dod(data: bytes) -> np.ndarray:
    (n,) = struct.unpack_from("<I", data, 0)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    r = BitReader(data[4:])
    t0 = _to_signed64(r.read(64))
    out[0] = t0
    if n == 1:
        return out
    delta = _unzigzag(r.read(64))
    out[1] = t0 + delta
    for i in range(2, n):
        if r.read(1) == 0:
            d = 0
        elif r.read(1) == 0:
            d = r.read(7) - 63
        elif r.read(1) == 0:
            d = r.read(9) - 255
        elif r.read(1) == 0:
            d = r.read(12) - 2047
        else:
            d = _unzigzag(r.read(64))
        delta += d
        out[i] = out[i - 1] + delta
    return out


def _to_signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u
