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

from .bitstream import BitReader, BitWriter


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
    # zero-run packing: regular-interval series (the rolled-up tier case)
    # emit one write per run instead of one per point
    nonzero_idx = np.flatnonzero(dods_arr)
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
    tail = len(dods) - pos
    if tail:
        w.write(0, tail)
    return header + w.to_bytes()


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
