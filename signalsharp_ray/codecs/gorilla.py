"""Gorilla XOR compression for float64 value streams.

Public algorithm from "Gorilla: A Fast, Scalable, In-Memory Time Series
Database" (Pelkonen et al., VLDB 2015), §4.1.2 — no reference-repo
counterpart (new capability required by BASELINE.json north_rule):

- first value stored raw (64 bits)
- each subsequent value XORed with the previous:
  * XOR == 0          -> single '0' bit
  * same leading/trailing-zero window as the previous XOR
                      -> '10' + meaningful bits
  * otherwise         -> '11' + 5 bits leading-zero count + 6 bits
                         meaningful-bit count (64 encoded as 0) + bits

Layout here: header = uint32 n_points, then the bit stream.
"""

from __future__ import annotations

import struct

import numpy as np

from .bitstream import BitReader, BitWriter


def encode_values_gorilla(values: np.ndarray) -> bytes:
    bits = np.asarray(values, dtype=np.float64).view(np.uint64)
    n = bits.size
    header = struct.pack("<I", n)
    if n == 0:
        return header
    w = BitWriter()
    w.write(int(bits[0]), 64)
    prev_lead, prev_mean = 65, 0  # "no previous window" sentinel
    xors_arr = bits[1:] ^ bits[:-1]
    # vectorized zero-run packing: a run of k unchanged values is k '0'
    # bits — emitted as ONE write (the dominant case for gap-filled / slowly
    # changing series, where the python-per-point loop was the bottleneck)
    nonzero_idx = np.flatnonzero(xors_arr)
    xors = xors_arr.tolist()
    pos = 0
    segments: list[tuple[int, int]] = []  # (zero_run_len, nonzero_index)
    for nz in nonzero_idx.tolist():
        segments.append((nz - pos, nz))
        pos = nz + 1
    tail_zeros = len(xors) - pos
    for run, nz in segments:
        if run:
            w.write(0, run)
        x = xors[nz]
        lead = _clz64(x)
        trail = _ctz64(x)
        if lead > 31:
            lead = 31  # 5-bit field; fewer leading zeros claimed is lossless
        mean = 64 - lead - trail
        if (
            prev_lead <= 64
            and lead >= prev_lead
            and trail >= 64 - prev_lead - prev_mean
        ):
            # reuse previous window
            w.write(2, 2)  # '10'
            window_trail = 64 - prev_lead - prev_mean
            w.write(x >> window_trail, prev_mean)
        else:
            w.write(3, 2)  # '11'
            w.write(lead, 5)
            w.write(mean & 0x3F, 6)  # 64 wraps to 0
            w.write(x >> trail, mean)
            prev_lead, prev_mean = lead, mean
    if tail_zeros:
        w.write(0, tail_zeros)
    return header + w.to_bytes()


def decode_values_gorilla(data: bytes) -> np.ndarray:
    (n,) = struct.unpack_from("<I", data, 0)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    r = BitReader(data[4:])
    prev = r.read(64)
    out[0] = prev
    lead, mean = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # '10' reuse window
            trail = 64 - lead - mean
            x = r.read(mean) << trail
        else:  # '11' new window
            lead = r.read(5)
            mean = r.read(6)
            if mean == 0:
                mean = 64
            trail = 64 - lead - mean
            x = r.read(mean) << trail
        prev ^= x
        out[i] = prev
    return out.view(np.float64)


def _clz64(x: int) -> int:
    return 64 - x.bit_length()


def _ctz64(x: int) -> int:
    return (x & -x).bit_length() - 1
