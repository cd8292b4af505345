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
import sys

import numpy as np

from .bitstream import BitReader, BitWriter, pack_tokens_msb


# 256-entry leading/trailing-zero LUTs for the byte-sliced vectorized
# clz64/ctz64 (float-free: log2 on uint64 is inexact near 2^53)
_CLZ8 = np.array([8] + [7 - int(i).bit_length() + 1 for i in range(1, 256)], np.int64)
_CTZ8 = np.array(
    [8] + [((i & -i).bit_length() - 1) for i in range(1, 256)], np.int64
)
_BIT_SHIFTS = np.arange(63, -1, -1, dtype=np.uint64)


def _clz_ctz_vec(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized count-leading/trailing-zeros for a uint64 array with no
    zero elements: slice each word into bytes (MSB-first) and combine the
    first/last nonzero byte's LUT value with its byte position."""
    b = x.view(np.uint8).reshape(-1, 8)
    if sys.byteorder == "little":
        b = b[:, ::-1]
    nzmask = b != 0
    rows = np.arange(b.shape[0])
    first_nz = np.argmax(nzmask, axis=1)
    clz = first_nz * 8 + _CLZ8[b[rows, first_nz]]
    last_nz = 7 - np.argmax(nzmask[:, ::-1], axis=1)
    ctz = (7 - last_nz) * 8 + _CTZ8[b[rows, last_nz]]
    return clz, ctz


def _find_resets(lead: np.ndarray, trail: np.ndarray) -> np.ndarray:
    """Indices where the encoder must open a NEW window ('11' branch):
    element i resets iff its meaningful window does not fit inside the
    window of the last reset. The sticky window widens monotonically in
    practice, so resets are rare (measured ~0.1% even on random data) —
    each segment boundary is found with chunked vectorized compares
    instead of a per-element Python loop."""
    k = lead.size
    resets = [0]
    r = 0
    CH = 1024
    while True:
        wl, wt = lead[r], trail[r]
        j = r + 1
        nxt = -1
        while j < k:
            end = min(j + CH, k)
            bad = (lead[j:end] < wl) | (trail[j:end] < wt)
            w = int(np.argmax(bad))
            if bad[w]:
                nxt = j + w
                break
            j = end
        if nxt < 0:
            break
        resets.append(nxt)
        r = nxt
    return np.asarray(resets, dtype=np.int64)


_SCALAR_MAX = 192  # below this many changed values the loop beats numpy setup


def _encode_scalar(header: bytes, bits0: int, xors: list, nz: list, n: int) -> bytes:
    """Per-point loop for SHORT streams, where the vectorized path's fixed
    numpy overhead (~130us) dominates. Emits the identical bit stream."""
    w = BitWriter()
    w.write(bits0, 64)
    prev_lead, prev_trail, prev_mean = 65, -1, 0
    pos = 0
    for idx in nz:
        if idx > pos:
            w.write(0, idx - pos)
        pos = idx + 1
        xi = xors[idx]
        lead = 64 - xi.bit_length()
        if lead > 31:
            lead = 31
        trail = (xi & -xi).bit_length() - 1
        mean = 64 - lead - trail
        if lead >= prev_lead and trail >= prev_trail:
            w.write(2, 2)
            w.write(xi >> prev_trail, prev_mean)
        else:
            w.write(3, 2)
            w.write(lead, 5)
            w.write(mean & 0x3F, 6)
            w.write(xi >> trail, mean)
            prev_lead, prev_mean, prev_trail = lead, mean, trail
    if n - 1 > pos:
        w.write(0, n - 1 - pos)
    return header + w.to_bytes()


def encode_values_gorilla(values: np.ndarray) -> bytes:
    bits = np.ascontiguousarray(np.asarray(values, dtype=np.float64)).view(np.uint64)
    n = bits.size
    header = struct.pack("<I", n)
    if n == 0:
        return header
    xors_arr = bits[1:] ^ bits[:-1]
    nz = np.flatnonzero(xors_arr)
    k = nz.size
    if k == 0:
        w = BitWriter()
        w.write(int(bits[0]), 64)
        if n > 1:
            w.write(0, n - 1)
        return header + w.to_bytes()

    if k < _SCALAR_MAX:
        return _encode_scalar(
            header, int(bits[0]), xors_arr.tolist(), nz.tolist(), n
        )

    x = xors_arr[nz]
    lead, trail = _clz_ctz_vec(x)
    np.minimum(lead, 31, out=lead)  # 5-bit field; claiming fewer is lossless
    mean = 64 - lead - trail
    # zero-run length BEFORE each nonzero xor, and after the last one
    runs = np.diff(np.concatenate([[-1], nz])) - 1
    tail_zeros = (n - 1) - (int(nz[-1]) + 1)

    # segment the stream at window resets; inside a segment every element
    # reuses the segment's window, so ALL bit emission vectorizes
    resets = _find_resets(lead, trail)
    seg_lens = np.diff(np.append(resets, k))
    is_reset = np.zeros(k, dtype=bool)
    is_reset[resets] = True
    w_trail = np.repeat(trail[resets], seg_lens).astype(np.uint64)
    w_mean = np.repeat(mean[resets], seg_lens)

    width = 2 + 11 * is_reset + w_mean
    ends = np.cumsum(runs + width)
    elem_start = 64 + ends - width
    total = 64 + int(ends[-1]) + tail_zeros

    # token streams (value, width<=64, bit start) — order-free; zero-run
    # and padding bits need no tokens (the word buffer is zero-initialized)
    rs = elem_start[resets]
    tok_v = np.concatenate(
        [
            bits[:1],
            (2 + is_reset).astype(np.uint64),  # ctrl '10' / '11'
            lead[resets].astype(np.uint64),
            (mean[resets] & 0x3F).astype(np.uint64),  # 64 wraps to 0
            x >> w_trail,  # meaningful payload bits
        ]
    )
    nr = resets.size
    tok_w = np.concatenate(
        [[64], np.full(k, 2), np.full(nr, 5), np.full(nr, 6), w_mean]
    ).astype(np.int64)
    tok_s = np.concatenate(
        [[0], elem_start, rs + 2, rs + 7, elem_start + 2 + 11 * is_reset]
    ).astype(np.int64)

    return header + pack_tokens_msb(tok_v, tok_w, tok_s, total)


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
