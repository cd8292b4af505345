"""Minimal MSB-first bit stream used by the Gorilla / delta-of-delta codecs.

The writer flushes completed bytes into a bytearray as it goes, keeping the
working accumulator under 8 bits — O(1) per write and O(total_bits/8) memory
(a single big-int accumulator would cost O(n^2) in total shifts).
"""

from __future__ import annotations


class BitWriter:
    __slots__ = ("_out", "_acc", "_nbits", "_total")

    def __init__(self):
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0
        self._total = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits <= 0:
            return
        if value == 0 and nbits >= 64:
            # bulk path for long zero runs (regular/constant series): byte-
            # align, then extend with whole zero bytes — O(nbits/8)
            self._total += nbits
            if self._nbits:
                fill = 8 - self._nbits
                self._out.append((self._acc << fill) & 0xFF)
                nbits -= fill
                self._acc = 0
                self._nbits = 0
            whole, rem = divmod(nbits, 8)
            self._out.extend(b"\x00" * whole)
            self._nbits = rem
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        self._total += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    @property
    def bit_length(self) -> int:
        return self._total

    def to_bytes(self) -> bytes:
        if self._nbits:
            return bytes(self._out) + bytes([(self._acc << (8 - self._nbits)) & 0xFF])
        return bytes(self._out)


class BitReader:
    __slots__ = ("_data", "_pos", "_nbits")

    def __init__(self, data: bytes):
        self._data = data
        self._nbits = len(data) * 8
        self._pos = 0

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        if self._pos + nbits > self._nbits:
            raise EOFError("bit stream exhausted")
        start_byte = self._pos >> 3
        end_byte = (self._pos + nbits + 7) >> 3
        chunk = int.from_bytes(self._data[start_byte:end_byte], "big")
        bits_in_chunk = (end_byte - start_byte) * 8
        shift = bits_in_chunk - (self._pos - start_byte * 8) - nbits
        self._pos += nbits
        return (chunk >> shift) & ((1 << nbits) - 1)

    @property
    def bits_remaining(self) -> int:
        return self._nbits - self._pos


def pack_tokens_msb(tok_v, tok_w, tok_s, total_bits: int) -> bytes:
    """Vectorized variable-width bit packing: OR (value, width<=64, bit
    start) tokens into an MSB-first bit stream of total_bits (token order
    free; uncovered bits are zero — zero runs need no tokens). Each token
    spans at most two adjacent uint64 words; contributions are combined
    with one argsort + bitwise_or.reduceat, so packing is O(k) numpy work
    with no per-bit scatter and no Python loop."""
    import numpy as np

    tok_v = np.asarray(tok_v, dtype=np.uint64)
    tok_w = np.asarray(tok_w, dtype=np.int64)
    tok_s = np.asarray(tok_s, dtype=np.int64)
    o = (tok_s & 63).astype(np.uint64)
    ov = o + tok_w.astype(np.uint64)
    word = tok_s >> 6
    lo_shift = np.where(ov <= 64, np.uint64(64) - ov, np.uint64(0))
    hi_shift = np.where(ov > 64, ov - np.uint64(64), np.uint64(0))
    part1 = np.where(ov <= 64, tok_v << lo_shift, tok_v >> hi_shift)
    spill = ov > 64
    part2 = tok_v[spill] << (np.uint64(128) - ov[spill])  # << is mod 2^64
    widx = np.concatenate([word, word[spill] + 1])
    contrib = np.concatenate([part1, part2])
    order = np.argsort(widx, kind="stable")
    wsorted = widx[order]
    csorted = contrib[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(wsorted)) + 1])
    words = np.zeros((total_bits + 63) // 64, dtype=np.uint64)
    words[wsorted[starts]] = np.bitwise_or.reduceat(csorted, starts)
    return words.astype(">u8").tobytes()[: (total_bits + 7) // 8]
