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
