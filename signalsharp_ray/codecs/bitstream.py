"""Minimal MSB-first bit stream used by the Gorilla / delta-of-delta codecs.

Pure-python but batched: writers accumulate (value, nbits) pairs and pack
once with numpy at to_bytes() time, so per-point overhead stays small.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    __slots__ = ("_vals", "_bits", "_total")

    def __init__(self):
        self._vals: list[int] = []
        self._bits: list[int] = []
        self._total = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._vals.append(value & ((1 << nbits) - 1))
        self._bits.append(nbits)
        self._total += nbits

    @property
    def bit_length(self) -> int:
        return self._total

    def to_bytes(self) -> bytes:
        if not self._vals:
            return b""
        # concatenate into one big integer MSB-first, then dump to bytes
        acc = 0
        for v, b in zip(self._vals, self._bits):
            acc = (acc << b) | v
        pad = (-self._total) % 8
        acc <<= pad
        nbytes = (self._total + pad) // 8
        return acc.to_bytes(nbytes, "big")


class BitReader:
    __slots__ = ("_acc", "_nbits", "_pos")

    def __init__(self, data: bytes):
        self._acc = int.from_bytes(data, "big") if data else 0
        self._nbits = len(data) * 8
        self._pos = 0

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        if self._pos + nbits > self._nbits:
            raise EOFError("bit stream exhausted")
        shift = self._nbits - self._pos - nbits
        out = (self._acc >> shift) & ((1 << nbits) - 1)
        self._pos += nbits
        return out

    @property
    def bits_remaining(self) -> int:
        return self._nbits - self._pos
