"""Shared bitstream primitives: Exp-Golomb reader/writer and
NAL emulation-prevention (ITU-T H.264 7.3/7.4 byte-stream rules).
Split out of the codecs monolith in r12 (VERDICT r11 what's-wrong #2);
behavior unchanged."""

from __future__ import annotations

import math
import struct

import numpy as np

class _EgBitReader:
    """MSB-first bit reader with H.264 Exp-Golomb (ue/se) support."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0          # bit position

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.d[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.read(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("H264: bad Exp-Golomb code")
        return (1 << zeros) - 1 + (self.read(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


class _EgBitWriter:
    """MSB-first bit writer with Exp-Golomb, for SPS fixtures."""

    def __init__(self):
        self.bits: list = []

    def write(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int):
        k = v + 1
        n = k.bit_length()
        self.write(0, n - 1)
        self.write(k, n)

    def se(self, v: int):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def bytes_aligned(self) -> bytes:
        bits = self.bits + [1] + [0] * ((-len(self.bits) - 1) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _strip_emulation(b: bytes) -> bytes:
    """Remove H.264 emulation-prevention bytes (00 00 03 -> 00 00)."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(b):
        c = b[i]
        if zeros >= 2 and c == 3:
            zeros = 0
            i += 1
            continue
        zeros = zeros + 1 if c == 0 else 0
        out.append(c)
        i += 1
    return bytes(out)


def _insert_emulation(b: bytes) -> bytes:
    """Insert emulation-prevention bytes so no 00 00 0x(<=3) survives."""
    out = bytearray()
    zeros = 0
    for c in b:
        if zeros >= 2 and c <= 3:
            out.append(3)
            zeros = 0
        out.append(c)
        zeros = zeros + 1 if c == 0 else 0
    return bytes(out)


_H264_HIGH_PROFILES = (100, 110, 122, 244, 44, 83, 86, 118, 128, 138,
                       139, 134, 135)


