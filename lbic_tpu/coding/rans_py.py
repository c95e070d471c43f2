"""Pure-Python rANS, bit-for-bit the same stream format as rans.cpp.

Exists (a) as a fallback when no C++ toolchain is present and (b) as an
independent implementation for cross-backend round-trip tests (C++ encode ->
Python decode and vice versa). Slow; the C++ backend is the production path.
"""

import numpy as np

PRECISION = 16
RANS_L = 1 << 31
BYPASS_BITS = 11
BYPASS_CHUNKS = 3
_MASK32 = (1 << 32) - 1


def _zigzag(v):
    return (v << 1) ^ (v >> 63) if v < 0 else (v << 1)


def _unzigzag(z):
    return (z >> 1) ^ -(z & 1)


def encode_with_indexes_py(symbols, indexes, cdfs, cdf_lengths, offsets):
    symbols = np.asarray(symbols, dtype=np.int64)
    indexes = np.asarray(indexes, dtype=np.int64)
    cdfs = np.asarray(cdfs, dtype=np.int64)
    cdf_lengths = np.asarray(cdf_lengths, dtype=np.int64)
    offsets = np.asarray(offsets, dtype=np.int64)
    x = RANS_L
    words = []

    def put(start, freq):
        nonlocal x
        x_max = ((RANS_L >> PRECISION) << 32) * freq
        while x >= x_max:
            words.append(x & _MASK32)
            x >>= 32
        x = ((x // freq) << PRECISION) + (x % freq) + start

    def put_bits(bits, nbits):
        nonlocal x
        x_max = (RANS_L >> nbits) << 32
        while x >= x_max:
            words.append(x & _MASK32)
            x >>= 32
        x = (x << nbits) | (bits & ((1 << nbits) - 1))

    for i in range(len(symbols) - 1, -1, -1):
        idx = int(indexes[i])
        row = cdfs[idx]
        max_value = int(cdf_lengths[idx]) - 2
        value = int(symbols[i]) - int(offsets[idx])
        if 0 <= value < max_value:
            put(int(row[value]), int(row[value + 1] - row[value]))
        else:
            z = _zigzag(value - max_value if value >= max_value else value)
            for c in range(BYPASS_CHUNKS - 1, -1, -1):
                put_bits(z >> (c * BYPASS_BITS), BYPASS_BITS)
            put(int(row[max_value]), int(row[max_value + 1] - row[max_value]))

    out = bytearray(x.to_bytes(8, "little"))
    for w in reversed(words):
        out += int(w).to_bytes(4, "little")
    return bytes(out)


class RansDecoderPy:
    def __init__(self, stream: bytes):
        assert len(stream) >= 8
        self.x = int.from_bytes(stream[:8], "little")
        self.buf = stream
        self.pos = 8

    def _renorm(self):
        while self.x < RANS_L:
            if self.pos + 4 > len(self.buf):
                self.x <<= 32
                return
            w = int.from_bytes(self.buf[self.pos : self.pos + 4], "little")
            self.pos += 4
            self.x = (self.x << 32) | w

    def _get(self, row, cdf_len):
        peek = self.x & ((1 << PRECISION) - 1)
        lo, hi = 0, cdf_len - 1
        while hi - lo > 1:
            mid = (lo + hi) >> 1
            if row[mid] <= peek:
                lo = mid
            else:
                hi = mid
        start = int(row[lo])
        freq = int(row[lo + 1]) - start
        self.x = freq * (self.x >> PRECISION) + peek - start
        self._renorm()
        return lo

    def _get_bits(self, nbits):
        bits = self.x & ((1 << nbits) - 1)
        self.x >>= nbits
        self._renorm()
        return bits

    def decode_stream(self, indexes, cdfs, cdf_lengths, offsets):
        indexes = np.asarray(indexes, dtype=np.int64)
        cdfs = np.asarray(cdfs, dtype=np.int64)
        cdf_lengths = np.asarray(cdf_lengths, dtype=np.int64)
        offsets = np.asarray(offsets, dtype=np.int64)
        out = np.zeros(len(indexes), dtype=np.int32)
        for i in range(len(indexes)):
            idx = int(indexes[i])
            row = cdfs[idx]
            cdf_len = int(cdf_lengths[idx])
            max_value = cdf_len - 2
            s = self._get(row, cdf_len)
            if s == max_value:
                z = 0
                for c in range(BYPASS_CHUNKS):
                    z |= self._get_bits(BYPASS_BITS) << (c * BYPASS_BITS)
                raw = _unzigzag(z)
                value = raw + max_value if raw >= 0 else raw
            else:
                value = s
            out[i] = value + int(offsets[idx])
        return out
