"""Pure-Python range coder — the alternative entropy-coder backend.

The reference exposes two coders behind one API: compressai's rANS
(default) and the `range_coder` package's carry-less range coder
(entropy_layers_cai.py:33-51, `_EntropyCoder(method)` with method in
{"ans", "rangecoder"}). This is our equivalent second backend: an
LZMA-style 32-bit range coder (64-bit low with carry propagation via a
cache byte, 24-bit renormalization threshold), driven by the SAME
quantized CDF tables and the SAME out-of-range escape scheme as the rANS
backend (zigzag + 3x11-bit bypass chunks, escape slot at cdf_len-2), so
the two coders are drop-in interchangeable at identical rate (< 0.1%).

Unlike rANS (LIFO: encoder walks symbols backwards), the range coder is
FIFO — symbols are encoded in forward order. Stream format:
plain concatenated coder bytes; decoding requires the same (indexes,
cdfs) sequence, exactly like the rANS streams.

Bit-for-bit the same stream as range_coder.cpp; exists as the no-toolchain
fallback and as the cross-backend test oracle.
"""

import numpy as np

PRECISION = 16
BYPASS_BITS = 11
BYPASS_CHUNKS = 3
_TOP = 1 << 24
_MASK32 = (1 << 32) - 1


def _zigzag(v):
    return (v << 1) ^ (v >> 63) if v < 0 else (v << 1)


def _unzigzag(z):
    return (z >> 1) ^ -(z & 1)


class _Encoder:
    """Active coding window is bits [0,32) of `low`; when `range` drops
    below 2^24 the top byte (bits 24-31) is final up to a possible +1
    carry from later additions (nested-interval property bounds the sum
    of all future additions by the current range < 2^32), so the carry
    is rippled directly into the already-emitted buffer through any
    0xFF run."""

    def __init__(self):
        self.low = 0          # < 2^33: bit 32 is the pending carry
        self.range = _MASK32
        self.out = bytearray()

    def _emit(self):
        if self.low > _MASK32:  # carry: ripple into emitted bytes
            i = len(self.out) - 1
            while self.out[i] == 0xFF:
                self.out[i] = 0
                i -= 1
            self.out[i] += 1
        self.out.append((self.low >> 24) & 0xFF)
        self.low = (self.low & 0xFFFFFF) << 8

    def encode(self, start, freq, tot_bits=PRECISION):
        self.range >>= tot_bits
        self.low += start * self.range
        self.range *= freq
        while self.range < _TOP:
            self._emit()
            self.range <<= 8

    def encode_bits(self, bits, nbits):
        # uniform model: start=bits, freq=1, tot=1<<nbits
        self.range >>= nbits
        self.low += bits * self.range
        while self.range < _TOP:
            self._emit()
            self.range <<= 8

    def flush(self):
        for _ in range(4):  # drain the full 32-bit window
            self._emit()
        return bytes(self.out)


def encode_with_indexes_py(symbols, indexes, cdfs, cdf_lengths, offsets):
    """Same call signature and CDF/escape semantics as
    rans_py.encode_with_indexes_py, FIFO symbol order."""
    symbols = np.asarray(symbols, dtype=np.int64)
    indexes = np.asarray(indexes, dtype=np.int64)
    cdfs = np.asarray(cdfs, dtype=np.int64)
    cdf_lengths = np.asarray(cdf_lengths, dtype=np.int64)
    offsets = np.asarray(offsets, dtype=np.int64)
    enc = _Encoder()
    for i in range(len(symbols)):
        idx = int(indexes[i])
        row = cdfs[idx]
        max_value = int(cdf_lengths[idx]) - 2
        value = int(symbols[i]) - int(offsets[idx])
        if 0 <= value < max_value:
            enc.encode(int(row[value]), int(row[value + 1] - row[value]))
        else:
            enc.encode(int(row[max_value]),
                       int(row[max_value + 1] - row[max_value]))
            z = _zigzag(value - max_value if value >= max_value else value)
            for c in range(BYPASS_CHUNKS):
                enc.encode_bits((z >> (c * BYPASS_BITS)) &
                                ((1 << BYPASS_BITS) - 1), BYPASS_BITS)
    return enc.flush()


class RangeDecoderPy:
    def __init__(self, stream: bytes):
        self.buf = stream
        self.pos = 0
        self.range = _MASK32
        self.code = 0
        for _ in range(4):
            self.code = (self.code << 8) | self._byte()

    def _byte(self):
        b = self.buf[self.pos] if self.pos < len(self.buf) else 0
        self.pos += 1
        return b

    def _renorm(self):
        # invariant code < range, so code < 2^24 here and the shift
        # cannot overflow 32 bits
        while self.range < _TOP:
            self.code = (self.code << 8) | self._byte()
            self.range <<= 8

    def _decode_cdf(self, row, cdf_len):
        self.range >>= PRECISION
        val = self.code // self.range
        if val > (1 << PRECISION) - 1:
            val = (1 << PRECISION) - 1
        lo, hi = 0, cdf_len - 1
        while hi - lo > 1:
            mid = (lo + hi) >> 1
            if row[mid] <= val:
                lo = mid
            else:
                hi = mid
        start = int(row[lo])
        freq = int(row[lo + 1]) - start
        self.code -= start * self.range
        self.range *= freq
        self._renorm()
        return lo

    def _decode_bits(self, nbits):
        self.range >>= nbits
        val = self.code // self.range
        if val > (1 << nbits) - 1:
            val = (1 << nbits) - 1
        self.code -= val * self.range
        self._renorm()
        return val

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
            s = self._decode_cdf(row, cdf_len)
            if s == max_value:
                z = 0
                for c in range(BYPASS_CHUNKS):
                    z |= self._decode_bits(BYPASS_BITS) << (c * BYPASS_BITS)
                raw = _unzigzag(z)
                value = raw + max_value if raw >= 0 else raw
            else:
                value = s
            out[i] = value + int(offsets[idx])
        return out
