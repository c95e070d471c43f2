"""Lane-interleaved 32-bit rANS ("rans32") — the device-decodable format.

Motivation: the v1 codec decodes one rANS stream per image on the host,
forcing one host<->device round trip per wavefront step (the measured
bottleneck: ~25 ms tunnel latency x 222 steps, while the rANS math itself
is ~0.1 s). rans32 restructures the bitstream so the *decoder can run on
the TPU* inside the wavefront scan (engine/device_rans.py):

  * one independent rANS stream per (wavefront lane i, channel group g):
    symbol (step d, lane i, channel m) belongs to stream (i, g = m % G).
    All L = Dmax*G streams decode in lockstep, vectorized on the VPU;
    within a step each stream decodes M/G symbols sequentially.
  * 32-bit state, 16-bit renormalization (halfwords), PRECISION = 16:
    every operation fits uint32 (TPU-native); renorm is a single
    branchless conditional refill (state >= 1 implies one halfword
    restores the invariant L <= x < L<<16).
  * out-of-range symbols use the CompressAI bypass scheme (escape symbol
    = last CDF interval, then 3 chunks of 11 bits, LSB-first), so any
    int32 symbol is codable (entropy_layers_cai.py / rans_py.py parity).

Layout of a coded image (all little-endian):
  uint16 n_lanes
  uint16 hw_len[n_lanes]   -- halfword count of each lane's stream
                              (a lane longer than 65535 halfwords is a
                              format error; raise G instead)
  payload: per lane, hw_len[i] uint16 halfwords; the first two are the
  initial 32-bit decoder state (low halfword first), the rest are renorm
  halfwords in DECODE order.
The per-lane overhead is therefore 2 B length + 4 B flushed state; lane
count (Dmax*G per image) is the knob trading decode parallelism against
this overhead (engine/turbo.py docstring has measured numbers).

This module is the numpy reference implementation (used by tests and as
the host fallback); the C++ twin lives in rans.cpp and the TPU decoder in
engine/device_rans.py — all three are bit-compatible.
"""

import numpy as np

PRECISION = 16
RANS32_L = 1 << 16
BYPASS_BITS = 11
BYPASS_CHUNKS = 3
_M16 = (1 << 16) - 1


def lane_of(pos_in_step: int, channel: int, G: int) -> int:
    """Stream id of symbol (step, pos_in_step, channel)."""
    return pos_in_step * G + (channel % G)


def split_symbols_by_lane(symbols, indexes, valid, M, G):
    """symbols/indexes: (steps, Dmax, M) with valid (steps, Dmax) ->
    per-lane lists in decode order. Lanes are (Dmax * G)."""
    steps, Dmax, M_ = symbols.shape
    assert M_ == M
    lanes = [[] for _ in range(Dmax * G)]
    lane_idx = [[] for _ in range(Dmax * G)]
    for d in range(steps):
        for i in range(Dmax):
            if not valid[d, i]:
                continue
            for m in range(M):
                ln = lane_of(i, m, G)
                lanes[ln].append(int(symbols[d, i, m]))
                lane_idx[ln].append(int(indexes[d, i, m]))
    return lanes, lane_idx


def _encode_lane(symbols, indexes, cdfs, cdf_lengths, offsets):
    """Encode one lane's symbols (decode order) -> list of uint16
    halfwords (decode order, including the 2 initial-state halfwords)."""
    x = RANS32_L
    out = []  # emitted halfwords, reverse order

    def put(start, freq):
        nonlocal x
        x_max = ((RANS32_L >> PRECISION) << 16) * freq  # == freq<<16... keep form
        while x >= x_max:
            out.append(x & _M16)
            x >>= 16
        x = ((x // freq) << PRECISION) + (x % freq) + start

    def put_bits(bits, nbits):
        nonlocal x
        x_max = (RANS32_L >> nbits) << 16
        while x >= x_max:
            out.append(x & _M16)
            x >>= 16
        x = (x << nbits) | (bits & ((1 << nbits) - 1))

    for i in range(len(symbols) - 1, -1, -1):
        idx = int(indexes[i])
        row = cdfs[idx]
        max_value = int(cdf_lengths[idx]) - 2
        value = int(symbols[i]) - int(offsets[idx])
        if 0 <= value < max_value:
            put(int(row[value]), int(row[value + 1] - row[value]))
        else:
            z = value - max_value if value >= max_value else value
            z = (z << 1) ^ (z >> 63) if z < 0 else (z << 1)  # zigzag
            for c in range(BYPASS_CHUNKS - 1, -1, -1):
                put_bits(z >> (c * BYPASS_BITS), BYPASS_BITS)
            put(int(row[max_value]), int(row[max_value + 1] - row[max_value]))
    # final state -> 2 halfwords, low first (decode reads them first)
    hw = [x & _M16, (x >> 16) & _M16]
    hw += list(reversed(out))
    return hw


def encode_interleaved(symbols, indexes, valid, M, G,
                       cdfs, cdf_lengths, offsets) -> bytes:
    """Encode one image's wavefront-ordered symbols into the rans32
    interleaved format. symbols/indexes: (steps, Dmax, M) int32."""
    lanes, lane_idx = split_symbols_by_lane(symbols, indexes, valid, M, G)
    streams = [
        _encode_lane(s, ix, cdfs, cdf_lengths, offsets)
        for s, ix in zip(lanes, lane_idx)
    ]
    n = len(streams)
    lens = [len(s) for s in streams]
    if lens and max(lens) > 0xFFFF:
        raise ValueError(
            f"lane stream {max(lens)} halfwords exceeds the uint16 header "
            f"limit — raise G (more, shorter lanes)")
    head = np.empty(1 + n, dtype=np.uint16)
    head[0] = n
    head[1:] = lens
    payload = np.concatenate(
        [np.asarray(s, dtype=np.uint16) for s in streams]
        or [np.zeros(0, np.uint16)])
    return head.tobytes() + payload.tobytes()


def parse_header(stream: bytes):
    """-> (hw array int32 (concatenated halfwords), lane start offsets
    int32 (n_lanes,))."""
    if len(stream) < 2:
        raise ValueError("rans32 stream truncated (no header)")
    n = int(np.frombuffer(stream[:2], np.uint16)[0])
    if len(stream) < 2 + 2 * n:
        raise ValueError("rans32 stream truncated (header)")
    lens = np.frombuffer(stream[2:2 + 2 * n], np.uint16).astype(np.int64)
    payload = np.frombuffer(stream[2 + 2 * n:], np.uint16)
    if payload.size != lens.sum():
        raise ValueError(
            f"corrupt rans32 stream: payload {payload.size} halfwords, "
            f"header claims {int(lens.sum())}")
    starts = np.zeros(n, dtype=np.int64)
    starts[1:] = np.cumsum(lens)[:-1]
    return payload.astype(np.int32), starts.astype(np.int32)


class Rans32LaneDecoder:
    """Numpy reference decoder over the parsed halfword array: mirrors
    exactly what the TPU kernel does (engine/device_rans.py)."""

    def __init__(self, hw, starts):
        self.hw = hw
        self.pos = starts.astype(np.int64).copy()
        n = len(starts)
        self.x = np.zeros(n, dtype=np.uint64)
        for i in range(n):
            lo = int(hw[self.pos[i]])
            hi = int(hw[self.pos[i] + 1])
            self.x[i] = lo | (hi << 16)
            self.pos[i] += 2

    def _refill(self, i):
        if self.x[i] < RANS32_L:
            self.x[i] = (int(self.x[i]) << 16) | int(self.hw[self.pos[i]])
            self.pos[i] += 1

    def decode_one(self, lane, idx, cdfs, cdf_lengths, offsets):
        i = lane
        row = cdfs[idx]
        cdf_len = int(cdf_lengths[idx])
        max_value = cdf_len - 2
        peek = int(self.x[i]) & _M16
        lo, hi = 0, cdf_len - 1
        while hi - lo > 1:
            mid = (lo + hi) >> 1
            if row[mid] <= peek:
                lo = mid
            else:
                hi = mid
        start = int(row[lo])
        freq = int(row[lo + 1]) - start
        self.x[i] = freq * (int(self.x[i]) >> PRECISION) + peek - start
        self._refill(i)
        if lo == max_value:
            z = 0
            for c in range(BYPASS_CHUNKS):
                bits = int(self.x[i]) & ((1 << BYPASS_BITS) - 1)
                self.x[i] = int(self.x[i]) >> BYPASS_BITS
                self._refill(i)
                z |= bits << (c * BYPASS_BITS)
            raw = (z >> 1) ^ -(z & 1)  # unzigzag
            value = raw + max_value if raw >= 0 else raw
        else:
            value = lo
        return value + int(offsets[idx])

    def decode_step(self, step_indexes, step_valid, M, G,
                    cdfs, cdf_lengths, offsets):
        """Decode one wavefront step: indexes (Dmax, M), valid (Dmax,).
        Returns symbols (Dmax, M) int32."""
        Dmax = step_indexes.shape[0]
        out = np.zeros((Dmax, M), dtype=np.int32)
        for m in range(M):  # channel-major like the device kernel
            for i in range(Dmax):
                if not step_valid[i]:
                    continue
                ln = lane_of(i, m, G)
                out[i, m] = self.decode_one(
                    ln, int(step_indexes[i, m]), cdfs, cdf_lengths,
                    offsets)
        return out
