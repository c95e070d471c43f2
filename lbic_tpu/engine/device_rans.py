"""TPU-side rANS decoder: vectorized over all lane-interleaved streams.

Decodes the rans32 format (coding/rans32.py) entirely on device with pure
vector ops — gathers, shifts, selects — so the whole image decode runs as
ONE jitted wavefront scan with zero host round trips (the v1 codec paid
one ~25 ms host sync per wavefront step; see engine/turbo.py).

State per stream (lane): x (uint32 as int32 bit pattern via uint32 ops on
int32? -> we use uint32 arrays), pos (int32 halfword index). Per symbol:
  peek = x & 0xFFFF
  s    = binary-search(cdf[idx], peek)      -- fixed-trip-count loop
  x    = freq * (x >> 16) + peek - start
  refill once if x < 2^16 (branchless select)
  bypass path (s == max_value): 3 chunks of 11 bits, masked for the
  lanes that need it (vector code always executes, selects keep others).

All tables are int32; the CDF table is (64, maxlen+2) and jnp.take
gathers rows per (lane, iteration). Shapes are static; `valid` lanes are
masked so consumption only happens where the schedule has a block.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lbic_tpu.coding.rans32 import (
    BYPASS_BITS,
    BYPASS_CHUNKS,
    PRECISION,
    RANS32_L,
)

_M16 = (1 << 16) - 1


def init_lane_state(hw, starts):
    """hw: (T,) int32 halfwords; starts: (L,) int32. Returns (x, pos)."""
    hw = jnp.asarray(hw, jnp.uint32)
    starts = jnp.asarray(starts, jnp.int32)
    lo = hw[starts]
    hi = hw[starts + 1]
    x = lo | (hi << 16)
    return x, starts + 2


def _refill(hw, x, pos, active):
    """One branchless conditional refill of lanes with x < L."""
    need = (x < RANS32_L) & active
    nxt = hw[jnp.clip(pos, 0, hw.shape[0] - 1)]
    x = jnp.where(need, (x << 16) | nxt, x)
    pos = jnp.where(need, pos + 1, pos)
    return x, pos


def build_peek_lut(cdf, cdf_lengths):
    """(rows, 2^16) int16 LUT: peek value -> symbol interval, replacing the
    per-symbol binary search (14 -> 4 gathers/symbol on TPU). ~8 MB for the
    64-scale Gaussian tables; built once per codec."""
    cdf = np.asarray(cdf)
    cdf_lengths = np.asarray(cdf_lengths)
    rows, _ = cdf.shape
    lut = np.zeros((rows, 1 << PRECISION), dtype=np.int16)
    peeks = np.arange(1 << PRECISION)
    for r in range(rows):
        n = int(cdf_lengths[r])
        lut[r] = np.searchsorted(cdf[r, :n], peeks, side="right") - 1
        np.clip(lut[r], 0, n - 2, out=lut[r])
    return lut


def build_fused_luts(cdf, cdf_lengths, offsets):
    """Two peek-indexed tables that fold EVERY per-symbol table lookup of
    the decoder into two gathers (measured driver: each gather HLO in the
    wavefront scan costs ~50 us latency regardless of table size — LUT
    beats 12-gather binary search 2.2x — so the win is gather COUNT):

      quad_lut (rows * 2^16, 4) uint32: per (row, peek), ALL the data the
        hot path needs, fetched with ONE 16-byte contiguous slice-gather
        (measured on v5e: a 16B slice costs no more than a 4B element
        gather — the cost is per random touch, not per byte):
          word 0: symbol value + 2^15 (biased; bit 31 set marks the
                  escape interval / bypass-coded symbols)
          word 1: (start << 16) | freq of the interval containing peek
          word 2: (max_value << 16) | (offset + 2^15) — the per-row
                  constants the bypass path needs
          word 3: padding (alignment)
    """
    cdf = np.asarray(cdf)
    cdf_lengths = np.asarray(cdf_lengths)
    offsets = np.asarray(offsets)
    rows = cdf.shape[0]
    quad_lut = np.zeros((rows << PRECISION, 4), np.uint32)
    peeks = np.arange(1 << PRECISION)
    for r in range(rows):
        n = int(cdf_lengths[r])
        s = np.searchsorted(cdf[r, :n], peeks, side="right") - 1
        np.clip(s, 0, n - 2, out=s)
        max_value = n - 2
        off = int(offsets[r])
        sym = np.where(s == max_value, np.uint32(1 << 31),
                       (s + off + (1 << 15)).astype(np.uint32))
        start = cdf[r, s].astype(np.uint32)
        freq = cdf[r, s + 1].astype(np.uint32) - start
        base = r << PRECISION
        quad_lut[base:base + (1 << PRECISION), 0] = sym
        quad_lut[base:base + (1 << PRECISION), 1] = (start << 16) | freq
        quad_lut[base:base + (1 << PRECISION), 2] = np.uint32(
            (max_value << 16) | (off + (1 << 15)))
    return quad_lut


def _slice_gather(tbl, idx, width):
    """One contiguous slice-gather: tbl (T, width) or (T,), idx (...,) ->
    (..., width). A single random memory touch per lane (measured: a 16B
    slice costs no more than one 4B element gather)."""
    if tbl.ndim == 2:
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(idx.ndim,), collapsed_slice_dims=(0,),
            start_index_map=(0,))
        return jax.lax.gather(tbl, idx[..., None], dn, (1, width),
                              mode=jax.lax.GatherScatterMode.CLIP)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(idx.ndim,), collapsed_slice_dims=(),
        start_index_map=(0,))
    return jax.lax.gather(tbl, idx[..., None], dn, (width,),
                          mode=jax.lax.GatherScatterMode.CLIP)


def decode_symbols_fused(hw_words, x, pos, indexes, active, quad_lut,
                         cheap=None):
    """Decode ONE symbol per lane with 2 random memory touches (vs ~9
    gathers in decode_symbols): one 16B quad_lut slice (symbol +
    start|freq + bypass constants) and one 12B slice of the word-packed
    bitstream covering the main renorm refill AND up to 3 bypass-chunk
    refills. Bit-identical to decode_symbols (tested).

    hw_words: (T/2,) uint32 — halfword pairs, little-endian
    (pack_halfwords); pos stays halfword-granular.
    cheap: optional traced bool — when True (the encoder's pass through
    the unified program, where decoded symbols are discarded) all gather
    indices are clamped to 0. Measured neutral on v5e (touch cost is
    per-element issue, not memory locality) but kept: it guarantees the
    dead branch never reads out of bounds and may help other targets."""
    peek32 = x & _M16
    peek = peek32.astype(jnp.int32)
    flat_i = (indexes << PRECISION) + peek
    if cheap is not None:
        flat_i = jnp.where(cheap, 0, flat_i)
    quad = _slice_gather(quad_lut, flat_i, 4)                    # touch 1
    symw = quad[..., 0]
    sf = quad[..., 1]
    mo = quad[..., 2].astype(jnp.int32)
    sym = (symw & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32) - (1 << 15)
    start = sf >> 16
    freq = sf & jnp.uint32(0xFFFF)
    # prefetch the at-most-4 halfwords this symbol can consume: 3 packed
    # words starting at the word containing pos                 # touch 2
    TW = hw_words.shape[0]
    base = jnp.clip(pos >> 1, 0, TW - 3)
    if cheap is not None:
        base = jnp.where(cheap, 0, base)
    w3 = _slice_gather(hw_words, base, 3)                 # (..., 3)
    # halfword j (absolute index 2*base + j, j in [0, 5]); pos - 2*base
    # is 0 or 1 normally, larger only in the clipped padding region
    j = pos - (base << 1)

    def refill(x, pos, j, need):
        w = jnp.where(j < 2, w3[..., 0],
                      jnp.where(j < 4, w3[..., 1], w3[..., 2]))
        nxt = jnp.where((j & 1) == 0, w & jnp.uint32(0xFFFF), w >> 16)
        x = jnp.where(need, (x << 16) | nxt, x)
        pos = jnp.where(need, pos + 1, pos)
        j = jnp.where(need, j + 1, j)
        return x, pos, j

    x_new = freq * (x >> PRECISION) + peek32 - start
    x = jnp.where(active, x_new, x)
    x, pos, j = refill(x, pos, j, (x < RANS32_L) & active)

    is_bypass = active & ((symw >> 31) != 0)
    max_value = mo >> 16
    offset = (mo & 0xFFFF) - (1 << 15)
    z = jnp.zeros_like(peek, jnp.uint32)
    for c in range(BYPASS_CHUNKS):
        bits = x & ((1 << BYPASS_BITS) - 1)
        x = jnp.where(is_bypass, x >> BYPASS_BITS, x)
        x, pos, j = refill(x, pos, j, (x < RANS32_L) & is_bypass)
        z = z | jnp.where(is_bypass, bits << (c * BYPASS_BITS),
                          jnp.uint32(0))
    zi = z.astype(jnp.int32)
    raw = (zi >> 1) ^ -(zi & 1)  # unzigzag
    value = jnp.where(raw >= 0, raw + max_value, raw)
    symbols = jnp.where(is_bypass, value + offset, sym)
    symbols = jnp.where(active, symbols, 0)
    return symbols, x, pos


def decode_symbols(hw, x, pos, indexes, active, cdf, cdf_lengths, offsets,
                   search_iters=None, lut=None):
    """Decode ONE symbol per lane (vectorized).

    hw: (T,) uint32 halfword array (whole payload)
    x, pos: (...,) lane states
    indexes: (...,) int32 cdf-row per lane
    active: (...,) bool — lanes that actually consume
    cdf: (64, W) int32, cdf_lengths: (64,), offsets: (64,)
    lut: optional (64, 2^16) peek->symbol table (build_peek_lut); without
    it a fixed-trip binary search is used.

    Returns (symbols int32, x', pos')."""
    cdf = jnp.asarray(cdf, jnp.int32)
    W = cdf.shape[1]
    if search_iters is None:
        search_iters = int(np.ceil(np.log2(W)))
    idx = indexes
    cdf_len = cdf_lengths[idx]
    max_value = cdf_len - 2
    peek = (x & _M16).astype(jnp.int32)

    row_base = idx * W
    flat = cdf.reshape(-1)

    if lut is not None:
        s = lut.reshape(-1)[(idx << PRECISION) + peek].astype(jnp.int32)
    else:
        # binary search: find lo with cdf[idx, lo] <= peek < cdf[idx, lo+1]
        def search_body(_, lohi):
            lo, hi = lohi
            mid = (lo + hi) >> 1
            v = flat[row_base + mid]
            go = v <= peek
            lo = jnp.where(go & (hi - lo > 1), mid, lo)
            hi = jnp.where((~go) & (hi - lo > 1), mid, hi)
            return lo, hi

        lo, _ = jax.lax.fori_loop(
            0, search_iters, search_body,
            (jnp.zeros_like(idx), cdf_len - 1))
        s = lo
    start = flat[row_base + s].astype(jnp.uint32)
    freq = (flat[row_base + s + 1]).astype(jnp.uint32) - start

    x_new = freq * (x >> PRECISION) + peek.astype(jnp.uint32) - start
    x = jnp.where(active, x_new, x)
    x, pos = _refill(hw, x, pos, active)

    # bypass path (s == max_value), masked
    is_bypass = active & (s == max_value)
    z = jnp.zeros_like(idx, jnp.uint32)
    for c in range(BYPASS_CHUNKS):
        bits = x & ((1 << BYPASS_BITS) - 1)
        x = jnp.where(is_bypass, x >> BYPASS_BITS, x)
        x, pos = _refill(hw, x, pos, is_bypass)
        z = z | jnp.where(is_bypass, bits << (c * BYPASS_BITS),
                          jnp.uint32(0))
    zi = z.astype(jnp.int32)
    raw = (zi >> 1) ^ -(zi & 1)  # unzigzag
    bypass_value = jnp.where(raw >= 0, raw + max_value, raw)

    value = jnp.where(s == max_value, bypass_value, s)
    symbols = value + offsets[idx]
    symbols = jnp.where(active, symbols, 0)
    return symbols, x, pos


# ------------------------------- encoder -------------------------------
#
# rANS encode runs in REVERSE symbol order, one independent stream per
# (lane, channel-group) — the exact mirror of the decoder above. With a
# uint32 state and 16-bit renormalisation every `put` emits AT MOST ONE
# halfword (x < 2^32 and x_max = freq<<16 >= 2^16, so a single x >>= 16
# restores x < x_max), so the encoder is a branchless vector program over
# all N*Dmax*G lanes. Bit-identical to coding/rans32._encode_lane /
# rans.cpp (tested); the only divergence is zigzag overflow for
# |value| >= 2^30, far outside the 33-bit bypass range either
# implementation can round-trip.
#
# TPU-critical design point: the emission side is scatter-free. A first
# draft appended halfwords into per-lane buffers with dynamic-index
# .at[].set — ~10k tiny scatters per image, measured SLOWER than shipping
# the raw symbols to a host encoder. Instead:
#   phase A (encode_emissions): a lax.scan stacks each step's <=4
#     potential emissions densely as (T, NL, 4) value/flag planes —
#     pure sequential HBM writes;
#   phase B (gather_payload): each *output* halfword finds its source
#     emission by binary search over per-lane emission-count prefix sums
#     — work proportional to the (tiny) bitstream, all gathers.


def build_encode_luts(cdf, cdf_lengths, offsets):
    """Touch-count reduction for the encoder (same driver as
    build_fused_luts). mo must be fetched BEFORE s is known (s depends on
    max_value), so the encoder floor is 2 touches per symbol slot:
      sf_rows (rows, W-1) uint32: (start << 16) | freq per interval s;
      mo_lut  (rows,) int32: (max_value << 16) | (offset + 2^15).
    """
    cdf = np.asarray(cdf)
    cdf_lengths = np.asarray(cdf_lengths)
    offsets = np.asarray(offsets)
    rows, W = cdf.shape
    start = cdf[:, : W - 1].astype(np.uint32)
    freq = cdf[:, 1:].astype(np.uint32) - start
    # freq < 2^16 within every row's valid length (>= 2 intervals per row);
    # padded tail regions are never addressed (s <= max_value)
    for r in range(rows):
        n = int(cdf_lengths[r])
        assert freq[r, : n - 1].max() < (1 << 16)
    sf_rows = (start << 16) | (freq & 0xFFFF)
    mo_lut = (((cdf_lengths - 2) << 16)
              | ((offsets + (1 << 15)) & 0xFFFF)).astype(np.int32)
    return sf_rows, mo_lut


def encode_emissions(symbols, indexes, valid, G, cdf, cdf_lengths,
                     offsets, unroll: int = 1, enc_luts=None):
    """Phase A: run the reverse-order rANS automaton for all lanes.

    symbols/indexes: (steps, N, Dmax, M) int32 — raw wavefront-scan
    outputs; valid: (steps, Dmax) bool schedule mask.

    Returns (vals, flags, x):
      vals : (T, NL, 4) uint16 — halfword of each potential emission
             (T = steps*M/G reverse-order symbol slots, NL = N*Dmax*G
             lanes, 4 = chronological emission slots per symbol:
             bypass chunks c=2,1,0 then the main interval);
      flags: (T, NL, 4) bool — which slots actually emitted;
      x    : (N, Dmax, G) uint32 — final lane states.
    Decode-order stream of lane l = [x_lo, x_hi] + reversed(chronological
    emissions of l).

    unroll: symbol slots per lax.scan iteration. Measured on v5e at the
    flagship shape: no effect (0.59 s at unroll 1/4/8/16 for 2664 slots x
    6144 lanes) — the cost is the sequential automaton itself, not scan
    overhead. Kept because other shapes may differ."""
    steps, N, Dmax, M = symbols.shape
    K = M // G
    assert K * G == M, (M, G)
    T = steps * K
    while T % unroll:
        unroll //= 2
    cdf = jnp.asarray(cdf, jnp.int32)
    W = cdf.shape[1]
    flat = cdf.reshape(-1)
    cdf_lengths = jnp.asarray(cdf_lengths, jnp.int32)
    offsets = jnp.asarray(offsets, jnp.int32)
    # lane layout (N, Dmax, G); within a lane, channels k = m // G are
    # sequential (decode order: d asc, k asc) -> encode order reversed.
    sym_r = jnp.moveaxis(symbols.reshape(steps, N, Dmax, K, G), 3, 1)
    sym_r = sym_r.reshape(T, N, Dmax, G)[::-1]
    idx_r = jnp.moveaxis(
        indexes.reshape(steps, N, Dmax, K, G),
        3, 1).reshape(T, N, Dmax, G)[::-1]
    # step of reverse slot t is (T-1-t) // K
    dsteps = (jnp.arange(T, dtype=jnp.int32)[::-1]) // K
    valid = jnp.asarray(valid)
    x0 = jnp.full((N, Dmax, G), RANS32_L, jnp.uint32)
    bypass_xmax = jnp.uint32((RANS32_L >> BYPASS_BITS) << 16)
    NL = N * Dmax * G
    if enc_luts is not None:
        sf_rows, mo_lut = enc_luts
        sf_flat = sf_rows.reshape(-1)
        Wsf = sf_rows.shape[1]
        rows = mo_lut.shape[0]
        # per-row constants as an exact one-hot MXU matmul instead of a
        # gather: both columns < 2^24 so the f32 dot (one nonzero per
        # row, no accumulation) is exact; removes one random memory
        # touch per symbol slot from the sequential automaton
        mv_off = jnp.stack(
            [(mo_lut >> 16).astype(jnp.float32),
             ((mo_lut & 0xFFFF) - (1 << 15)).astype(jnp.float32)],
            axis=1)                                   # (rows, 2)

    def one_slot(x, sym, idx, d):
        active = jnp.broadcast_to(valid[d][None, :, None], (N, Dmax, G))
        if enc_luts is not None:
            onehot = (idx[..., None] ==
                      jnp.arange(rows, dtype=idx.dtype)).astype(jnp.float32)
            # HIGHEST precision: default TPU matmul truncates operands to
            # bf16, which rounds integer values > 256 (max_value reaches
            # ~3131) and would silently corrupt the bitstream
            mo2 = jnp.einsum("...r,rc->...c", onehot, mv_off,
                             precision=jax.lax.Precision.HIGHEST)
            max_value = mo2[..., 0].astype(jnp.int32)
            value = sym - mo2[..., 1].astype(jnp.int32)
        else:
            max_value = cdf_lengths[idx] - 2
            value = sym - offsets[idx]
        in_range = (value >= 0) & (value < max_value)
        emit_v, emit_f = [], []

        def emit(x, need):
            emit_v.append((x & _M16).astype(jnp.uint16))
            emit_f.append(need)
            return jnp.where(need, x >> 16, x)

        # bypass chunks (escape symbols), emitted before the escape
        # interval because encode order is the reverse of decode order
        ab = active & ~in_range
        z = jnp.where(value >= max_value, value - max_value, value)
        zz = ((z << 1) ^ (z >> 31)).astype(jnp.uint32)
        for c in range(BYPASS_CHUNKS - 1, -1, -1):
            bits = (zz >> (c * BYPASS_BITS)) & jnp.uint32(
                (1 << BYPASS_BITS) - 1)
            x = emit(x, ab & (x >= bypass_xmax))
            x = jnp.where(ab, (x << BYPASS_BITS) | bits, x)
        # main interval (escape row for bypass symbols)
        s = jnp.where(in_range, value, max_value)
        if enc_luts is not None:
            sf = sf_flat[idx * Wsf + s]
            start = sf >> 16
            freq = sf & jnp.uint32(0xFFFF)
        else:
            row_base = idx * W
            start = flat[row_base + s].astype(jnp.uint32)
            freq = flat[row_base + s + 1].astype(jnp.uint32) - start
        x = emit(x, active & (x >= (freq << PRECISION)))
        q = x // jnp.maximum(freq, jnp.uint32(1))
        x = jnp.where(active, (q << PRECISION) + (x - q * freq) + start, x)
        return x, (jnp.stack(emit_v, -1).reshape(NL, 4),
                   jnp.stack(emit_f, -1).reshape(NL, 4))

    def body(x, inp):
        sym_u, idx_u, d_u = inp        # (unroll, N, Dmax, G) / (unroll,)
        vs, fs = [], []
        for u in range(unroll):
            x, (v, f) = one_slot(x, sym_u[u], idx_u[u], d_u[u])
            vs.append(v)
            fs.append(f)
        return x, (jnp.stack(vs), jnp.stack(fs))

    x, (vals, flags) = jax.lax.scan(
        body, x0,
        (sym_r.reshape(T // unroll, unroll, N, Dmax, G),
         idx_r.reshape(T // unroll, unroll, N, Dmax, G),
         dsteps.reshape(T // unroll, unroll)))
    return vals.reshape(T, NL, 4), flags.reshape(T, NL, 4), x


def lane_lengths(flags, N):
    """(T, NL, 4) emission flags -> per-lane stream lengths incl. the two
    state halfwords: (N, LZ) int32, plus the inclusive per-slot prefix
    sums (T, NL) int32 reused by gather_payload."""
    cnt = jnp.sum(flags, axis=2, dtype=jnp.int32)     # (T, NL)
    csum = jnp.cumsum(cnt, axis=0)                     # inclusive
    lens = (csum[-1] + 2).reshape(N, -1)
    return lens, csum


def gather_payload(vals, flags, csum, x, W_hw):
    """Phase B: materialise each image's contiguous decode-order payload
    by GATHERS (one binary search per output halfword — no scatter).

    vals/flags: from encode_emissions; csum: from lane_lengths;
    x: (N, Dmax, G) final states; W_hw: even output halfword capacity
    (>= max per-image total; caller buckets it from lane_lengths).

    Returns (lens (N, LZ) int32, packed (N, W_hw//2) uint32 halfword
    pairs, little-endian within the uint32)."""
    T, NL, _ = vals.shape
    N, Dmax, G = x.shape
    LZ = Dmax * G
    assert N * LZ == NL, (N, LZ, NL)
    x2 = x.reshape(N, LZ)
    tot = csum[-1].reshape(N, LZ)                      # emissions per lane
    lens = tot + 2
    off = jnp.cumsum(lens, axis=1) - lens              # exclusive, (N, LZ)
    j = jnp.broadcast_to(jnp.arange(W_hw, dtype=jnp.int32)[None], (N, W_hw))
    nidx = jnp.arange(N, dtype=jnp.int32)[:, None]

    # lane of output position j: largest l with off[n, l] <= j
    lo = jnp.zeros_like(j)
    hi = jnp.full_like(j, LZ)
    for _ in range(max(1, int(np.ceil(np.log2(max(LZ, 2)))))):
        mid = (lo + hi) >> 1
        v = off[nidx, mid]
        go = v <= j
        big = hi - lo > 1
        lo = jnp.where(go & big, mid, lo)
        hi = jnp.where(~go & big, mid, hi)
    lane = lo                                          # (N, W_hw)
    k = j - off[nidx, lane]                            # position in stream
    gl = nidx * LZ + lane                              # global lane id
    # chronological emission index for payload position k >= 2
    chrono = tot[nidx, lane] - 1 - (k - 2)
    chrono = jnp.maximum(chrono, 0)
    # first t with csum[t, lane] > chrono  (upper bound over T)
    lo = jnp.zeros_like(j)
    hi = jnp.full_like(j, T)
    csum_flat = csum.reshape(-1)
    for _ in range(max(1, int(np.ceil(np.log2(T + 1))))):
        big = lo < hi
        mid = (lo + hi) >> 1
        v = csum_flat[jnp.minimum(mid, T - 1) * NL + gl]
        go = v <= chrono
        lo = jnp.where(big & go, mid + 1, lo)
        hi = jnp.where(big & ~go, mid, hi)
    t = jnp.minimum(lo, T - 1)
    base = jnp.where(t > 0, csum_flat[jnp.maximum(t - 1, 0) * NL + gl], 0)
    r = chrono - base                                  # rank within slot-4
    fbase = (t * NL + gl) * 4
    flags_flat = flags.reshape(-1)
    f0 = flags_flat[fbase]
    f1 = flags_flat[fbase + 1]
    f2 = flags_flat[fbase + 2]
    p1 = f0.astype(jnp.int32)
    p2 = p1 + f1.astype(jnp.int32)
    p3 = p2 + f2.astype(jnp.int32)
    slot = jnp.where(f0 & (r == 0), 0,
                     jnp.where(f1 & (p1 == r), 1,
                               jnp.where(f2 & (p2 == r), 2, 3)))
    val = vals.reshape(-1)[fbase + slot].astype(jnp.uint32)
    val = jnp.where(k == 0, x2[nidx, lane] & _M16, val)
    val = jnp.where(k == 1, x2[nidx, lane] >> 16, val)
    totals = off[:, -1:] + lens[:, -1:]
    val = jnp.where(j < totals, val, jnp.uint32(0))
    packed = val[:, 0::2] | (val[:, 1::2] << 16)
    return lens, packed


def decode_block_channels_merged(hw, x, pos, indexes, valid, G, KS,
                                 fused, cheap=None, hw_words=None):
    """Slot-merged variant of decode_block_channels: KS schedule slots
    share one lane (lane j serves slots j*KS .. j*KS+KS-1), cutting the
    per-image stream count — and its ~6 B/stream header+state overhead —
    by KS, at the cost of KS x more sequential decode iterations per
    wavefront step. Decode order within a step is (ks asc, k asc): the
    exact image of the v2 lane mapping on the (steps*KS, LS) reshaped
    schedule, so every encoder (host C++/numpy, device phase A/B) reuses
    the v2 format via that reshape (TurboCodec._merge_*). Uses the fused
    2-touch path only (the production decoder).

    indexes: (N, Dmax_p, M) with Dmax_p = LS*KS; valid: (Dmax_p,) bool;
    x, pos: (N, LS, G). Returns (symbols (N, Dmax_p, M), x', pos')."""
    N, Dmax_p, M = indexes.shape
    K = M // G
    assert K * G == M, (M, G)
    LS = Dmax_p // KS
    assert LS * KS == Dmax_p, (Dmax_p, KS)
    if hw_words is None:
        hw_words = pack_halfwords(hw)
    # iteration t = ks*K + k decodes channel k*G+g of slot j*KS+ks on
    # lane (j, g)
    idx_r = jnp.reshape(indexes, (N, LS, KS, K, G))
    idx_r = jnp.transpose(idx_r, (2, 3, 0, 1, 4)).reshape(KS * K, N, LS, G)
    act_r = jnp.broadcast_to(
        jnp.transpose(valid.reshape(LS, KS))[:, None, :, None],
        (KS, N, LS, G))

    def body_f(t, carry):
        x, pos, out = carry
        sym, x, pos = decode_symbols_fused(
            hw_words, x, pos, idx_r[t], act_r[t // K], fused, cheap=cheap)
        return x, pos, out.at[t].set(sym)

    out0 = jnp.zeros((KS * K, N, LS, G), jnp.int32)
    x, pos, out = jax.lax.fori_loop(0, KS * K, body_f, (x, pos, out0))
    symbols = jnp.transpose(
        out.reshape(KS, K, N, LS, G), (2, 3, 0, 1, 4)).reshape(
            N, Dmax_p, M)
    return symbols, x, pos


def pack_halfwords(hw):
    """(T,) uint32 halfwords -> (ceil(T/2),) uint32 word-packed stream for
    the fused decoder's 3-word refill slices; odd T is zero-padded."""
    if hw.shape[0] & 1:
        hw = jnp.concatenate([hw, jnp.zeros((1,), hw.dtype)])
    return hw[0::2] | (hw[1::2] << 16)


def decode_block_channels(hw, x, pos, indexes, valid, G, cdf, cdf_lengths,
                          offsets, lut=None, unroll=False, fused=None,
                          cheap=None, hw_words=None):
    """Decode one wavefront step for all (batch, lane, channel group)
    streams.

    x, pos: (N, Dmax, G) lane states
    indexes: (N, Dmax, M) int32 — cdf rows for this step's blocks
    valid: (Dmax,) bool — schedule mask
    unroll: statically unroll the K = M/G inner symbol loop instead of a
    fori_loop (measured on v5e: the fori_loop is FASTER inside the
    wavefront scan — unrolling blows up the scan body's HLO and loses
    ~70% throughput; kept as an option for other shapes).
    fused: optional quad_lut from build_fused_luts — uses the 2-touch
    decode_symbols_fused path (fastest on v5e); requires hw_words
    (pack_halfwords(hw), computed ONCE outside any scan). cheap: traced
    bool forwarded to it (see decode_symbols_fused).
    Returns (symbols (N, Dmax, M) int32, x', pos')."""
    N, Dmax, M = indexes.shape
    K = M // G
    assert K * G == M, (M, G)
    # channel m = k*G + g decodes at inner iteration k on stream (i, g)
    idx_r = jnp.moveaxis(indexes.reshape(N, Dmax, K, G), 2, 0)  # (K,N,D,G)
    act = jnp.broadcast_to(valid[None, :, None], (N, Dmax, G))
    if fused is not None:
        quad_lut = fused
        if hw_words is None:
            hw_words = pack_halfwords(hw)

        def body_f(k, carry):
            x, pos, out = carry
            sym, x, pos = decode_symbols_fused(
                hw_words, x, pos, idx_r[k], act, quad_lut, cheap=cheap)
            return x, pos, out.at[k].set(sym)

        out0 = jnp.zeros((K, N, Dmax, G), jnp.int32)
        x, pos, out = jax.lax.fori_loop(0, K, body_f, (x, pos, out0))
        symbols = jnp.moveaxis(out, 0, 2).reshape(N, Dmax, M)
        return symbols, x, pos
    if unroll:
        out = []
        for k in range(K):
            sym, x, pos = decode_symbols(
                hw, x, pos, idx_r[k], act, cdf, cdf_lengths, offsets,
                lut=lut)
            out.append(sym)
        symbols = jnp.stack(out, axis=2).reshape(N, Dmax, M)
        return symbols, x, pos

    def body(k, carry):
        x, pos, out = carry
        sym, x, pos = decode_symbols(
            hw, x, pos, idx_r[k], act, cdf, cdf_lengths, offsets, lut=lut)
        return x, pos, out.at[k].set(sym)

    out0 = jnp.zeros((K, N, Dmax, G), jnp.int32)
    x, pos, out = jax.lax.fori_loop(0, K, body, (x, pos, out0))
    symbols = jnp.moveaxis(out, 0, 2).reshape(N, Dmax, M)
    return symbols, x, pos
