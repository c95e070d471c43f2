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


def decode_block_channels(hw, x, pos, indexes, valid, G, cdf, cdf_lengths,
                          offsets, lut=None):
    """Decode one wavefront step for all (batch, lane, channel group)
    streams.

    x, pos: (N, Dmax, G) lane states
    indexes: (N, Dmax, M) int32 — cdf rows for this step's blocks
    valid: (Dmax,) bool — schedule mask
    Returns (symbols (N, Dmax, M) int32, x', pos')."""
    N, Dmax, M = indexes.shape
    K = M // G
    assert K * G == M, (M, G)
    # channel m = k*G + g decodes at inner iteration k on stream (i, g)
    idx_r = jnp.moveaxis(indexes.reshape(N, Dmax, K, G), 2, 0)  # (K,N,D,G)
    act = jnp.broadcast_to(valid[None, :, None], (N, Dmax, G))

    def body(k, carry):
        x, pos, out = carry
        sym, x, pos = decode_symbols(
            hw, x, pos, idx_r[k], act, cdf, cdf_lengths, offsets, lut=lut)
        return x, pos, out.at[k].set(sym)

    out0 = jnp.zeros((K, N, Dmax, G), jnp.int32)
    x, pos, out = jax.lax.fori_loop(0, K, body, (x, pos, out0))
    symbols = jnp.moveaxis(out, 0, 2).reshape(N, Dmax, M)
    return symbols, x, pos
