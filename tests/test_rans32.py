"""rans32 lane-interleaved format: numpy round trip + device (JAX) decoder
parity with the numpy reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from lbic_tpu.coding import rans32
from lbic_tpu.engine import device_rans
from lbic_tpu.ops import entropy as ent


@pytest.fixture(scope="module")
def tables():
    st = np.asarray(ent.get_scale_table())
    return ent.build_gaussian_cdfs(st)


def make_symbols(rng, steps, Dmax, M, n_levels=64, spread=3.0):
    symbols = rng.normal(0, spread, (steps, Dmax, M)).round().astype(np.int32)
    # sprinkle extreme values to exercise the bypass path
    mask = rng.random((steps, Dmax, M)) < 0.01
    symbols[mask] = rng.integers(-5000, 5000, mask.sum())
    indexes = rng.integers(0, n_levels, (steps, Dmax, M)).astype(np.int32)
    valid = rng.random((steps, Dmax)) < 0.8
    valid[0, 0] = True
    return symbols, indexes, valid


def test_numpy_roundtrip(tables, rng):
    steps, Dmax, M, G = 7, 5, 8, 4
    symbols, indexes, valid = make_symbols(rng, steps, Dmax, M)
    t = tables
    stream = rans32.encode_interleaved(
        symbols, indexes, valid, M, G,
        t["cdf"], t["cdf_lengths"], t["offsets"])
    hw, starts = rans32.parse_header(stream)
    dec = rans32.Rans32LaneDecoder(hw, starts)
    for d in range(steps):
        out = dec.decode_step(indexes[d], valid[d], M, G,
                              t["cdf"], t["cdf_lengths"], t["offsets"])
        expect = np.where(valid[d][:, None], symbols[d], 0)
        np.testing.assert_array_equal(out, expect, err_msg=f"step {d}")


def test_device_decoder_matches_numpy(tables, rng):
    steps, Dmax, M, G = 6, 4, 8, 4
    N = 2
    t = tables
    all_syms, all_idx, all_valid, streams = [], [], [], []
    for n in range(N):
        s, ix, v = make_symbols(rng, steps, Dmax, M)
        all_syms.append(s)
        all_idx.append(ix)
        all_valid.append(v)
        streams.append(rans32.encode_interleaved(
            s, ix, v, M, G, t["cdf"], t["cdf_lengths"], t["offsets"]))
    # valid masks must be the schedule's (shared across batch)
    valid = all_valid[0]
    for n in range(N):
        all_valid[n] = valid
        streams[n] = rans32.encode_interleaved(
            all_syms[n], all_idx[n], valid, M, G,
            t["cdf"], t["cdf_lengths"], t["offsets"])

    # build batched device state: concatenate halfword arrays
    hws, starts = [], []
    off = 0
    for sbytes in streams:
        h, st = rans32.parse_header(sbytes)
        hws.append(h)
        starts.append(st + off)
        off += len(h)
    hw = jnp.asarray(np.concatenate(hws).astype(np.uint32))
    starts = np.stack(starts).reshape(N, Dmax, G)
    x, pos = device_rans.init_lane_state(hw, starts)

    cdf = jnp.asarray(t["cdf"])
    cl = jnp.asarray(t["cdf_lengths"])
    offs = jnp.asarray(t["offsets"])
    for d in range(steps):
        idx = jnp.asarray(np.stack([all_idx[n][d] for n in range(N)]))
        sym, x, pos = device_rans.decode_block_channels(
            hw, x, pos, idx, jnp.asarray(valid[d]), G, cdf, cl, offs)
        for n in range(N):
            expect = np.where(valid[d][:, None], all_syms[n][d], 0)
            np.testing.assert_array_equal(
                np.asarray(sym[n]), expect, err_msg=f"step {d} img {n}")


def test_empty_lane_ok(tables):
    t = tables
    symbols = np.zeros((1, 2, 4), np.int32)
    indexes = np.zeros((1, 2, 4), np.int32)
    valid = np.array([[True, False]])  # lane 1 never used
    stream = rans32.encode_interleaved(
        symbols, indexes, valid, 4, 2,
        t["cdf"], t["cdf_lengths"], t["offsets"])
    hw, starts = rans32.parse_header(stream)
    dec = rans32.Rans32LaneDecoder(hw, starts)
    out = dec.decode_step(indexes[0], valid[0], 4, 2,
                          t["cdf"], t["cdf_lengths"], t["offsets"])
    np.testing.assert_array_equal(out, symbols[0])


def test_cpp_encoder_matches_numpy(tables, rng):
    from lbic_tpu.coding import api

    if api.backend_name() != "cpp":
        pytest.skip("no C++ backend")
    t = tables
    steps, Dmax, M, G = 9, 6, 8, 4
    symbols, indexes, valid = make_symbols(rng, steps, Dmax, M)
    s_np = rans32.encode_interleaved(
        symbols, indexes, valid, M, G,
        t["cdf"], t["cdf_lengths"], t["offsets"])
    s_cpp = api.encode_interleaved(
        symbols, indexes, valid, M, G,
        t["cdf"], t["cdf_lengths"], t["offsets"])
    assert s_np == s_cpp


def test_device_encoder_matches_numpy(tables, rng):
    """encode_lanes + assemble_streams produce byte-identical rans32
    streams to the numpy reference encoder (and hence to rans.cpp)."""
    t = tables
    steps, Dmax, M, G, N = 7, 5, 8, 4, 3
    K = M // G
    valid = rng.random((steps, Dmax)) < 0.8
    valid[0, 0] = True
    syms = rng.normal(0, 3.0, (N, steps, Dmax, M)).round().astype(np.int32)
    mask = rng.random(syms.shape) < 0.02
    syms[mask] = rng.integers(-5000, 5000, mask.sum())
    idxs = rng.integers(0, 64, syms.shape).astype(np.int32)
    ref = [rans32.encode_interleaved(
        syms[i], idxs[i], valid, M, G,
        t["cdf"], t["cdf_lengths"], t["offsets"]) for i in range(N)]

    sy = jnp.asarray(np.moveaxis(syms, 0, 1))  # (steps, N, Dmax, M)
    ix = jnp.asarray(np.moveaxis(idxs, 0, 1))
    vals, flags, x = device_rans.encode_emissions(
        sy, ix, jnp.asarray(valid), G,
        t["cdf"], t["cdf_lengths"], t["offsets"])
    lens, csum = device_rans.lane_lengths(flags, N)
    lens = np.asarray(lens)
    totals = lens.sum(1)
    W_hw = max(64, 1 << int(np.ceil(np.log2(int(totals.max())))))
    _, packed = device_rans.gather_payload(vals, flags, csum, x, W_hw)
    packed = np.asarray(packed)
    LZ = Dmax * G
    for i in range(N):
        total = int(totals[i])
        hw = np.zeros(2 * packed.shape[1], np.uint16)
        hw[0::2] = packed[i] & 0xFFFF
        hw[1::2] = packed[i] >> 16
        head = np.empty(1 + LZ, np.uint16)
        head[0] = LZ
        head[1:] = lens[i]
        assert head.tobytes() + hw[:total].tobytes() == ref[i], f"img {i}"


def test_fused_decoder_matches_numpy(tables, rng):
    """decode_block_channels(fused=...) — the 3-touch interleaved-LUT
    path the TurboCodec uses on TPU — is bit-identical to the reference
    decoder, including bypass (escape) symbols."""
    steps, Dmax, M, G = 6, 4, 8, 4
    N = 2
    t = tables
    fused = jnp.asarray(device_rans.build_fused_luts(
        t["cdf"], t["cdf_lengths"], t["offsets"]))
    all_syms, all_idx = [], []
    s0, i0, valid = make_symbols(rng, steps, Dmax, M)
    streams = []
    for n in range(N):
        s, ix, _ = make_symbols(rng, steps, Dmax, M)
        all_syms.append(s)
        all_idx.append(ix)
        streams.append(rans32.encode_interleaved(
            s, ix, valid, M, G, t["cdf"], t["cdf_lengths"], t["offsets"]))
    hws, starts = [], []
    off = 0
    for sbytes in streams:
        h, st = rans32.parse_header(sbytes)
        hws.append(h)
        starts.append(st + off)
        off += len(h)
    hw = jnp.asarray(np.concatenate(hws).astype(np.uint32))
    starts = np.stack(starts).reshape(N, Dmax, G)
    x, pos = device_rans.init_lane_state(hw, starts)
    cdf = jnp.asarray(t["cdf"])
    cl = jnp.asarray(t["cdf_lengths"])
    offs = jnp.asarray(t["offsets"])
    for d in range(steps):
        idx = jnp.asarray(np.stack([all_idx[n][d] for n in range(N)]))
        sym, x, pos = device_rans.decode_block_channels(
            hw, x, pos, idx, jnp.asarray(valid[d]), G, cdf, cl, offs,
            fused=fused)
        for n in range(N):
            expect = np.where(valid[d][:, None], all_syms[n][d], 0)
            np.testing.assert_array_equal(
                np.asarray(sym[n]), expect, err_msg=f"step {d} img {n}")


def test_device_encoder_enc_luts_identical(tables, rng):
    """encode_emissions with packed encode LUTs emits exactly the same
    (vals, flags, states) as the table-gather path."""
    steps, Dmax, M, G = 5, 4, 8, 4
    N = 2
    t = tables
    s, ix, valid = make_symbols(rng, steps, Dmax, M)
    sy = jnp.asarray(np.stack([s, s[::-1]]).swapaxes(0, 1))  # (steps,N,D,M)
    idx = jnp.asarray(np.stack([ix, ix[::-1]]).swapaxes(0, 1))
    args = (sy, idx, jnp.asarray(valid), G, jnp.asarray(t["cdf"]),
            jnp.asarray(t["cdf_lengths"]), jnp.asarray(t["offsets"]))
    v1, f1, x1 = device_rans.encode_emissions(*args)
    luts = tuple(jnp.asarray(a) for a in device_rans.build_encode_luts(
        t["cdf"], t["cdf_lengths"], t["offsets"]))
    v2, f2, x2 = device_rans.encode_emissions(*args, enc_luts=luts)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
