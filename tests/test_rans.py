import numpy as np
import pytest

from lbic_tpu.coding import BufferedRansEncoder, RansDecoder, encode_with_indexes
from lbic_tpu.coding import rans_py
from lbic_tpu.coding.api import backend_name
from lbic_tpu.ops import build_gaussian_cdfs, get_scale_table


@pytest.fixture(scope="module")
def tables():
    return build_gaussian_cdfs(np.asarray(get_scale_table()))


def _random_payload(rng, n, tables, escape_frac=0.0):
    lens = tables["cdf_lengths"]
    offs = tables["offsets"]
    idx = rng.integers(0, len(lens), n).astype(np.int32)
    max_vals = lens[idx] - 2
    vals = (rng.integers(0, 1_000_000, n) % max_vals).astype(np.int64)
    if escape_frac:
        esc = rng.random(n) < escape_frac
        vals = np.where(esc, rng.integers(-(1 << 20), 1 << 20, n), vals)
    syms = (vals + offs[idx]).astype(np.int32)
    return syms, idx


def test_roundtrip_basic(tables, rng):
    syms, idx = _random_payload(rng, 5000, tables)
    bs = encode_with_indexes(syms, idx, tables["cdf"], tables["cdf_lengths"], tables["offsets"])
    dec = RansDecoder()
    dec.set_stream(bs)
    out = dec.decode_stream(idx, tables["cdf"], tables["cdf_lengths"], tables["offsets"])
    np.testing.assert_array_equal(out, syms)


def test_roundtrip_with_escapes(tables, rng):
    syms, idx = _random_payload(rng, 2000, tables, escape_frac=0.05)
    bs = encode_with_indexes(syms, idx, tables["cdf"], tables["cdf_lengths"], tables["offsets"])
    dec = RansDecoder()
    dec.set_stream(bs)
    out = dec.decode_stream(idx, tables["cdf"], tables["cdf_lengths"], tables["offsets"])
    np.testing.assert_array_equal(out, syms)


def test_incremental_decode_matches_buffered_encode(tables, rng):
    """Encoder buffers chunk by chunk; decoder pulls different chunk sizes."""
    enc = BufferedRansEncoder()
    chunks = [_random_payload(rng, int(n), tables) for n in rng.integers(1, 300, 20)]
    for s, i in chunks:
        enc.encode_with_indexes(s, i)
    bs = enc.flush(tables["cdf"], tables["cdf_lengths"], tables["offsets"])
    dec = RansDecoder()
    dec.set_stream(bs)
    for s, i in chunks:
        out = dec.decode_stream(i, tables["cdf"], tables["cdf_lengths"], tables["offsets"])
        np.testing.assert_array_equal(out, s)


def test_cross_backend_compatibility(tables, rng):
    """C++ encode -> Python decode and Python encode -> C++ decode."""
    if backend_name() != "cpp":
        pytest.skip("no C++ backend")
    syms, idx = _random_payload(rng, 800, tables, escape_frac=0.02)
    args = (tables["cdf"], tables["cdf_lengths"], tables["offsets"])
    bs_cpp = encode_with_indexes(syms, idx, *args)
    bs_py = rans_py.encode_with_indexes_py(syms, idx, *args)
    assert bs_cpp == bs_py  # identical stream format
    out = rans_py.RansDecoderPy(bs_cpp).decode_stream(idx, *args)
    np.testing.assert_array_equal(out, syms)


def test_rate_close_to_entropy(tables, rng):
    """Coded size must be within ~1% + constant of the CDF-model entropy."""
    n = 200_000
    # all symbols from the sigma≈1 row
    table = np.asarray(get_scale_table())
    row_i = int(np.argmin(np.abs(table - 1.0)))
    idx = np.full(n, row_i, np.int32)
    c = -tables["offsets"][row_i]
    raw = np.clip(np.round(rng.standard_normal(n)).astype(np.int64), -c, c)
    syms = raw.astype(np.int32)
    bs = encode_with_indexes(syms, idx, tables["cdf"], tables["cdf_lengths"], tables["offsets"])
    row = tables["cdf"][row_i, : tables["cdf_lengths"][row_i]]
    p = np.diff(row).astype(np.float64) / (1 << 16)
    bits_model = -np.log2(p[raw + c]).sum()
    bits_actual = len(bs) * 8
    assert bits_actual < bits_model * 1.01 + 128
