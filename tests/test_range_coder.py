"""Range-coder backend tests: round trips, cross-backend byte equality
(C++ vs Python twin), escape/bypass handling, rate parity with rANS, and
the coder factory (the reference's _EntropyCoder proxy,
entropy_layers_cai.py:18-51)."""

import numpy as np
import pytest

from lbic_tpu.coding import api, range_coder_py as rcp, rans_py


def _make_tables(rng, max_vals):
    L = max(max_vals) + 3
    rows, lens, offs = [], [], []
    for mv in max_vals:
        pmf = rng.random(mv) + 1e-3
        pmf = pmf / pmf.sum() * (1 - 1e-3)
        cum = np.round(np.cumsum(np.concatenate([[0.0], pmf, [1e-3]]))
                       * (1 << 16)).astype(np.int64)
        cum[-1] = 1 << 16
        for i in range(1, len(cum)):
            if cum[i] <= cum[i - 1]:
                cum[i] = cum[i - 1] + 1
        r = np.zeros(L, np.int64)
        r[:len(cum)] = cum
        rows.append(r)
        lens.append(len(cum))
        offs.append(-(mv // 2))
    return (np.stack(rows), np.array(lens, np.int32),
            np.array(offs, np.int32))


@pytest.fixture(scope="module")
def tables():
    return _make_tables(np.random.default_rng(3), (8, 16, 30, 5))


def test_py_round_trip_in_range(tables):
    cdfs, lens, offs = tables
    rng = np.random.default_rng(0)
    for n in (0, 1, 2, 17, 500):
        idx = rng.integers(0, 4, n).astype(np.int32)
        sym = np.array([rng.integers(offs[i], offs[i] + lens[i] - 2)
                        for i in idx], np.int32).reshape(n)
        enc = rcp.encode_with_indexes_py(sym, idx, cdfs, lens, offs)
        dec = rcp.RangeDecoderPy(enc).decode_stream(idx, cdfs, lens, offs)
        assert np.array_equal(dec, sym)


def test_py_round_trip_escapes(tables):
    cdfs, lens, offs = tables
    rng = np.random.default_rng(1)
    n = 4000
    idx = rng.integers(0, 4, n).astype(np.int32)
    sym = rng.integers(-700, 1000, n).astype(np.int32)
    enc = rcp.encode_with_indexes_py(sym, idx, cdfs, lens, offs)
    dec = rcp.RangeDecoderPy(enc).decode_stream(idx, cdfs, lens, offs)
    assert np.array_equal(dec, sym)


def test_cpp_matches_python_bytes(tables):
    if api.backend_name() != "cpp":
        pytest.skip("no C++ backend")
    cdfs, lens, offs = tables
    rng = np.random.default_rng(2)
    n = 20000
    idx = rng.integers(0, 4, n).astype(np.int32)
    sym = rng.integers(-700, 1000, n).astype(np.int32)
    enc_cpp = api.rc_encode_with_indexes(sym, idx, cdfs, lens, offs)
    enc_py = rcp.encode_with_indexes_py(sym, idx, cdfs, lens, offs)
    assert enc_cpp == enc_py
    # cross decode: C++ decoder on the stream, chunked reads
    dec = api.RangeDecoder()
    dec.set_stream(enc_py)
    outs = [dec.decode_stream(idx[k:k + 3333], cdfs, lens, offs)
            for k in range(0, n, 3333)]
    assert np.array_equal(np.concatenate(outs), sym)
    # python decoder on the C++ stream
    got = rcp.RangeDecoderPy(enc_cpp).decode_stream(idx, cdfs, lens, offs)
    assert np.array_equal(got, sym)


def test_rate_parity_with_rans(tables):
    """Both coders consume the same quantized CDFs, so their streams
    must be the same size to within a fraction of a percent."""
    cdfs, lens, offs = tables
    rng = np.random.default_rng(4)
    n = 30000
    idx = rng.integers(0, 4, n).astype(np.int32)
    sym = rng.integers(-40, 60, n).astype(np.int32)
    rc = rcp.encode_with_indexes_py(sym, idx, cdfs, lens, offs)
    ra = rans_py.encode_with_indexes_py(sym, idx, cdfs, lens, offs)
    assert abs(len(rc) - len(ra)) / len(ra) < 0.005, (len(rc), len(ra))


def test_carry_ripple():
    """A CDF that forces near-top code values exercises the 0xFF-run
    carry propagation."""
    row = np.array([0, 65534, 65535, 65536], np.int64)  # p(0) ~ 1
    cdfs = row[None]
    lens = np.array([4], np.int32)
    offs = np.array([0], np.int32)
    rng = np.random.default_rng(5)
    sym = (rng.random(5000) < 0.002).astype(np.int32)  # rare 1s
    idx = np.zeros(5000, np.int32)
    enc = rcp.encode_with_indexes_py(sym, idx, cdfs, lens, offs)
    dec = rcp.RangeDecoderPy(enc).decode_stream(idx, cdfs, lens, offs)
    assert np.array_equal(dec, sym)
    if api.backend_name() == "cpp":
        assert api.rc_encode_with_indexes(sym, idx, cdfs, lens, offs) == enc


def test_wavefront_codec_rangecoder_end_to_end():
    """Full codec round trip with entropy_coder='rangecoder': bit-exact
    enc/dec recon, identical recon to the rANS coder, and stream sizes
    within 1%."""
    import jax
    import jax.numpy as jnp

    from lbic_tpu.config import LbicConfig
    from lbic_tpu.engine import wavefront as wf
    from lbic_tpu.models import lbic as M
    from lbic_tpu.ops.blockfold import block_fold, pad_to_block_multiple
    from lbic_tpu.train import init_state

    cfg = LbicConfig(net_version="v9", block_size=8, KS=(3, 1, 1, 1),
                     N=48, M=12)
    md = M.make_model_def(cfg)
    state = init_state(md, jax.random.PRNGKey(0), 1e-3)
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 35, 51, 3))
                      .astype(np.float32))
    xp, _ = pad_to_block_multiple(img, 8)
    xb = np.asarray(block_fold(xp, 8))

    rc = wf.WavefrontCodec(md, state.params, entropy_coder="rangecoder")
    streams_rc, zenc = rc.compress(xb)
    zdec = rc.decompress(streams_rc, xb.shape[1], xb.shape[2])
    assert np.array_equal(np.asarray(zenc), np.asarray(zdec))

    ans = wf.WavefrontCodec(md, state.params, entropy_coder="ans")
    streams_ans, zenc_ans = ans.compress(xb)
    assert np.array_equal(np.asarray(zenc), np.asarray(zenc_ans))
    a, b = len(streams_rc[0]), len(streams_ans[0])
    assert abs(a - b) <= max(8, 0.01 * b), (a, b)

    with pytest.raises(ValueError):
        wf.WavefrontCodec(md, state.params, entropy_coder="huffman")


def test_make_coder_factory(tables):
    cdfs, lens, offs = tables
    rng = np.random.default_rng(6)
    n = 300
    idx = rng.integers(0, 4, n).astype(np.int32)
    sym = rng.integers(-30, 40, n).astype(np.int32)
    for method in api.AVAILABLE_ENTROPY_CODERS:
        enc, dec = api.make_coder(method)
        enc.encode_with_indexes(sym, idx)
        stream = enc.flush(cdfs, lens, offs)
        dec.set_stream(stream)
        assert np.array_equal(
            dec.decode_stream(idx, cdfs, lens, offs), sym), method
    with pytest.raises(ValueError):
        api.make_coder("huffman")
