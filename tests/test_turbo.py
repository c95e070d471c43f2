"""TurboCodec (single-scan on-device codec) tests: bit-exact round trip
and RD equivalence with the v1 host-loop codec."""

import numpy as np
import pytest

import jax

from lbic_tpu.config import LbicConfig
from lbic_tpu.engine.turbo import TurboCodec
from lbic_tpu.engine.wavefront import WavefrontCodec
from lbic_tpu.models import lbic as M


def build(KS=(3, 1, 1, 1), B=4, N=16, M_=8, seed=0):
    cfg = LbicConfig(net_version="v9", block_size=B, KS=KS, N=N, M=M_)
    md = M.make_model_def(cfg)
    params = M.init_params(md, jax.random.PRNGKey(seed))
    return md, params


def rand_x(md, n, Hb, Wb, seed=1):
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.5, 0.5, (n, Hb, Wb, md.cx)).astype(np.float32)


@pytest.mark.parametrize("KS", [(3, 1, 1, 1), (3, 3, 1, 1)])
def test_turbo_roundtrip_bit_exact(KS):
    md, params = build(KS=KS)
    codec = TurboCodec(md, params, G=4)
    x = rand_x(md, 2, 6, 7)
    streams, zhat_enc = codec.compress(x)
    assert all(len(s) > 0 for s in streams)
    zhat_dec = codec.decompress(streams, 6, 7)
    assert np.array_equal(zhat_enc, zhat_dec), \
        np.abs(zhat_enc - zhat_dec).max()


@pytest.mark.parametrize("lane_slots", [2, 3])
def test_turbo_slot_merged_lanes(lane_slots):
    """lane_slots=KS merges KS schedule slots per rans32 stream: the
    round trip stays bit-exact, reconstructions match KS=1 exactly (the
    decoded symbols are identical — only the stream factorization
    changes), host and device encoders emit identical streams, and the
    per-image overhead drops by ~KS (the point of the knob). KS=3 covers
    the non-divisible slot-padding path."""
    md, params = build()
    x = rand_x(md, 2, 6, 7)
    base = TurboCodec(md, params, G=4)
    s_base, z_base = base.compress(x)
    codec = TurboCodec(md, params, G=4, lane_slots=lane_slots)
    streams, zhat_enc = codec.compress(x)
    zhat_dec = codec.decompress(streams, 6, 7)
    assert np.array_equal(zhat_enc, zhat_dec)
    np.testing.assert_array_equal(np.asarray(zhat_enc),
                                  np.asarray(z_base))
    host = TurboCodec(md, params, G=4, lane_slots=lane_slots,
                      device_encode=False)
    s_host, _ = host.compress(x)
    assert all(a == b for a, b in zip(streams, s_host))
    # fewer lanes -> smaller streams (6 B saved per removed lane)
    lanes_base = base.schedule(6, 7).Dmax * 4
    lanes = codec._lane_grid(codec.schedule(6, 7))[1] * 4
    assert lanes < lanes_base
    assert sum(len(s) for s in streams) < sum(len(s) for s in s_base)


def test_turbo_vs_v1_rd_equivalent():
    """Same model: turbo and v1 must produce near-identical reconstructions
    (not bitwise — different executables — but numerically equivalent)
    and similar stream sizes."""
    md, params = build()
    v1 = WavefrontCodec(md, params)
    turbo = TurboCodec(md, params, G=4)
    x = rand_x(md, 1, 8, 8)
    s1, z1 = v1.compress(x)
    s2, z2 = turbo.compress(x)
    np.testing.assert_allclose(z1, z2, atol=1e-5)
    # stream sizes comparable (turbo pays ~4B/lane header overhead)
    lanes = turbo.schedule(8, 8).Dmax * turbo.G
    assert len(s2[0]) <= len(s1[0]) + 6 * lanes + 64


def test_turbo_batch_consistency():
    """Each image in a batch decodes to the same result as alone."""
    md, params = build()
    codec = TurboCodec(md, params, G=4)
    x = rand_x(md, 3, 5, 6)
    streams, zhat = codec.compress(x)
    s0, z0 = codec.compress(x[:1])
    assert s0[0] == streams[0]
    np.testing.assert_array_equal(z0[0], zhat[0])
