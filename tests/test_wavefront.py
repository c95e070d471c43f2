"""Wavefront engine tests.

The load-bearing facts proven here (SURVEY.md §7 "hard parts"):
  * the skewed-wavefront schedule commits the SAME reconstruction as the
    reference's sequential raster order (net.py:339-357) — the masks' upper
    -right reach is fully accounted for by the slope;
  * decompress(compress(x)) reproduces the encoder-side zhat bit-exactly
    (the reference's own eval criterion, agents/blkbsdimgcomp_agent.py:600-602);
  * the dependency/slope analysis matches hand-derived values for the
    shipped kernel configurations.
"""

import numpy as np
import pytest

import jax

from lbic_tpu.config import LbicConfig
from lbic_tpu.engine import wavefront as wf
from lbic_tpu.models import lbic as M


def tiny_cfg(KS=(3, 1, 1, 1), B=4, N=16, M_=8, version="v9"):
    return LbicConfig(net_version=version, block_size=B, KS=KS, N=N, M=M_)


def make_codec(cfg, seed=0):
    md = M.make_model_def(cfg)
    params = M.init_params(md, jax.random.PRNGKey(seed))
    return md, wf.WavefrontCodec(md, params)


def rand_x(md, n, Hb, Wb, seed=1):
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.5, 0.5, (n, Hb, Wb, md.cx)).astype(np.float32)


class TestSchedule:
    def test_slope_shipped_configs(self):
        # lowrate KS=(3,1,1,1): only 'A' K=3 reaches upper-right by 1 -> slope 2
        md = M.make_model_def(tiny_cfg(KS=(3, 1, 1, 1)))
        assert wf.min_slope(md) == 2
        # highrate KS=(3,3,1,1): composite 'A'3 ∘ 'B'3 reach ratio still 1
        md = M.make_model_def(tiny_cfg(KS=(3, 3, 1, 1)))
        assert wf.min_slope(md) == 2

    def test_offsets_all_causal(self):
        md = M.make_model_def(tiny_cfg(KS=(3, 3, 1, 1)))
        for dv, dh in wf.composite_offsets(md):
            assert dv < 0 or (dv == 0 and dh < 0)

    def test_schedule_covers_grid_respecting_deps(self):
        md = M.make_model_def(tiny_cfg(KS=(3, 3, 1, 1)))
        s = wf.min_slope(md)
        sched = wf.make_schedule(5, 9, s)
        # every block exactly once
        seen = set()
        for d in range(sched.steps):
            for i in range(sched.Dmax):
                if sched.valid[d, i]:
                    seen.add((int(sched.vs[d, i]), int(sched.hs[d, i])))
        assert seen == {(v, h) for v in range(5) for h in range(9)}
        # dependencies always scheduled strictly earlier
        step_of = {}
        for d in range(sched.steps):
            for i in range(sched.Dmax):
                if sched.valid[d, i]:
                    step_of[(int(sched.vs[d, i]), int(sched.hs[d, i]))] = d
        deps = wf.composite_offsets(md)
        for (v, h), d in step_of.items():
            for dv, dh in deps:
                q = (v + dv, h + dh)
                if q in step_of:
                    assert step_of[q] < d, ((v, h), q)


@pytest.mark.parametrize("KS", [(3, 1, 1, 1), (3, 3, 1, 1)])
def test_wavefront_equals_raster(KS):
    cfg = tiny_cfg(KS=KS)
    md, codec = make_codec(cfg)
    x = rand_x(md, 1, 5, 7)
    _, zhat_wf = codec.compress(x)
    zhat_raster = codec.closed_loop_raster(x)
    np.testing.assert_allclose(zhat_wf, zhat_raster, rtol=0, atol=1e-6)


@pytest.mark.parametrize("KS", [(3, 1, 1, 1), (3, 3, 1, 1)])
def test_roundtrip_bit_exact(KS):
    cfg = tiny_cfg(KS=KS)
    md, codec = make_codec(cfg)
    x = rand_x(md, 2, 6, 5)
    streams, zhat_enc = codec.compress(x)
    assert all(len(s) > 0 for s in streams)
    zhat_dec = codec.decompress(streams, 6, 5)
    # reference criterion: encoder and decoder reconstructions identical
    assert np.array_equal(zhat_enc, zhat_dec), (
        np.abs(zhat_enc - zhat_dec).max()
    )


def v4_raster_reference(md, params, x):
    """Torch-faithful v4 closed loop: variable crops [max(0,v-U):v+1,
    max(0,h-L):min(W,h+R+1)] with SAME-padded full-path convs
    (reference net.py:167-201) — the ground truth the fixed-window masked
    emulation must reproduce."""
    import jax.numpy as jnp

    n, Hb, Wb, _ = x.shape
    U = md.lru
    zhat = jnp.zeros((n, Hb, Wb, md.cx))
    yq = jnp.zeros((n, Hb, Wb, md.M))
    x = jnp.asarray(x)
    for v in range(Hb):
        for h in range(Wb):
            uu, ll, rr = max(0, v - U), max(0, h - U), min(Wb, h + U + 1)
            zwin = zhat[:, uu:v + 1, ll:rr]
            xwin = x[:, uu:v + 1, ll:rr]
            y = M.analysis_full(md, params, zwin, xwin)[:, v - uu, h - ll]
            sc, mu = M.meanscale_full(md, params, zwin)
            mu = mu[:, v - uu, h - ll]
            y_sym = jnp.round(y - mu)
            yq = yq.at[:, v, h].set(y_sym + mu)
            yqwin = yq[:, uu:v + 1, ll:rr]
            xh = M.synthesis_full(md, params, zwin, yqwin)[:, v - uu, h - ll]
            zhat = zhat.at[:, v, h].set(jnp.clip(xh, -0.5, 0.5))
    return np.asarray(zhat)


class TestV4:
    def test_wavefront_matches_torch_semantics(self):
        cfg = tiny_cfg(KS=(3, 3, 3, 3), B=4, N=8, M_=4, version="v4")
        md, codec = make_codec(cfg)
        assert codec.v4
        x = rand_x(md, 1, 4, 5)
        _, zhat_wf = codec.compress(x)
        zhat_ref = v4_raster_reference(md, codec.params, x)
        np.testing.assert_allclose(zhat_wf, zhat_ref, rtol=0, atol=2e-6)

    def test_v4_roundtrip_bit_exact(self):
        cfg = tiny_cfg(KS=(3, 3, 1, 1), B=4, N=8, M_=4, version="v4")
        md, codec = make_codec(cfg)
        x = rand_x(md, 2, 5, 4)
        streams, zhat_enc = codec.compress(x)
        zhat_dec = codec.decompress(streams, 5, 4)
        assert np.array_equal(zhat_enc, zhat_dec)


def test_bpp_matches_entropy_estimate():
    """Actual stream length tracks the model's own -log2 p estimate."""
    import jax.numpy as jnp
    from lbic_tpu.ops import entropy as ent

    cfg = tiny_cfg()
    md, codec = make_codec(cfg)
    x = rand_x(md, 1, 6, 6)
    streams, zhat = codec.compress(x)
    actual_bits = 8 * len(streams[0])

    # estimate: closed-loop self-info using the committed zhat
    zh = jnp.asarray(zhat)
    scales, means = M.meanscale_full(md, codec.params, zh)
    y = M.analysis_full(md, codec.params, zh, jnp.asarray(x))
    y_sym = jnp.round(y - means)
    lik = ent.gaussian_likelihood(y_sym + means, scales, means)
    est_bits = float(-jnp.log2(lik).sum())
    # rANS overhead is small; estimate from random-param model is loose
    assert actual_bits < 2.0 * est_bits + 2000
    assert actual_bits > 0.3 * est_bits


def test_closed_loop_per_block_bits_map():
    """per_block=True returns a (N,Hb,Wb) bits map consistent with the
    scalar total (the RD-cost-map dump of validate_recu_reco,
    reference agent:406-408, 460-475)."""
    import jax.numpy as jnp
    cfg = tiny_cfg()
    md = M.make_model_def(cfg)
    params = M.init_params(md, jax.random.PRNGKey(0))
    x = jnp.asarray(rand_x(md, 2, 5, 7, seed=3))
    sched = wf.make_schedule(5, 7, wf.min_slope(md))
    z1, b1 = wf.closed_loop_scan(md, params, x, sched)
    z2, b2, bmap = wf.closed_loop_scan(md, params, x, sched, per_block=True)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    assert np.isclose(float(b1), float(b2))
    assert bmap.shape == (2, 5, 7)
    assert np.isclose(float(jnp.sum(bmap)), float(b1), rtol=1e-5)
    assert np.all(np.asarray(bmap) > 0)
