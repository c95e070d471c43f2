"""Multi-device engines on the virtual 8-device CPU mesh:
image-sharded TurboCodec and the row-sharded halo-exchange wavefront."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from lbic_tpu.config import LbicConfig
from lbic_tpu.engine.row_sharded import RowShardedWavefront, make_local_schedules
from lbic_tpu.engine.turbo import TurboCodec
from lbic_tpu.engine.wavefront import closed_loop_scan, make_schedule, min_slope
from lbic_tpu.models import lbic as M
from lbic_tpu.parallel import make_mesh


def small_md(KS=(3, 1, 1, 1)):
    cfg = LbicConfig(net_version="v9", block_size=8, KS=KS, N=16, M=8)
    return M.make_model_def(cfg)


def test_local_schedules_partition_global():
    Hb, Wb, R = 8, 12, 4
    vs, hs, valid, steps, Dloc = make_local_schedules(Hb, Wb, 2, R)
    g = make_schedule(Hb, Wb, 2)
    assert steps == g.steps
    seen = set()
    Hs = Hb // R
    for r in range(R):
        for d in range(steps):
            for i in range(Dloc):
                if valid[r, d, i]:
                    v = int(vs[r, d, i]) + r * Hs
                    h = int(hs[r, d, i])
                    # same step as the global schedule
                    assert g.valid[d][(g.vs[d] == v) & (g.hs[d] == h)].any()
                    seen.add((v, h))
    assert len(seen) == Hb * Wb


@pytest.mark.parametrize("KS", [(3, 1, 1, 1), (3, 3, 1, 1)])
def test_row_sharded_matches_unsharded(KS):
    md = small_md(KS)
    params = M.init_params(md, jax.random.PRNGKey(0))
    mesh = make_mesh(data=2, row=4)
    eng = RowShardedWavefront(md, params, mesh)
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.5, 0.5, (2, 8, 10, md.cx)).astype(np.float32)

    zhat_sh, bits_sh = eng(x)
    sched = make_schedule(8, 10, min_slope(md))
    zhat, bits = jax.jit(
        lambda p, a: closed_loop_scan(md, p, a, sched))(params, x)

    # different compiled programs -> float results may differ in the last
    # ulps and (rarely) flip a rounding; require near-identical recon
    d = np.abs(np.asarray(zhat_sh) - np.asarray(zhat))
    assert d.max() < 5e-3 and (d > 1e-5).mean() < 0.01, (
        d.max(), (d > 1e-5).mean())
    np.testing.assert_allclose(float(bits_sh), float(bits), rtol=1e-3)


def test_row_sharded_single_row_axis():
    """R=1 degenerates to the unsharded schedule."""
    md = small_md()
    params = M.init_params(md, jax.random.PRNGKey(1))
    mesh = make_mesh(data=8, row=1)
    eng = RowShardedWavefront(md, params, mesh)
    x = np.random.default_rng(1).uniform(
        -0.5, 0.5, (1, 4, 6, md.cx)).astype(np.float32)
    zhat, bits = eng(x)
    assert zhat.shape == (1, 4, 6, md.cx)
    assert np.isfinite(float(bits))


def test_turbo_image_sharded_roundtrip():
    md = small_md()
    params = M.init_params(md, jax.random.PRNGKey(0))
    mesh = make_mesh(data=8, row=1)
    codec = TurboCodec(md, params, G=4, mesh=mesh)
    x = np.random.default_rng(2).uniform(
        -0.5, 0.5, (8, 4, 6, md.cx)).astype(np.float32)
    streams, zhat_enc = codec.compress(x)
    assert len(streams) == 8
    zhat_dec = codec.decompress(streams, 4, 6)
    # bit-exact: encode and decode run the same sharded program
    np.testing.assert_array_equal(np.asarray(zhat_enc),
                                  np.asarray(zhat_dec))


def test_turbo_sharded_matches_unsharded_rd():
    md = small_md()
    params = M.init_params(md, jax.random.PRNGKey(0))
    x = np.random.default_rng(3).uniform(
        -0.5, 0.5, (8, 4, 6, md.cx)).astype(np.float32)
    c1 = TurboCodec(md, params, G=4)
    c2 = TurboCodec(md, params, G=4, mesh=make_mesh(data=8, row=1))
    s1, z1 = c1.compress(x)
    s2, z2 = c2.compress(x)
    assert [len(a) for a in s1] == [len(a) for a in s2]
    d = np.abs(z1 - z2)
    assert d.max() < 5e-3, d.max()
