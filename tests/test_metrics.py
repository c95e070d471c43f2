"""PSNR/SSIM/MS-SSIM metric tests (vs closed forms and a direct numpy
SSIM evaluation — the reference outsourced these to pytorch_msssim)."""

import numpy as np

import jax.numpy as jnp

from lbic_tpu.ops import metrics


def _np_ssim_uniform(x, y, data_range=1.0):
    """Direct SSIM with the same Gaussian window, computed in numpy."""
    from scipy.ndimage import convolve

    g1 = np.asarray(metrics._gaussian_kernel1d(11, 1.5), dtype=np.float64)
    win = np.outer(g1, g1)
    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2

    def blur(a):
        out = convolve(a, win, mode="constant")
        # emulate VALID: crop the 5-pixel border
        return out[5:-5, 5:-5]

    mx, my = blur(x), blur(y)
    sxx = blur(x * x) - mx * mx
    syy = blur(y * y) - my * my
    sxy = blur(x * y) - mx * my
    m = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
        (mx ** 2 + my ** 2 + c1) * (sxx + syy + c2))
    return m.mean()


def test_psnr_known_value():
    x = jnp.zeros((1, 8, 8, 1))
    y = jnp.full((1, 8, 8, 1), 0.1)
    assert np.isclose(float(metrics.psnr(x, y)), 20.0, atol=1e-4)


def test_ssim_identity(rng):
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    assert float(metrics.ssim(x, x)) > 0.9999


def test_ssim_vs_numpy(rng):
    x = rng.uniform(0, 1, (64, 64)).astype(np.float64)
    y = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1)
    ref = _np_ssim_uniform(x, y)
    got = float(metrics.ssim(
        jnp.asarray(x[None, :, :, None], jnp.float32),
        jnp.asarray(y[None, :, :, None], jnp.float32)))
    assert np.isclose(got, ref, atol=2e-4), (got, ref)


def test_ms_ssim_identity_and_ordering(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 192, 192, 3)).astype(np.float32))
    assert float(metrics.ms_ssim(x, x)) > 0.9999
    y1 = jnp.clip(x + 0.02 * rng.standard_normal(x.shape).astype(np.float32), 0, 1)
    y2 = jnp.clip(x + 0.10 * rng.standard_normal(x.shape).astype(np.float32), 0, 1)
    v1 = float(metrics.ms_ssim(x, y1))
    v2 = float(metrics.ms_ssim(x, y2))
    assert 0 < v2 < v1 < 1.0


def test_msssim_db():
    assert np.isclose(float(metrics.msssim_db(0.99)), 20.0, atol=1e-6)
    assert np.isfinite(float(metrics.msssim_db(1.0)))


def test_ms_ssim_flat_image_not_above_one():
    """Regression: on near-flat patches E[x^2]-mu^2 goes negative under
    fp error, which used to push cs > 1 and ms_ssim > 1 (round-2 campaign
    logged MS-SSIM 1.023294 on style_04_wall_green_d.png)."""
    # exactly flat, slightly different levels
    x = jnp.full((1, 256, 256, 3), 0.5, jnp.float32)
    y = jnp.full((1, 256, 256, 3), 0.5 + 1e-3, jnp.float32)
    for a, b in ((x, x), (x, y)):
        v = float(metrics.ms_ssim(a, b))
        assert 0.0 <= v <= 1.0, v
        assert np.isfinite(float(metrics.msssim_db(v)))
    # flat + tiny additive noise (the failing real-world shape)
    r = np.random.default_rng(0)
    n = jnp.asarray(
        0.5 + 2e-3 * r.standard_normal((1, 192, 192, 3)), jnp.float32)
    m = jnp.asarray(
        0.5 + 2e-3 * r.standard_normal((1, 192, 192, 3)), jnp.float32)
    v = float(metrics.ms_ssim(n, m))
    assert 0.0 <= v <= 1.0, v
    v = float(metrics.ssim(n, m))
    assert 0.0 <= v <= 1.0, v


def test_ms_ssim_gradient_finite_on_pathological_pairs(rng):
    """Regression (round-4 ms-ssim campaign): anticorrelated windows
    clamp cs to exactly 0, and d(0**w)/dv = inf NaN'd every training
    gradient (loss=nan from epoch 0, results_rd_msssim.log). The metric
    must have finite gradients on anticorrelated, flat, and normal
    pairs."""
    import jax

    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    pairs = [
        1.0 - x,                                   # anticorrelated
        jnp.full_like(x, 0.5),                     # flat
        x + 0.01 * jnp.asarray(
            rng.standard_normal((1, 64, 64, 3)), jnp.float32),
    ]
    for y in pairs:
        g = jax.grad(lambda y: 1.0 - metrics.ms_ssim(x, y, 1.0))(y)
        assert bool(jnp.isfinite(g).all())
        g = jax.grad(lambda y: 1.0 - metrics.ssim(x, y, 1.0))(y)
        assert bool(jnp.isfinite(g).all())
    # values still sane after the epsilon floors
    assert float(metrics.ms_ssim(x, x, 1.0)) > 0.9999
