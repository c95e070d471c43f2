"""Image quality metrics: PSNR, SSIM, MS-SSIM — pure JAX, NHWC.

The reference delegates SSIM/MS-SSIM to the external `pytorch_msssim`
package (graphs/losses/rate_dist.py:10, used for the `ssim`/`ms_ssim`
distortion options and for eval metrics at agents/blkbsdimgcomp_agent.py:619).
This is a from-scratch implementation of the same (standard) definition:
Gaussian window 11, sigma 1.5, K=(0.01, 0.03), VALID padding, 5 MS levels
with weights (0.0448, 0.2856, 0.3001, 0.2363, 0.1333), 2x average-pool
between levels. Separable depthwise convs -> VPU-friendly on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(x, xhat, data_range=1.0):
    """Per-image PSNR averaged over batch (rate_dist.py:118-123)."""
    mse = jnp.mean(
        jnp.square(xhat - x).reshape(x.shape[0], -1), axis=1
    )
    return jnp.mean(-10.0 * jnp.log10(mse / (data_range ** 2)))


def _gaussian_kernel1d(win_size=11, sigma=1.5):
    x = np.arange(win_size, dtype=np.float64) - (win_size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return jnp.asarray((g / g.sum()).astype(np.float32))


def _blur(x, win):
    """Separable depthwise Gaussian filter, VALID padding. x: NHWC."""
    c = x.shape[-1]
    kh = jnp.tile(win[:, None, None, None], (1, 1, 1, c))  # (K,1,1,C)
    kw = jnp.tile(win[None, :, None, None], (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c)
    x = lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c)
    return x


def _ssim_per_channel(x, y, data_range, win_size, sigma, k1, k2):
    win = _gaussian_kernel1d(win_size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _blur(x, win)
    mu_y = _blur(y, win)
    # E[x^2]-mu^2 can dip below 0 under fp error on near-flat patches,
    # which pushed cs (and thus ms_ssim) above 1.0 and poisoned eval
    # averages (round-2 campaign logged `MS-SSIM/dB:1.023294/120.00`).
    # pytorch_msssim (the reference's metric source, rate_dist.py:10) is
    # robust here; clamp the variances at 0 and bound |sxy| by
    # sqrt(sxx*syy) (Cauchy-Schwarz) so 2*sxy+c2 <= sxx+syy+c2 (AM-GM)
    # and cs <= 1 exactly.
    sxx = jnp.maximum(_blur(x * x, win) - mu_x * mu_x, 0.0)
    syy = jnp.maximum(_blur(y * y, win) - mu_y * mu_y, 0.0)
    sxy = _blur(x * y, win) - mu_x * mu_y
    # +tiny inside the sqrt keeps d(sqrt)/dx finite at sxx*syy == 0
    # (flat windows) when the clip below selects the bound branch
    bound = jnp.sqrt(sxx * syy + 1e-20)
    sxy = jnp.clip(sxy, -bound, bound)
    cs = (2 * sxy + c2) / (sxx + syy + c2)
    ssim_map = ((2 * mu_x * mu_y + c1) / (mu_x * mu_x + mu_y * mu_y + c1)) * cs
    # mean over spatial dims and channels, per batch element
    axes = (1, 2, 3)
    return jnp.mean(ssim_map, axes), jnp.mean(cs, axes)


def ssim(x, y, data_range=1.0, win_size=11, sigma=1.5, k1=0.01, k2=0.03):
    """Mean SSIM over the batch. x, y: (N, H, W, C) in [0, data_range]."""
    s, _ = _ssim_per_channel(x, y, data_range, win_size, sigma, k1, k2)
    return jnp.mean(s)


def _avg_pool2(x):
    # 2x2 average pool, stride 2, with edge padding when odd (matches the
    # common implementation: pad by (H%2, W%2) on the bottom/right)
    ph, pw = x.shape[1] % 2, x.shape[2] % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def usable_ms_levels(h, w, win_size=11, max_levels=5):
    """Largest level count such that the smallest scale still fits the
    window ((min(h,w) >> (levels-1)) >= win_size)."""
    n = 1
    s = min(h, w)
    while n < max_levels and (s >> n) >= win_size:
        n += 1
    return n


def ms_ssim(x, y, data_range=1.0, win_size=11, sigma=1.5,
            weights=MS_WEIGHTS, k1=0.01, k2=0.03):
    """Multi-scale SSIM, mean over batch. For small images the level count
    is reduced automatically (weights renormalized) instead of NaN-ing."""
    levels = usable_ms_levels(x.shape[1], x.shape[2], win_size,
                              len(weights))
    weights = jnp.asarray(weights[:levels])
    weights = weights / jnp.sum(weights)
    mcs = []
    for i in range(levels):
        s, cs = _ssim_per_channel(x, y, data_range, win_size, sigma, k1, k2)
        if i < levels - 1:
            mcs.append(jnp.maximum(cs, 0.0))
            x = _avg_pool2(x)
            y = _avg_pool2(y)
    s = jnp.maximum(s, 0.0)
    vals = jnp.stack(mcs + [s], axis=0)  # (levels, N)
    # d(v**w)/dv = w*v**(w-1) -> inf at v == 0 (anticorrelated windows
    # clamp cs to exactly 0), which NaN'd every gradient of an ms_ssim
    # training loss (round-4 ms-ssim campaign: loss=nan from epoch 0).
    # Clamp to a small positive floor: forward changes only when the
    # metric is ~0 (garbage quality) and the gradient stays finite.
    vals = jnp.maximum(vals, 1e-6)
    out = jnp.prod(vals ** weights[:, None], axis=0)
    return jnp.mean(out)


def msssim_db(v):
    """-10*log10(1 - ms_ssim), the dB form used in the reference's results
    JSONs (utils/results_files/kodak/lbic8x8_mse.json 'ms-ssimdb').
    Clamped so v == 1.0 (identical images) stays finite (120 dB cap)."""
    return -10.0 * jnp.log10(jnp.maximum(1.0 - v, 1e-12))
