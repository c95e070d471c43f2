"""Rate-distortion losses.

Pure-function equivalents of graphs/losses/rate_dist.py:
  * train_rd_loss (TrainRDLoss.forward, rate_dist.py:41-50):
    loss = rate + lambda * D, rate = sum(self_info) / numel(x) * 3 = bpp
    (x is block-folded, numel = N*3*H*W). D is mse | ssim | ms_ssim;
    SSIM variants un-block-fold and shift to [0, 1] (rate_dist.py:43-45).
  * train_d_loss (TrainDLoss, rate_dist.py:70-100): distortion-only warmup,
    loss = lambda * D (rate still reported).
  * valid_rd_loss (ValidRDLoss, rate_dist.py:103-123): PSNR-based
    "loss" = psnr + lambda * rate (a logging metric, not a gradient).

All functions return (loss, distortion, rate) like the reference modules.
"""

from typing import Tuple

import jax.numpy as jnp

from lbic_tpu.ops import metrics
from lbic_tpu.ops.blockfold import block_unfold


def _rate_bpp(self_info, x):
    return jnp.sum(self_info) / x.size * 3.0


def _distortion(x, xhat, distortion: str, B: int):
    if distortion == "mse":
        return jnp.mean(jnp.square(x - xhat))
    # SSIM losses operate on [0, 1] pixel images (rate_dist.py:43-45)
    xi = block_unfold(x + 0.5, B)
    xh = block_unfold(xhat + 0.5, B)
    if distortion == "ssim":
        return 1.0 - metrics.ssim(xi, xh, data_range=1.0)
    if distortion == "ms_ssim":
        return 1.0 - metrics.ms_ssim(xi, xh, data_range=1.0)
    raise ValueError(f"unknown distortion {distortion}")


def train_rd_loss(x, xhat, self_info, lambda_, distortion="mse", B=1):
    d = _distortion(x, xhat, distortion, B)
    rate = _rate_bpp(self_info, x)
    return rate + lambda_ * d, d, rate


def train_d_loss(x, xhat, self_info, lambda_, distortion="mse", B=1):
    """Distortion-only warmup (training_loss_switch == 0 until the RD loss
    falls below loss_switch_thr, agents/blkbsdimgcomp_agent.py:297-302)."""
    d = _distortion(x, xhat, distortion, B)
    rate = _rate_bpp(self_info, x)
    return lambda_ * d, d, rate


def valid_rd_loss(x, xhat, self_info, lambda_):
    p = metrics.psnr(x, xhat, data_range=1.0)
    rate = _rate_bpp(self_info, x)
    return p + lambda_ * rate, p, rate


def train_rd_loss2(x, xhat, self_info1, self_info2, lambda_,
                   distortion="mse", B=1, d_only=False):
    """Two rate terms — e.g. a Gaussian-conditional latent plus an
    EntropyBottleneck hyperlatent (TrainRDLoss.forward2 / TrainDLoss.forward2,
    rate_dist.py:52-58, 86-91). d_only: warmup variant (rate reported but
    not in the loss)."""
    d = _distortion(x, xhat, distortion, B)
    r1 = _rate_bpp(self_info1, x)
    r2 = _rate_bpp(self_info2, x)
    loss = lambda_ * d if d_only else r1 + r2 + lambda_ * d
    return loss, d, r1, r2


def train_rd_loss3(x, xhat, self_info1, self_info2_list, lambda_,
                   distortion="mse", B=1, d_only=False):
    """One main rate term + a list of auxiliary rate terms
    (TrainRDLoss.forward3 / TrainDLoss.forward3, rate_dist.py:60-67, 93-99)."""
    d = _distortion(x, xhat, distortion, B)
    r1 = _rate_bpp(self_info1, x)
    r2 = sum(_rate_bpp(si, x) for si in self_info2_list)
    loss = lambda_ * d if d_only else r1 + r2 + lambda_ * d
    return loss, d, r1, r2


def train_rate_loss(self_info):
    """Mean self-information = bits per subpixel
    (rate_distortion_loss.py:5-12; ValidRateLoss is identical, 15-22)."""
    return jnp.mean(self_info)


valid_rate_loss = train_rate_loss
