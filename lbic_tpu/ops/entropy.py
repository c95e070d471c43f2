"""Conditional Gaussian entropy model ops.

Pure-function equivalents of compressai's GaussianConditional as vendored at
graphs/layers/entropy_layers_cai.py:517-654:

  * likelihood = Phi((0.5-|v|)/sigma) - Phi((-0.5-|v|)/sigma), erfc-based,
    sigma lower-bounded at 0.11, likelihood lower-bounded at 1e-9
    (entropy_layers_cai.py:569-573, 615-632),
  * quantize modes noise | dequantize | symbols (entropy_layers_cai.py:126-151),
  * 64-entry log-spaced scale table in [0.11, 256] (net.py:13-18),
  * build_indexes buckets sigma into the scale table (entropy_layers_cai.py:649-654),
  * build_gaussian_cdfs builds the per-scale quantized CDF tables used by the
    rANS coder (entropy_layers_cai.py:590-613), tail_mass 1e-9.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from lbic_tpu.ops.bound import lower_bound

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64
SCALE_BOUND = 0.11
LIKELIHOOD_BOUND = 1e-9
TAIL_MASS = 1e-9


def get_scale_table(mmin=SCALES_MIN, mmax=SCALES_MAX, levels=SCALES_LEVELS):
    """Host-side numpy constant (f32). Built in numpy deliberately: a
    device round trip for a 64-float constant costs minutes through a
    remote-TPU tunnel, and as a numpy array it embeds as a literal in
    any traced computation that consumes it."""
    return np.exp(
        np.linspace(math.log(mmin), math.log(mmax), levels,
                    dtype=np.float32)).astype(np.float32)


def _std_cumulative(x):
    """Standard normal CDF via erfc for numerical precision
    (entropy_layers_cai.py:569-573)."""
    const = -(2 ** -0.5)
    return 0.5 * jax.scipy.special.erfc(const * x)


def gaussian_likelihood(y_qnt, scales, means=None):
    values = y_qnt - means if means is not None else y_qnt
    scales = lower_bound(scales, SCALE_BOUND)
    values = jnp.abs(values)
    upper = _std_cumulative((0.5 - values) / scales)
    lower = _std_cumulative((-0.5 - values) / scales)
    lik = upper - lower
    return lower_bound(lik, LIKELIHOOD_BOUND)


def quantize_noise(y, key):
    """Training-mode additive U(-0.5, 0.5) noise."""
    return y + jax.random.uniform(key, y.shape, y.dtype, -0.5, 0.5)


def quantize_dequantize(y, means=None):
    """Eval-mode: round around the mean (entropy_layers_cai.py:138-147)."""
    if means is None:
        return jnp.round(y)
    return jnp.round(y - means) + means


def quantize_symbols(y, means=None):
    v = y - means if means is not None else y
    return jnp.round(v).astype(jnp.int32)


def dequantize(symbols, means=None):
    if means is None:
        return symbols.astype(jnp.float32)
    return symbols.astype(means.dtype) + means


def build_indexes(scales, scale_table):
    """Bucket sigma into the scale table: index = #{s in table[:-1]: sigma > s}.

    Equivalent to entropy_layers_cai.py:649-654 (starts at len-1, subtracts
    one per table entry >= sigma)."""
    scales = lower_bound(scales, SCALE_BOUND)
    return jnp.sum(
        scales[..., None] > scale_table[:-1], axis=-1
    ).astype(jnp.int32)


def build_gaussian_cdfs(scale_table, precision=16, tail_mass=TAIL_MASS):
    """Quantized CDF tables for the rANS coder.

    Returns dict with int32 numpy arrays:
      cdf         (levels, max_len + 2) quantized CDF rows
      cdf_lengths (levels,)
      offsets     (levels,)             = -pmf_center
    Mirrors GaussianConditional.update (entropy_layers_cai.py:590-613).
    """
    from lbic_tpu.coding.cdf import pmf_to_quantized_cdf_np

    st = np.asarray(scale_table, dtype=np.float64)
    # multiplier = -Phi^{-1}(tail/2); scipy-free: ndtri via erfinv
    from scipy.stats import norm  # scipy is available in the image

    multiplier = -norm.ppf(tail_mass / 2)
    pmf_center = np.ceil(st * multiplier).astype(np.int64)
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())

    samples = np.abs(np.arange(max_length)[None, :] - pmf_center[:, None]).astype(np.float64)
    from scipy.special import erfc

    def std_cum(x):
        return 0.5 * erfc(-(2 ** -0.5) * x)

    upper = std_cum((0.5 - samples) / st[:, None])
    lower = std_cum((-0.5 - samples) / st[:, None])
    pmf = upper - lower
    tail = 2 * lower[:, :1]

    cdf = np.zeros((len(st), max_length + 2), dtype=np.int32)
    for i in range(len(st)):
        n = int(pmf_length[i])
        prob = np.concatenate([pmf[i, :n], tail[i]])
        row = pmf_to_quantized_cdf_np(prob, precision)
        cdf[i, : len(row)] = row
    return {
        "cdf": cdf,
        "cdf_lengths": (pmf_length + 2).astype(np.int32),
        "offsets": (-pmf_center).astype(np.int32),
    }
