"""Generalized Divisive Normalization (GDN / IGDN).

Math and parametrization follow the canonical CompressAI implementation the
reference models actually use (`from compressai.layers import GDN`,
net.py:7; vendored copy graphs/layers/gdn_compressai.py:26-80):

    beta, gamma are stored reparametrized: p = sqrt(v + eps^2);
    effective v = lower_bound(p, sqrt(min+eps^2))^2 - eps^2
    norm_i = beta_i + sum_j gamma[i, j] * x_j^2
    y = x * rsqrt(norm)      (forward)
    y = x * sqrt(norm)       (inverse / IGDN)

In NHWC this is a single (C, C) matmul on x^2 — pure MXU work; the 1x1-conv
formulation of the reference is unnecessary.
"""

import jax.numpy as jnp

from lbic_tpu.ops.bound import nonneg_apply, nonneg_init

BETA_MIN = 1e-6
GAMMA_INIT = 0.1


def gdn_init(ch, dtype=jnp.float32):
    """Params {'beta': (C,), 'gamma': (C, C)} in reparam (sqrt) space.

    gamma[i, j] multiplies x_j^2 in output channel i (torch conv weight
    layout (C_out, C_in) — kept so checkpoint import is a plain copy)."""
    beta = nonneg_init(jnp.ones((ch,), dtype))
    gamma = nonneg_init(GAMMA_INIT * jnp.eye(ch, dtype=dtype))
    return {"beta": beta, "gamma": gamma}


def gdn_apply(x, params, inverse=False):
    """x: (..., C) NHWC activations."""
    beta = nonneg_apply(params["beta"], minimum=BETA_MIN)
    gamma = nonneg_apply(params["gamma"], minimum=0.0)
    # norm[..., i] = beta[i] + sum_j x2[..., j] * gamma[i, j]
    norm = jnp.einsum(
        "...j,ij->...i", jnp.square(x), gamma,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + beta
    if inverse:
        return x * jnp.sqrt(norm)
    return x * (1.0 / jnp.sqrt(norm))
