"""Bound / parametrization ops.

`lower_bound` is max(x, bound) with a straight-through-style gradient: the
gradient passes when x >= bound OR when the incoming cotangent pushes x up
(g < 0). Mirrors the reference autograd function utils/bound_ops.py:22-42.

`nonneg_*` implement the NonNegativeParametrizer (utils/parametrizers.py:23-48):
parameters are stored as sqrt(v + eps^2) and materialized as
lower_bound(p, sqrt(min+eps^2))^2 - eps^2.
"""

import jax
import jax.numpy as jnp

REPARAM_OFFSET = 2.0 ** -18
_PEDESTAL = REPARAM_OFFSET ** 2


@jax.custom_vjp
def lower_bound(x, bound):
    return jnp.maximum(x, bound)


def _lb_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lb_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, jnp.zeros_like(g)), None)


lower_bound.defvjp(_lb_fwd, _lb_bwd)


def nonneg_init(v):
    """Map a desired non-negative value to its stored (reparam) form."""
    return jnp.sqrt(jnp.maximum(v + _PEDESTAL, _PEDESTAL))


def nonneg_apply(p, minimum=0.0):
    """Stored form -> effective non-negative value (>= minimum)."""
    bound = (minimum + _PEDESTAL) ** 0.5
    out = lower_bound(p, bound)
    return out * out - _PEDESTAL
