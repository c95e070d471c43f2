"""Block-based post-processing net (optional, off in all shipped configs).

Parity with BlkBasedPostProcessing (net.py:455-476): residual net on the
block-folded reconstruction — 3x3 conv C1->4*C1 with VALID padding (so image
borders are not filtered), LeakyReLU, 1x1 conv back to C1, then skip-add of
the zero-padded residual.
"""

import jax
import jax.numpy as jnp

from lbic_tpu.ops.masked_conv import conv_apply, masked_conv_init


def postproc_init(key, B, dtype=jnp.float32):
    c1 = 3 * B * B
    c2 = 4 * c1
    k0, k1 = jax.random.split(key)
    return {
        "res_net": {
            "0": masked_conv_init(k0, c1, c2, 3, "B", dtype),
            "2": masked_conv_init(k1, c2, c1, 1, "B", dtype),
        }
    }


def postproc_apply(params, x):
    h = conv_apply(x, params["res_net"]["0"], None, padding="VALID")
    h = jax.nn.leaky_relu(h, 0.01)
    h = conv_apply(h, params["res_net"]["2"], None)
    res = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return x + res
