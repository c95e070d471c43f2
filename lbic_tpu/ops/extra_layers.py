"""Auxiliary layer variants from the reference's layer library.

None of these are used by the shipped v4/v9 models, but they are part of
the reference's public ops surface and are provided for parity:

  * GDN1 — simplified GDN with |x| normalization and no sqrt
    (graphs/layers/gdn_compressai.py:83-109, from Johnston et al. 2019).
  * Channel-incremental conv mask — each output channel sees only a
    causal prefix of input channels (graphs/layers/masked_conv2d.py:52-90).
  * Fused masked-conv-on-zhat + block-conv-on-x
    (MaskedConv2d_zhat_x, masked_conv2d.py:24-49).
  * Masked transpose conv (MaskedConvTranspose2d, masked_conv2d.py:96-134;
    marked untested in the reference).
  * ResBlock (dense + tanh residual) and ResBlock2d (masked-conv
    residual with LeakyReLU) (graphs/layers/res_nets.py:7-66).

All are pure functions over NHWC arrays / HWIO weights, masks applied at
call time (weights stay unmasked in the pytree, matching
lbic_tpu/ops/masked_conv.py's convention).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from lbic_tpu.ops.bound import nonneg_apply
from lbic_tpu.ops.gdn import BETA_MIN
from lbic_tpu.ops.masked_conv import DN, conv2d, make_mask, masked_conv_init

LRELU_SLOPE = 0.01


# ------------------------------- GDN1 -------------------------------


def gdn1_apply(x, params, inverse=False):
    """Simplified GDN: norm = beta + sum_j gamma[i,j] |x_j| (no sqrt).

    Same param pytree as gdn_apply ({'beta','gamma'} in reparam space),
    so a GDN checkpoint loads directly (gdn_compressai.py:96-109)."""
    beta = nonneg_apply(params["beta"], minimum=BETA_MIN)
    gamma = nonneg_apply(params["gamma"], minimum=0.0)
    norm = jnp.einsum(
        "...j,ij->...i", jnp.abs(x), gamma,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + beta
    if inverse:
        return x * norm
    return x * (1.0 / norm)


# ----------------------- channel-incremental conv -----------------------


def make_chinc_mask(cin, cout, grps=1):
    """(cin, cout) channel-causality mask (masked_conv2d.py:67-88).

    cout >= cin ('up'): output group i*K:(i+grps)*K sees inputs 0:i+grps.
    cout <  cin ('dn'): output i:i+grps sees inputs 0:(i+grps)*K."""
    assert cout % cin == 0 or cin % cout == 0, (cin, cout)
    m = np.zeros((cin, cout), np.float32)
    if cout >= cin:
        assert cin % grps == 0
        K = cout // cin
        for i in range(0, cin, grps):
            m[0:i + grps, i * K:(i + grps) * K] = 1
    else:
        assert cout % grps == 0
        K = cin // cout
        for i in range(0, cout, grps):
            m[0:(i + grps) * K, i:i + grps] = 1
    return m


def chinc_conv_apply(x, params, grps=1, padding="SAME"):
    """Channel-incremental conv: weights (k,k,cin,cout) masked so output
    channels only see their causal input-channel prefix."""
    w = params["w"]
    m = jnp.asarray(make_chinc_mask(w.shape[2], w.shape[3], grps))
    return conv2d(x, w * m[None, None], params["b"], padding)


# --------------------- fused zhat/x masked conv ---------------------


def masked_conv_zhat_x_init(key, cin_z, cin_x, cout, k, dtype=jnp.float32):
    """Params for the fused layer: an 'A'-masked kxk conv on zhat plus an
    unmasked 1x1 block conv on x (masked_conv2d.py:24-49; the reference's
    stride/kernel = block size collapses to 1x1 on block-folded input)."""
    kz, kx = jax.random.split(key)
    return {
        "z": masked_conv_init(kz, cin_z, cout, k, "A", dtype),
        "x": masked_conv_init(kx, cin_x, cout, 1, "B", dtype),
    }


def masked_conv_zhat_x_apply(zhat, x, params, k):
    mask = jnp.asarray(make_mask(k, k, "A"))
    wz = params["z"]["w"] * mask[:, :, None, None]
    out = conv2d(zhat, wz, params["z"]["b"])
    return out + conv2d(x, params["x"]["w"], params["x"]["b"])


# ----------------------- masked transpose conv -----------------------


def masked_conv_transpose_apply(x, params, mask_type="A", padding="SAME"):
    """Transpose conv with the block-causal mask applied to the kernel
    (MaskedConvTranspose2d, masked_conv2d.py:96-107; reference marks
    these untested — provided for API parity)."""
    w = params["w"]
    kh, kw = w.shape[0], w.shape[1]
    m = jnp.asarray(make_mask(kh, kw, mask_type))
    w = w * m[:, :, None, None]
    out = lax.conv_transpose(
        x, w, strides=(1, 1), padding=padding, dimension_numbers=DN)
    return out + params["b"]


# ----------------------------- res blocks -----------------------------


def res_block_init(key, features, dtype=jnp.float32):
    """Dense residual block params (res_nets.py:7-30)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(features)
    return {
        "w": jax.random.uniform(kw, (features, features), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (features,), dtype, -bound, bound),
    }


def res_block_apply(x, params):
    """x + tanh(linear(x)) (res_nets.py:24-30)."""
    return x + jnp.tanh(x @ params["w"].T + params["b"])


def res_block2d_init(key, ch, k, mask_type="B", dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": masked_conv_init(k1, ch, ch, k, mask_type, dtype),
        "conv2": masked_conv_init(k2, ch, ch, k, mask_type, dtype),
    }


def res_block2d_apply(x, params, k, mask_type="B"):
    """x + mconv2(leaky_relu(mconv1(x))) (res_nets.py:56-66)."""
    mask = None
    if not (k == 1 and mask_type == "B"):
        mask = jnp.asarray(make_mask(k, k, mask_type))

    def mc(h, p):
        w = p["w"] if mask is None else p["w"] * mask[:, :, None, None]
        return conv2d(h, w, p["b"])

    h = jax.nn.leaky_relu(mc(x, params["conv1"]), LRELU_SLOPE)
    return x + mc(h, params["conv2"])
