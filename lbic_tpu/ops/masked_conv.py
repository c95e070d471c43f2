"""Block-level masked convolutions (PixelCNN-style masks at block granularity).

Semantics match the reference graphs/layers/masked_conv2d.py:5-21:
  * mask type 'A': the centre row keeps only taps strictly left of centre,
    rows below centre are zero, rows ABOVE centre are fully kept (including
    upper-RIGHT taps — this is why the wavefront schedule needs a lag of
    reach+1 per row, see lbic_tpu/engine/wavefront.py).
  * mask type 'B': like 'A' but the centre tap is kept.
  * a 1x1 'A' conv is identically zero; a 1x1 'B' conv is a plain conv.

Unlike the reference (which multiplies the weights by the mask in-place every
forward call, pinning them at zero), we store weights unmasked and multiply by
the mask constant at apply time: w_eff = w * mask. Gradients through w_eff are
zero at masked positions, which is equivalent, and keeps apply a pure function.

Layout: activations NHWC, weights HWIO. XLA lowers 1x1 convs to MXU matmuls.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DN = ("NHWC", "HWIO", "NHWC")


def make_mask(kh, kw, mask_type):
    """(kh, kw) float mask. Reference: masked_conv2d.py:9-17."""
    assert mask_type in ("A", "B")
    m = np.ones((kh, kw), dtype=np.float32)
    if kw > 1 or mask_type == "A":
        m[kh // 2, kw // 2 + (mask_type == "B"):] = 0
    if kh > 1:
        m[kh // 2 + 1:, :] = 0
    return m


def mask_offsets(kh, kw, mask_type):
    """Active tap offsets [(dv, dh)] relative to centre (dv<0 is above)."""
    m = make_mask(kh, kw, mask_type)
    offs = []
    for i in range(kh):
        for j in range(kw):
            if m[i, j]:
                offs.append((i - kh // 2, j - kw // 2))
    return offs


def masked_conv_init(key, cin, cout, k, mask_type="B", dtype=jnp.float32):
    """Init a conv layer {'w': (k,k,cin,cout), 'b': (cout,)}.

    Matches torch nn.Conv2d defaults: kaiming_uniform(a=sqrt(5)) on the
    weight => U(-1/sqrt(fan_in), 1/sqrt(fan_in)) * sqrt(3)... torch's exact
    bound is sqrt(6/((1+5)*fan_in)) = 1/sqrt(fan_in); bias U(+-1/sqrt(fan_in)).
    """
    kw, kb = jax.random.split(key)
    fan_in = cin * k * k
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (k, k, cin, cout), dtype, -bound, bound)
    b = jax.random.uniform(kb, (cout,), dtype, -bound, bound)
    return {"w": w, "b": b}


def conv2d(x, w, b=None, padding="SAME"):
    # Output dtype follows the input (bf16 under AMP). The TPU MXU always
    # accumulates bf16 operands in f32 internally, so no preferred_element_type
    # override is needed — and forcing an f32 output would make the conv
    # transpose rule see an f32 cotangent against bf16 operands (a dtype
    # error under grad).
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding=padding,
        dimension_numbers=DN,
    )
    if b is not None:
        out = out + b
    return out


def conv_apply(x, params, mask=None, padding="SAME"):
    """Apply a (masked) conv. `mask` is (kh, kw) or None for unmasked."""
    w = params["w"]
    if mask is not None:
        w = w * mask[:, :, None, None].astype(w.dtype)
    return conv2d(x, w, params["b"], padding)


def center_tap(params, mask=None):
    """(cin, cout) centre tap of a conv — the effective kernel when a 'B'
    masked conv is applied to a 1x1 (zero-padded) input. Used by the
    per-block fast paths (reference net.py:379-398: F.conv2d(..., padding=0)
    on pre-extracted windows makes every k>1 'B' layer act via its centre
    tap only when its input is a single position)."""
    w = params["w"]
    kh, kw = w.shape[0], w.shape[1]
    if mask is not None:
        w = w * mask[:, :, None, None].astype(w.dtype)
    return w[kh // 2, kw // 2]
