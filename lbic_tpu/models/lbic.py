"""Block-based learned image compression models (v4 and v9).

Architecture parity with graphs/models/BlockBasedImgCompLossy_net.py:
  * v4 (net.py:21-106): analysis g_a = 1x1 'B' on x  +  K1 'A' on zhat,
    then [GDN, 'B' K2, GDN, 'B' K3, GDN, 'B' K4] -> M channels; synthesis
    mirrors with IGDN; entropy-parameter net from zhat alone:
    ['A' K1, LReLU, 'B' K2, LReLU, 'B' K3, LReLU, 'B' K4] -> 2M (sigma, mu).
  * v9 (net.py:251-317): channel schedule C = (N, 7N/8, 6N/8, M), transform
    kernels (K1, 1, 1, 1); decoder kernel order (K1, K4, K3, K2); entropy
    net channels (12N/8, 10N/8, N, 2M) with kernels (KS[0], KS[1], 1, 1).

Everything is a pure function over NHWC block-folded arrays; params is a
pytree whose keys are the torch module names (prtr_forward1, ...,
get_meanscale.{0,2,4,6}) so PyTorch checkpoints import by name.

Two compute paths:
  * *_full: whole-image, SAME padding — open-loop training/validation
    (1 spatial position = 1 block; causality via weight masks only).
  * *_block / meanscale_window: per-block VALID-padding paths on gathered
    neighbor windows, batched over a wavefront — the codec hot path
    (reference's single-block versions: net.py:379-398). 1x1-dominated,
    so they run as plain MXU matmuls on (D, C) tensors.
"""

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lbic_tpu.ops import entropy as ent
from lbic_tpu.ops.gdn import gdn_apply, gdn_init
from lbic_tpu.ops.masked_conv import (
    center_tap,
    conv_apply,
    make_mask,
    masked_conv_init,
)

LRELU_SLOPE = 0.01  # torch nn.LeakyReLU default


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    cin: int
    cout: int
    k: int
    mask_type: str  # 'A' | 'B'


@dataclasses.dataclass(frozen=True)
class ModelDef:
    net_version: str
    B: int
    KS: Tuple[int, int, int, int]
    N: int
    M: int
    # conv specs
    f1: ConvSpec
    f2: ConvSpec
    f3: Tuple[ConvSpec, ConvSpec, ConvSpec]  # convs at Sequential idx 1,3,5
    i1: ConvSpec
    i2: ConvSpec
    i3: Tuple[ConvSpec, ConvSpec, ConvSpec]
    ms: Tuple[ConvSpec, ConvSpec, ConvSpec, ConvSpec]  # Sequential idx 0,2,4,6

    @property
    def cx(self) -> int:
        return 3 * self.B * self.B

    @property
    def lru(self) -> int:
        """Half-width of the zhat neighborhood the codec must expose:
        sum of k//2 over KS (agents/blkbsdimgcomp_agent.py:487)."""
        return sum(k // 2 for k in self.KS)

    @property
    def ms_lru(self) -> int:
        """Entropy-net receptive half-width (window size for meanscale)."""
        return sum(s.k // 2 for s in self.ms)

    @property
    def tr_lru(self) -> int:
        """Transform receptive half-width on zhat (f2/i2 kernel)."""
        return self.f2.k // 2


def make_model_def(cfg) -> ModelDef:
    B, KS, N, M = cfg.block_size, tuple(cfg.KS), cfg.N, cfg.M
    cx = 3 * B * B
    K1, K2, K3, K4 = KS
    if cfg.net_version == "v4":
        C1 = C2 = C3 = N
        f3 = (ConvSpec(C1, C2, K2, "B"), ConvSpec(C2, C3, K3, "B"),
              ConvSpec(C3, M, K4, "B"))
        i3 = (ConvSpec(C1, C2, K2, "B"), ConvSpec(C2, C3, K3, "B"),
              ConvSpec(C3, cx, K4, "B"))
        ms = (ConvSpec(cx, C1, K1, "A"), ConvSpec(C1, C2, K2, "B"),
              ConvSpec(C2, C3, K3, "B"), ConvSpec(C3, 2 * M, K4, "B"))
    elif cfg.net_version == "v9":
        C1, C2, C3 = N, N // 8 * 7, N // 8 * 6
        # v9 transform kernels are (K1, 1, 1, 1) regardless of KS[1:]
        # (net.py:265); decoder kernel order (K1, K4, K3, K2) with all 1
        # (net.py:286-293).
        f3 = (ConvSpec(C1, C2, 1, "B"), ConvSpec(C2, C3, 1, "B"),
              ConvSpec(C3, M, 1, "B"))
        i3 = (ConvSpec(C1, C2, 1, "B"), ConvSpec(C2, C3, 1, "B"),
              ConvSpec(C3, cx, 1, "B"))
        E1, E2, E3 = N // 8 * 12, N // 8 * 10, N // 8 * 8
        # entropy net kernels (KS[0], KS[1], 1, 1) (net.py:296)
        ms = (ConvSpec(cx, E1, K1, "A"), ConvSpec(E1, E2, K2, "B"),
              ConvSpec(E2, E3, 1, "B"), ConvSpec(E3, 2 * M, 1, "B"))
    else:
        raise ValueError(f"unknown net_version {cfg.net_version}")
    return ModelDef(
        net_version=cfg.net_version, B=B, KS=KS, N=N, M=M,
        f1=ConvSpec(cx, C1, 1, "B"),
        f2=ConvSpec(cx, C1, K1, "A"),
        f3=f3,
        i1=ConvSpec(M, C1, 1, "B"),
        i2=ConvSpec(cx, C1, K1, "A"),
        i3=i3,
        ms=ms,
    )


def _mask(spec: ConvSpec):
    if spec.k == 1 and spec.mask_type == "B":
        return None  # plain conv
    return jnp.asarray(make_mask(spec.k, spec.k, spec.mask_type))


def init_params(md: ModelDef, key, dtype=jnp.float32):
    keys = jax.random.split(key, 16)
    ki = iter(keys)

    def conv(spec):
        return masked_conv_init(next(ki), spec.cin, spec.cout, spec.k, spec.mask_type, dtype)

    def stack(specs, gdn_chs):
        d = {}
        for i, ch in enumerate(gdn_chs):
            d[str(2 * i)] = gdn_init(ch, dtype)
        for i, s in enumerate(specs):
            d[str(2 * i + 1)] = conv(s)
        return d

    p = {
        "prtr_forward1": conv(md.f1),
        "prtr_forward2": conv(md.f2),
        "prtr_forward3": stack(md.f3, (md.f1.cout, md.f3[0].cout, md.f3[1].cout)),
        "prtr_inverse1": conv(md.i1),
        "prtr_inverse2": conv(md.i2),
        "prtr_inverse3": stack(md.i3, (md.i1.cout, md.i3[0].cout, md.i3[1].cout)),
        "get_meanscale": {str(2 * i): conv(s) for i, s in enumerate(md.ms)},
    }
    return p


# ------------------------------ full paths ------------------------------


def _stack_apply(md_specs, params, h, inverse):
    for i, spec in enumerate(md_specs):
        h = gdn_apply(h, params[str(2 * i)], inverse=inverse)
        h = conv_apply(h, params[str(2 * i + 1)], _mask(spec))
    return h


def analysis_full(md: ModelDef, params, zhat, x):
    """g_a: y = f3(f1(x) + f2(zhat)) (net.py:80-83)."""
    h = conv_apply(x, params["prtr_forward1"], None)
    h = h + conv_apply(zhat, params["prtr_forward2"], _mask(md.f2))
    return _stack_apply(md.f3, params["prtr_forward3"], h, inverse=False)


def synthesis_full(md: ModelDef, params, zhat, y_qnt):
    """g_s: xhat = i3(i1(y_qnt) + i2(zhat)) (net.py:85-88)."""
    h = conv_apply(y_qnt, params["prtr_inverse1"], None)
    h = h + conv_apply(zhat, params["prtr_inverse2"], _mask(md.i2))
    return _stack_apply(md.i3, params["prtr_inverse3"], h, inverse=True)


def meanscale_full(md: ModelDef, params, zhat):
    """Entropy-parameter net on zhat only -> (scales, means) (net.py:63-71)."""
    h = zhat
    for i, spec in enumerate(md.ms):
        h = conv_apply(h, params["get_meanscale"][str(2 * i)], _mask(spec))
        if i < len(md.ms) - 1:
            h = jax.nn.leaky_relu(h, LRELU_SLOPE)
    scales, means = jnp.split(h, 2, axis=-1)
    return scales, means


def forward_open_loop(md: ModelDef, params, zhat, x, key=None, training=False):
    """Open-loop forward: all blocks in parallel (net.py:90-106).

    Returns (xhat, self_info) with self_info = -log2 p(y_qnt)."""
    y = analysis_full(md, params, zhat, x)
    scales, means = meanscale_full(md, params, zhat)
    if training:
        y_qnt = ent.quantize_noise(y, key)
    else:
        y_qnt = ent.quantize_dequantize(y, means)
    lik = ent.gaussian_likelihood(y_qnt, scales, means)
    self_info = -jnp.log2(lik)
    xhat = synthesis_full(md, params, zhat, y_qnt)
    return xhat, self_info


# --------------------------- per-block paths ---------------------------
#
# These operate on batched windows gathered by the wavefront engine:
#   zwin : (D, W, W, cx) zhat neighborhood, W = 2*ms_lru+1 (meanscale) or
#          2*tr_lru+1 (transforms); uncommitted entries are zero, matching
#          the zero 'SAME' padding of the full paths.
#   xblk : (D, cx) the current block.
# All matmul-shaped -> MXU.


def _center_matmul(h, params, spec):
    w = center_tap(params, _mask(spec))
    return h @ w + params["b"]


def _valid_conv(h, params, spec):
    return conv_apply(h, params, _mask(spec), padding="VALID")


def analysis_block(md: ModelDef, params, zwin, xblk):
    """y for one block; zwin is the (2*tr_lru+1)^2 core (net.py:379-382)."""
    h = xblk @ params["prtr_forward1"]["w"][0, 0] + params["prtr_forward1"]["b"]
    hz = _valid_conv(zwin, params["prtr_forward2"], md.f2)
    h = h + hz[:, 0, 0, :]
    p3 = params["prtr_forward3"]
    for i, spec in enumerate(md.f3):
        h = gdn_apply(h, p3[str(2 * i)], inverse=False)
        h = _center_matmul(h, p3[str(2 * i + 1)], spec)
    return h


def synthesis_block(md: ModelDef, params, zwin, y_qnt_blk):
    """xhat for one block (net.py:384-387)."""
    h = y_qnt_blk @ params["prtr_inverse1"]["w"][0, 0] + params["prtr_inverse1"]["b"]
    hz = _valid_conv(zwin, params["prtr_inverse2"], md.i2)
    h = h + hz[:, 0, 0, :]
    p3 = params["prtr_inverse3"]
    for i, spec in enumerate(md.i3):
        h = gdn_apply(h, p3[str(2 * i)], inverse=True)
        h = _center_matmul(h, p3[str(2 * i + 1)], spec)
    return h


# ------------------------- v4 window paths -------------------------
#
# v4's codec (reference net.py:144-248) runs the FULL SAME-padded forward
# on a cropped window [v-U : v+1, h-L : h+R+1] of (zhat, x, y_qnt) and
# takes the centre — so, unlike v9, a block's latent depends on neighbor
# blocks' x (through f3's 'B' k>1 convs) and its reconstruction on
# neighbors' committed y_qnt (through i1/i3). We reproduce this exactly on
# FIXED (U+1, 2L+1) windows gathered from zero-padded state, with an
# in-image mask applied after every conv: the reference's variable crop +
# per-layer SAME zero-padding makes activations outside the crop exact
# zeros at each layer; GDN/LeakyReLU preserve zeros, conv biases don't —
# hence mask-after-conv reproduces the cropped computation bit-for-bit.


def _conv_same_masked(h, params, spec, inmask):
    h = conv_apply(h, params, _mask(spec), padding="SAME")
    return h * inmask


def v4_stack_window(specs, params, h, inmask, inverse):
    for i, spec in enumerate(specs):
        h = gdn_apply(h, params[str(2 * i)], inverse=inverse)
        h = _conv_same_masked(h, params[str(2 * i + 1)], spec, inmask)
    return h


def v4_analysis_window(md: ModelDef, params, zwin, xwin, inmask):
    """y over the window; caller takes the centre (net.py:189-191).

    zwin/xwin: (D, U+1, 2L+1, cx); inmask: (D, U+1, 2L+1, 1)."""
    h = conv_apply(xwin, params["prtr_forward1"], None)
    h = h + conv_apply(zwin, params["prtr_forward2"], _mask(md.f2))
    h = h * inmask
    return v4_stack_window(md.f3, params["prtr_forward3"], h, inmask,
                           inverse=False)


def v4_synthesis_window(md: ModelDef, params, zwin, yqwin, inmask):
    """xhat over the window (net.py:200-201); yqwin holds committed
    neighbor latents with the centre set to this block's y_qnt."""
    h = conv_apply(yqwin, params["prtr_inverse1"], None)
    h = h + conv_apply(zwin, params["prtr_inverse2"], _mask(md.i2))
    h = h * inmask
    return v4_stack_window(md.i3, params["prtr_inverse3"], h, inmask,
                           inverse=True)


def v4_meanscale_window(md: ModelDef, params, zwin, inmask):
    """(sigma, mu) over the window (net.py:192-193)."""
    h = zwin
    for i, spec in enumerate(md.ms):
        h = _conv_same_masked(h, params["get_meanscale"][str(2 * i)], spec,
                              inmask)
        if i < len(md.ms) - 1:
            h = jax.nn.leaky_relu(h, LRELU_SLOPE)
    scales, means = jnp.split(h, 2, axis=-1)
    return scales, means


def meanscale_window(md: ModelDef, params, zwin):
    """(sigma, mu) for one block from its (2*ms_lru+1)^2 zhat window
    (net.py:389-398: successive VALID convs shrink the window to 1x1)."""
    h = zwin
    for i, spec in enumerate(md.ms):
        if spec.k > 1:
            h = _valid_conv(h, params["get_meanscale"][str(2 * i)], spec)
        else:
            h = _center_matmul(h, params["get_meanscale"][str(2 * i)], spec)
        if i < len(md.ms) - 1:
            h = jax.nn.leaky_relu(h, LRELU_SLOPE)
    h = h.reshape(h.shape[0], -1)
    assert h.shape[-1] == 2 * md.M, h.shape
    scales, means = jnp.split(h, 2, axis=-1)
    return scales, means
