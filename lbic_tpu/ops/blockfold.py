"""Block fold/unfold: space-to-depth with B x B blocks.

TPU-native equivalent of the reference's python-loop helpers
`arrange_block_pixels_to_channel_dim` / `arrange_channel_dim_to_block_pixels`
(agents/blkbsdimgcomp_agent.py:853-873): a single reshape/transpose pair, so
XLA lowers it to a layout change instead of B*B strided copies.

Layout: activations are NHWC. A folded image has shape (N, H/B, W/B, 3*B*B)
where channel index (v*B + h)*C + c holds pixel (v, h) of each block, channel
c — the exact channel ordering of the reference (so imported PyTorch conv
weights line up after OIHW->HWIO transposition).
"""

import jax.numpy as jnp


def block_fold(x, B):
    """(N, H, W, C) -> (N, H/B, W/B, C*B*B) with reference channel order.

    Channel (v*B+h)*C + c of output position (i, j) equals x[:, i*B+v, j*B+h, c].
    """
    if B == 1:
        return x
    N, H, W, C = x.shape
    assert H % B == 0 and W % B == 0, f"H={H}, W={W} not multiples of B={B}"
    x = x.reshape(N, H // B, B, W // B, B, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # N, H/B, W/B, v, h, c
    return x.reshape(N, H // B, W // B, B * B * C)


def block_unfold(y, B):
    """(N, Hb, Wb, C*B*B) -> (N, Hb*B, Wb*B, C). Inverse of block_fold."""
    if B == 1:
        return y
    N, Hb, Wb, CB2 = y.shape
    C = CB2 // (B * B)
    y = y.reshape(N, Hb, Wb, B, B, C)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # N, Hb, v, Wb, h, c
    return y.reshape(N, Hb * B, Wb * B, C)


def pad_to_block_multiple(x, B):
    """Replicate-pad (N, H, W, C) on bottom/right to multiples of B.

    Mirrors eval-time padding at agents/blkbsdimgcomp_agent.py:582-586
    (F.pad mode='replicate'). Returns (padded, (pad_bottom, pad_right)).
    """
    N, H, W, C = x.shape
    new_h = (H + B - 1) // B * B
    new_w = (W + B - 1) // B * B
    pb, pr = new_h - H, new_w - W
    if pb == 0 and pr == 0:
        return x, (0, 0)
    x = jnp.pad(x, ((0, 0), (0, pb), (0, pr), (0, 0)), mode="edge")
    return x, (pb, pr)
