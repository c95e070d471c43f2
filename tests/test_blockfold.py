import numpy as np

from lbic_tpu.ops import block_fold, block_unfold
from lbic_tpu.ops.blockfold import pad_to_block_multiple


def reference_fold(x, B):
    """Direct port of the loop semantics at agents/blkbsdimgcomp_agent.py:853-860
    (numpy, NHWC) used only as a test oracle."""
    N, H, W, C = x.shape
    y = np.empty((N, H // B, W // B, C * B * B), dtype=x.dtype)
    for v in range(B):
        for h in range(B):
            ind = (v * B + h) * C
            y[..., ind : ind + C] = x[:, v::B, h::B, :]
    return y


def test_fold_matches_reference_ordering(rng):
    x = rng.standard_normal((2, 16, 24, 3)).astype(np.float32)
    for B in (1, 2, 4, 8):
        got = np.asarray(block_fold(x, B))
        np.testing.assert_array_equal(got, reference_fold(x, B))


def test_fold_unfold_roundtrip(rng):
    x = rng.standard_normal((3, 32, 16, 3)).astype(np.float32)
    for B in (2, 4, 8, 16):
        y = block_fold(x, B)
        assert y.shape == (3, 32 // B, 16 // B, 3 * B * B)
        np.testing.assert_array_equal(np.asarray(block_unfold(y, B)), x)


def test_pad_to_block_multiple(rng):
    x = rng.standard_normal((1, 10, 13, 3)).astype(np.float32)
    p, (pb, pr) = pad_to_block_multiple(x, 8)
    assert p.shape == (1, 16, 16, 3) and (pb, pr) == (6, 3)
    np.testing.assert_array_equal(np.asarray(p)[:, :10, :13], x)
    # replicate padding
    np.testing.assert_array_equal(
        np.asarray(p)[0, 10:, 5],
        np.broadcast_to(np.asarray(p)[0, 9, 5], (6, 3)),
    )
