import jax
import jax.numpy as jnp
import numpy as np

from lbic_tpu.ops.masked_conv import (
    conv_apply,
    make_mask,
    mask_offsets,
    masked_conv_init,
)


def test_mask_semantics():
    """Masks must match graphs/layers/masked_conv2d.py:9-17 exactly."""
    # 3x3 'A': full row above, left-of-centre only in centre row, zero below.
    np.testing.assert_array_equal(
        make_mask(3, 3, "A"),
        np.array([[1, 1, 1], [1, 0, 0], [0, 0, 0]], np.float32),
    )
    np.testing.assert_array_equal(
        make_mask(3, 3, "B"),
        np.array([[1, 1, 1], [1, 1, 0], [0, 0, 0]], np.float32),
    )
    np.testing.assert_array_equal(make_mask(1, 1, "A"), np.zeros((1, 1), np.float32))
    np.testing.assert_array_equal(make_mask(1, 1, "B"), np.ones((1, 1), np.float32))
    np.testing.assert_array_equal(
        make_mask(5, 5, "A")[2], np.array([1, 1, 0, 0, 0], np.float32)
    )


def test_mask_offsets():
    offs = set(mask_offsets(3, 3, "A"))
    assert offs == {(-1, -1), (-1, 0), (-1, 1), (0, -1)}
    offs_b = set(mask_offsets(3, 3, "B"))
    assert offs_b == offs | {(0, 0)}


def test_masked_conv_causality(rng):
    """Output at (v,h) must not change when inputs at non-dependency
    positions change."""
    key = jax.random.PRNGKey(0)
    p = masked_conv_init(key, 4, 6, 3, "A")
    mask = jnp.asarray(make_mask(3, 3, "A"))
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    out = conv_apply(x, p, mask)
    # perturb a disallowed position: centre itself and to the right/below
    for (dv, dh) in [(0, 0), (0, 1), (1, 0), (1, 1), (1, -1)]:
        x2 = x.at[0, 4 + dv, 4 + dh, :].add(100.0)
        out2 = conv_apply(x2, p, mask)
        assert jnp.allclose(out[0, 4, 4], out2[0, 4, 4]), (dv, dh)
    # perturb an allowed position: output must change
    x3 = x.at[0, 3, 5, :].add(100.0)  # upper-right: allowed for 'A'
    out3 = conv_apply(x3, p, mask)
    assert not jnp.allclose(out[0, 4, 4], out3[0, 4, 4])


def test_masked_grad_zero_at_masked_taps(rng):
    key = jax.random.PRNGKey(1)
    p = masked_conv_init(key, 2, 3, 3, "A")
    mask = jnp.asarray(make_mask(3, 3, "A"))
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 2)), jnp.float32)

    def loss(params):
        return jnp.sum(conv_apply(x, params, mask) ** 2)

    g = jax.grad(loss)(p)
    gw = np.asarray(g["w"])  # (kh, kw, cin, cout)
    m = np.asarray(mask)
    assert np.all(gw[m == 0] == 0)
    assert np.any(gw[m == 1] != 0)
