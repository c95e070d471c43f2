"""EntropyBottleneck (factorized prior) tests."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from lbic_tpu.ops import entropy_bottleneck as eb


def test_likelihood_is_a_pmf():
    p = eb.eb_init(4, key=jax.random.PRNGKey(0))
    # sum over integer grid should be ~1 per channel
    grid = jnp.arange(-30, 31).astype(jnp.float32)
    v = jnp.tile(grid[:, None], (1, 4))
    lik = eb.eb_likelihood(p, v)
    s = np.asarray(jnp.sum(lik, axis=0))
    assert np.all(s > 0.97) and np.all(s < 1.001), s


def test_forward_modes():
    p = eb.eb_init(3, key=jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (16, 3)) * 3
    xq, lik = eb.eb_forward(p, x, key=jax.random.PRNGKey(3), training=True)
    assert np.all(np.abs(np.asarray(xq - x)) <= 0.5)
    xq2, lik2 = eb.eb_forward(p, x, training=False)
    med = eb.eb_medians(p)
    np.testing.assert_allclose(
        np.asarray(xq2), np.asarray(jnp.round(x - med) + med), atol=1e-6)
    assert np.all(np.asarray(lik2) > 0)


def test_aux_loss_trains_quantiles():
    p = eb.eb_init(2, key=jax.random.PRNGKey(0))
    opt = optax.adam(0.05)
    qs = p["quantiles"]
    state = opt.init(qs)
    loss0 = float(eb.eb_aux_loss(p))

    @jax.jit
    def step(qs, state):
        def f(qs):
            return eb.eb_aux_loss({**p, "quantiles": qs})

        l, g = jax.value_and_grad(f)(qs)
        upd, state = opt.update(g, state)
        return optax.apply_updates(qs, upd), state, l

    for _ in range(200):
        qs, state, l = step(qs, state)
    assert float(l) < loss0 * 0.5, (loss0, float(l))


def test_roundtrip():
    p = eb.eb_init(4, key=jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = rng.normal(0, 2.0, (2, 5, 5, 4)).astype(np.float32)
    tables = eb.eb_update(p)
    streams = eb.eb_compress(p, x, tables)
    xhat = eb.eb_decompress(p, streams, x.shape[1:], tables)
    med = np.asarray(eb.eb_medians(p))
    expect = np.round(x - med) + med
    np.testing.assert_allclose(xhat, expect, atol=1e-5)
