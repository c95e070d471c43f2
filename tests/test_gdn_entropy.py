import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from lbic_tpu.ops import (
    build_gaussian_cdfs,
    build_indexes,
    gaussian_likelihood,
    gdn_apply,
    gdn_init,
    get_scale_table,
    lower_bound,
    quantize_dequantize,
    quantize_noise,
    quantize_symbols,
)
from lbic_tpu.ops.bound import nonneg_apply, nonneg_init


def test_lower_bound_forward_and_grad():
    x = jnp.array([-1.0, 0.5, 2.0])
    np.testing.assert_allclose(lower_bound(x, 0.5), [0.5, 0.5, 2.0])

    # gradient: passes when x >= bound, or when pushing up (g < 0)
    def f(x):
        return jnp.sum(lower_bound(x, 0.5) * jnp.array([1.0, 1.0, 1.0]))

    g = jax.grad(f)(x)
    np.testing.assert_allclose(g, [0.0, 1.0, 1.0])

    def f2(x):
        return jnp.sum(lower_bound(x, 0.5) * jnp.array([-1.0, -1.0, -1.0]))

    g2 = jax.grad(f2)(x)
    np.testing.assert_allclose(g2, [-1.0, -1.0, -1.0])  # negative g passes


def test_nonneg_roundtrip():
    v = jnp.array([0.0, 0.1, 1.0, 5.0])
    p = nonneg_init(v)
    np.testing.assert_allclose(nonneg_apply(p), v, atol=1e-6)


def test_gdn_closed_form(rng):
    """y = x / sqrt(beta + sum_j gamma[i,j] x_j^2), init beta=1, gamma=0.1*I
    (graphs/layers/gdn_compressai.py:26-80)."""
    C = 5
    p = gdn_init(C)
    x = jnp.asarray(rng.standard_normal((2, 3, 4, C)), jnp.float32)
    y = gdn_apply(x, p)
    expected = np.asarray(x) / np.sqrt(1.0 + 0.1 * np.asarray(x) ** 2)
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5, atol=1e-6)
    # inverse multiplies
    yi = gdn_apply(x, p, inverse=True)
    np.testing.assert_allclose(
        np.asarray(yi), np.asarray(x) * np.sqrt(1.0 + 0.1 * np.asarray(x) ** 2),
        rtol=1e-5, atol=1e-6,
    )


def test_gaussian_likelihood_matches_normal_cdf(rng):
    y = jnp.asarray(rng.standard_normal((64,)) * 3, jnp.float32)
    mu = jnp.asarray(rng.standard_normal((64,)), jnp.float32)
    sig = jnp.asarray(rng.uniform(0.2, 4.0, (64,)), jnp.float32)
    lik = np.asarray(gaussian_likelihood(y, sig, mu))
    v = np.abs(np.asarray(y) - np.asarray(mu))
    exp = scipy.stats.norm.cdf((0.5 - v) / np.asarray(sig)) - scipy.stats.norm.cdf(
        (-0.5 - v) / np.asarray(sig)
    )
    np.testing.assert_allclose(lik, exp, rtol=1e-4, atol=1e-7)


def test_scale_lower_bound_applies():
    lik_lo = gaussian_likelihood(jnp.zeros(1), jnp.array([1e-4]))
    lik_bound = gaussian_likelihood(jnp.zeros(1), jnp.array([0.11]))
    np.testing.assert_allclose(np.asarray(lik_lo), np.asarray(lik_bound))


def test_quantizers(rng):
    y = jnp.asarray(rng.standard_normal((32,)) * 5, jnp.float32)
    mu = jnp.asarray(rng.standard_normal((32,)), jnp.float32)
    s = quantize_symbols(y, mu)
    np.testing.assert_array_equal(np.asarray(s), np.round(np.asarray(y - mu)))
    d = quantize_dequantize(y, mu)
    np.testing.assert_allclose(np.asarray(d), np.asarray(s) + np.asarray(mu), rtol=1e-6)
    n = quantize_noise(y, jax.random.PRNGKey(0))
    assert np.all(np.abs(np.asarray(n - y)) <= 0.5)


def test_build_indexes_matches_reference_bucketing(rng):
    table = get_scale_table()
    scales = jnp.asarray(rng.uniform(0.01, 300.0, (1000,)), jnp.float32)
    idx = np.asarray(build_indexes(scales, table))
    # reference semantics (entropy_layers_cai.py:649-654)
    t = np.asarray(table)
    sc = np.maximum(np.asarray(scales), 0.11)
    exp = np.full(sc.shape, len(t) - 1, np.int32)
    for s in t[:-1]:
        exp -= (sc <= s).astype(np.int32)
    np.testing.assert_array_equal(idx, exp)
    assert idx.min() >= 0 and idx.max() <= len(t) - 1


def test_build_gaussian_cdfs_shapes_and_validity():
    table = np.asarray(get_scale_table())
    tabs = build_gaussian_cdfs(table)
    cdf, lens, offs = tabs["cdf"], tabs["cdf_lengths"], tabs["offsets"]
    assert cdf.shape[0] == 64 and lens.shape == (64,) and offs.shape == (64,)
    for i in range(64):
        row = cdf[i, : lens[i]]
        assert row[0] == 0 and row[-1] == 1 << 16
        assert np.all(np.diff(row) > 0)
    # pmf center symmetric: offsets = -(len-3)/2 ... lens = 2c+3
    assert np.all(lens == -2 * offs + 3)
    # rate sanity: expected bits of a unit gaussian under the sigma=1 row
    i = int(np.argmin(np.abs(table - 1.0)))
    row = cdf[i, : lens[i]]
    p = np.diff(row).astype(np.float64) / (1 << 16)
    c = -offs[i]
    samples = np.round(np.random.default_rng(0).standard_normal(20000)).astype(int) + c
    samples = np.clip(samples, 0, lens[i] - 3)
    bits = -np.log2(p[samples]).mean()
    # differential entropy of round(N(0,1)) ~= 2.1 bits
    assert 1.8 < bits < 2.4


def test_cdf_cpp_matches_numpy():
    from lbic_tpu.coding.api import backend_name, pmf_to_quantized_cdf_cpp
    from lbic_tpu.coding.cdf import pmf_to_quantized_cdf_np

    if backend_name() != "cpp":
        pytest.skip("no C++ backend")
    rng = np.random.default_rng(3)
    for _ in range(20):
        n = int(rng.integers(2, 80))
        pmf = rng.uniform(0, 1, n)
        pmf[rng.integers(0, n)] = 0.0  # force a zero-frequency repair
        pmf = np.append(pmf / pmf.sum() * 0.999, 1e-9)
        np.testing.assert_array_equal(
            pmf_to_quantized_cdf_cpp(pmf), pmf_to_quantized_cdf_np(pmf)
        )
