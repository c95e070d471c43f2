"""Auxiliary layer variants: GDN1, channel-incremental conv, fused
zhat/x conv, masked transpose conv, res blocks — plus the image-plot and
Laplace utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbic_tpu.ops.extra_layers import (
    chinc_conv_apply,
    gdn1_apply,
    make_chinc_mask,
    masked_conv_transpose_apply,
    masked_conv_zhat_x_apply,
    masked_conv_zhat_x_init,
    res_block2d_apply,
    res_block2d_init,
    res_block_apply,
    res_block_init,
)
from lbic_tpu.ops.gdn import gdn_init
from lbic_tpu.ops.masked_conv import masked_conv_init


def test_gdn1_matches_closed_form():
    ch = 5
    params = gdn_init(ch)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, ch))
    y = gdn1_apply(x, params)
    # fresh init: beta=1, gamma=0.1*I  ->  y = x / (1 + 0.1 |x|)
    expect = x / (1.0 + 0.1 * jnp.abs(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(expect), atol=1e-5)
    # inverse undoes forward only approximately (like reference GDN1);
    # just check inverse multiplies
    yi = gdn1_apply(x, params, inverse=True)
    np.testing.assert_allclose(
        np.asarray(yi), np.asarray(x * (1.0 + 0.1 * jnp.abs(x))), atol=1e-5)


class TestChIncremental:
    def test_mask_up(self):
        # masked_conv2d.py docstring: iC=4 -> oC=8, K=2: out grp i*2:(i+1)*2
        # sees inputs 0:i+1
        m = make_chinc_mask(4, 8, grps=1)
        for i in range(4):
            assert m[: i + 1, 2 * i: 2 * i + 2].all()
            assert not m[i + 1:, 2 * i: 2 * i + 2].any()

    def test_mask_dn(self):
        m = make_chinc_mask(8, 4, grps=1)
        for i in range(4):
            assert m[: 2 * (i + 1), i].all()
            assert not m[2 * (i + 1):, i].any()

    def test_causality(self):
        """Perturbing input channel j only affects outputs allowed to see it."""
        cin, cout = 4, 8
        params = masked_conv_init(jax.random.PRNGKey(0), cin, cout, 1)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, cin))
        y0 = chinc_conv_apply(x, params)
        x2 = x.at[..., 3].add(1.0)
        y1 = chinc_conv_apply(x2, params)
        d = np.abs(np.asarray(y1 - y0)).sum(axis=(0, 1, 2))
        # channel 3 is visible only to output group 3 (channels 6:8)
        assert (d[:6] == 0).all() and (d[6:] > 0).all()


def test_masked_conv_zhat_x_is_sum_of_parts():
    key = jax.random.PRNGKey(0)
    params = masked_conv_zhat_x_init(key, cin_z=6, cin_x=6, cout=4, k=3)
    zhat = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 5, 6))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 5, 6))
    out = masked_conv_zhat_x_apply(zhat, x, params, k=3)
    # x path is 1x1: per-position linear; zhat path is 'A'-masked: the
    # centre position must not influence its own output
    zhat2 = zhat.at[0, 2, 2, :].add(10.0)
    out2 = masked_conv_zhat_x_apply(zhat2, x, params, k=3)
    np.testing.assert_array_equal(np.asarray(out[0, 2, 2]),
                                  np.asarray(out2[0, 2, 2]))
    # but a left neighbor does
    zhat3 = zhat.at[0, 2, 1, :].add(10.0)
    out3 = masked_conv_zhat_x_apply(zhat3, x, params, k=3)
    assert not np.array_equal(np.asarray(out[0, 2, 2]),
                              np.asarray(out3[0, 2, 2]))


def test_masked_transpose_shapes():
    params = masked_conv_init(jax.random.PRNGKey(0), 3, 5, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 3))
    y = masked_conv_transpose_apply(x, params, "A")
    assert y.shape == (1, 4, 4, 5)


def test_res_blocks():
    p = res_block_init(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    y = res_block_apply(x, p)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x + jnp.tanh(x @ p["w"].T + p["b"])),
        atol=1e-6)

    p2 = res_block2d_init(jax.random.PRNGKey(2), 6, 3, "B")
    h = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 5, 6))
    out = res_block2d_apply(h, p2, 3, "B")
    assert out.shape == h.shape
    # residual: zero convs -> identity
    pz = jax.tree.map(jnp.zeros_like, p2)
    np.testing.assert_array_equal(np.asarray(res_block2d_apply(h, pz, 3, "B")),
                                  np.asarray(h))


def test_image_plots(tmp_path):
    from lbic_tpu.utils.image_plots import rgb_histogram, show_image

    img = np.random.default_rng(0).uniform(-0.5, 0.5, (16, 16, 3))
    p = show_image(img, title="t", out_path=str(tmp_path / "img.png"))
    assert p and (tmp_path / "img.png").stat().st_size > 0
    h = rgb_histogram(img, out_path=str(tmp_path / "h.png"))
    assert set(h) == {"r", "g", "b"}
    assert sum(h["r"][0]) == 256


def test_laplace_sampler():
    from lbic_tpu.data.laplace import LaplaceSampler

    s = LaplaceSampler(mean=(0.0, 1.0), lamb=(1.0, 2.0))
    x = s.sample(jax.random.PRNGKey(0), 64, 8, 8)
    assert x.shape == (64, 8, 8, 2)
    m = np.asarray(x).mean(axis=(0, 1, 2))
    sd = np.asarray(x).std(axis=(0, 1, 2))
    np.testing.assert_allclose(m, [0.0, 1.0], atol=0.1)
    np.testing.assert_allclose(sd, s.stddev, rtol=0.1)


def test_update_model_tool(tmp_path):
    from lbic_tpu.tools.update_model import update_checkpoint
    from lbic_tpu.train import checkpoint as ckpt

    params = {"w": np.ones((2, 2), np.float32)}
    path = str(tmp_path / "model_best.pkl")
    ckpt.save(path, {"params": params, "opt_state": {"x": 1}})
    out = update_checkpoint(path, weights_only=True)
    assert "-" in out and out.endswith(".pkl")
    payload = ckpt.load(out)
    assert "opt_state" not in payload
    assert "cdf_tables" in payload
    assert payload["cdf_tables"]["cdf"].shape[0] == 64


def test_results_parser(tmp_path):
    import json

    from lbic_tpu.tools.results_parser import collect, plot

    d = tmp_path / "exp_1"
    d.mkdir()
    (d / "results.json").write_text(json.dumps(
        {"b0": {"dist": 0.1, "rate": 1.0}, "b1": {"dist": 0.2, "rate": 0.5}}))
    res = collect(str(tmp_path))
    assert "exp_1" in res
    out = plot(res, str(tmp_path / "s.png"))
    assert (tmp_path / "s.png").stat().st_size > 0
