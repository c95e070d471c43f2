"""EntropyBottleneck — Ballé-style factorized prior, pure JAX.

Functional re-implementation of the vendored CompressAI class
(graphs/layers/entropy_layers_cai.py:297-514): a per-channel monotone MLP
models the latent CDF with filters (3, 3, 3, 3); likelihood is the
difference of sigmoids of the cumulative logits at v +- 0.5; `update`
builds quantized CDF tables for the rANS coder over the per-channel
[minima, maxima] support around the learned medians.

Not used by the shipped v4/v9 models (they are purely conditional-Gaussian,
net.py:127-142 instantiates none) but part of the reference's entropy-model
surface, so provided for parity — e.g. for hyper-prior style extensions."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from lbic_tpu.ops.bound import lower_bound

FILTERS = (3, 3, 3, 3)
INIT_SCALE = 10.0
TAIL_MASS = 1e-9
LIKELIHOOD_BOUND = 1e-9


def eb_init(ch, filters=FILTERS, init_scale=INIT_SCALE, key=None):
    """Params for a C-channel bottleneck (entropy_layers_cai.py:313-340)."""
    filters = (1,) + tuple(filters) + (1,)
    scale = init_scale ** (1 / (len(filters) - 1))
    key = key if key is not None else jax.random.PRNGKey(0)
    params = {"matrices": [], "biases": [], "factors": []}
    for i in range(len(filters) - 1):
        init = math.log(math.expm1(1 / scale))
        m = jnp.full((ch, filters[i + 1], filters[i]), init)
        key, k = jax.random.split(key)
        b = jax.random.uniform(k, (ch, filters[i + 1], 1), minval=-0.5,
                               maxval=0.5)
        params["matrices"].append(m)
        params["biases"].append(b)
        if i < len(filters) - 2:
            params["factors"].append(jnp.zeros((ch, filters[i + 1], 1)))
    # quantile targets: medians + tail points (entropy:318-321)
    params["quantiles"] = jnp.tile(
        jnp.array([-init_scale, 0.0, init_scale]), (ch, 1, 1))
    return params


def _logits_cumulative(params, inputs):
    """inputs: (C, 1, N) -> logits (C, 1, N) (entropy:399-423)."""
    logits = inputs
    n = len(params["matrices"])
    for i in range(n):
        m = jax.nn.softplus(params["matrices"][i])
        logits = jnp.einsum("cij,cjn->cin", m, logits)
        logits = logits + params["biases"][i]
        if i < n - 1:
            f = jnp.tanh(params["factors"][i])
            logits = logits + f * jnp.tanh(logits)
    return logits


def eb_medians(params):
    return params["quantiles"][:, 0, 1]


def eb_likelihood(params, v):
    """v: (..., C) noisy/dequantized latents -> likelihood (..., C)
    (entropy:425-437), with the stable sign trick."""
    c = v.shape[-1]
    flat = jnp.moveaxis(v.reshape(-1, c), 0, 1)[:, None, :]  # (C,1,N)
    lower = _logits_cumulative(params, flat - 0.5)
    upper = _logits_cumulative(params, flat + 0.5)
    sign = -jnp.sign(lower + upper)
    sign = jax.lax.stop_gradient(sign)
    lik = jnp.abs(jax.nn.sigmoid(sign * upper)
                  - jax.nn.sigmoid(sign * lower))
    lik = jnp.moveaxis(lik[:, 0, :], 0, 1).reshape(v.shape)
    return lower_bound(lik, LIKELIHOOD_BOUND)


def eb_forward(params, x, key=None, training=False):
    """(x_qnt, likelihood); x: (..., C). Training adds U(-.5,.5) noise,
    eval rounds around the channel medians (entropy:439-474)."""
    if training:
        x_qnt = x + jax.random.uniform(key, x.shape, x.dtype, -0.5, 0.5)
    else:
        med = eb_medians(params)
        x_qnt = jnp.round(x - med) + med
    return x_qnt, eb_likelihood(params, x_qnt)


def eb_aux_loss(params):
    """Quantile fitting loss (entropy:355-365): drives logits(quantiles)
    to (log(t/(1-t)), 0, -log(t/(1-t))) for tail mass t."""
    logits = _logits_cumulative(params, params["quantiles"])
    t = TAIL_MASS / 2
    target = jnp.array([math.log(t / (1 - t)), 0.0,
                        -math.log(t / (1 - t))])
    return jnp.sum(jnp.abs(logits - target[None, None, :]))


def eb_update(params, precision=16):
    """Build quantized CDF tables for the rANS coder (entropy:357-397).

    Returns {'cdf' (C, max_len+2), 'cdf_lengths' (C,), 'offsets' (C,)} —
    same schema as ops.entropy.build_gaussian_cdfs, so the same coder API
    applies with per-channel indexes."""
    from lbic_tpu.coding.cdf import pmf_to_quantized_cdf_np

    q = np.asarray(params["quantiles"])
    medians = q[:, 0, 1]
    minima = np.ceil(medians - q[:, 0, 0]).astype(int)
    maxima = np.ceil(q[:, 0, 2] - medians).astype(int)
    minima = np.clip(minima, 0, None)
    maxima = np.clip(maxima, 0, None)
    pmf_start = medians - minima
    pmf_length = maxima + minima + 1
    max_length = int(pmf_length.max())
    C = len(medians)

    samples = np.arange(max_length)[None, :] + pmf_start[:, None]
    lik = np.asarray(eb_likelihood(
        params, jnp.moveaxis(jnp.asarray(samples), 0, 1)))  # (N, C)
    lik = np.moveaxis(lik, 0, 1)  # (C, N)

    cdf = np.zeros((C, max_length + 2), dtype=np.int32)
    for i in range(C):
        n = int(pmf_length[i])
        p = lik[i, :n]
        tail = max(1.0 - p.sum(), 0.0)
        prob = np.concatenate([p, [tail]])
        row = pmf_to_quantized_cdf_np(prob, precision)
        cdf[i, :len(row)] = row
    return {
        "cdf": cdf,
        "cdf_lengths": (pmf_length + 2).astype(np.int32),
        "offsets": (-minima).astype(np.int32),
    }


def eb_compress(params, x, tables=None):
    """x: (N, ..., C) -> list of N byte strings (symbols around medians,
    channel-indexed CDFs)."""
    from lbic_tpu.coding import api as coding

    tables = tables or eb_update(params)
    med = np.asarray(eb_medians(params))
    a = np.asarray(x)
    c = a.shape[-1]
    sym = np.round(a - med).astype(np.int32)
    idx = np.broadcast_to(np.arange(c, dtype=np.int32), a.shape)
    out = []
    for i in range(a.shape[0]):
        out.append(coding.encode_with_indexes(
            sym[i].ravel(), idx[i].ravel(), tables["cdf"],
            tables["cdf_lengths"], tables["offsets"]))
    return out


def eb_decompress(params, streams, shape, tables=None):
    """Inverse of eb_compress; shape is the per-item (..., C) shape."""
    from lbic_tpu.coding import api as coding

    tables = tables or eb_update(params)
    med = np.asarray(eb_medians(params))
    c = shape[-1]
    idx = np.broadcast_to(np.arange(c, dtype=np.int32), shape).ravel()
    out = []
    for s in streams:
        dec = coding.RansDecoder()
        dec.set_stream(s)
        sym = dec.decode_stream(idx, tables["cdf"],
                                tables["cdf_lengths"], tables["offsets"])
        dec.close()
        out.append(sym.reshape(shape).astype(np.float32) + med)
    return np.stack(out)
