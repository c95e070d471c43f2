"""Synthetic Laplace data generator (utils/laplace_sampler.py:1-19).

Per-channel Laplace(mean, b) samples in NHWC; variance = 2 b^2. Used for
entropy-model sanity experiments."""

import jax
import jax.numpy as jnp
import numpy as np


class LaplaceSampler:
    def __init__(self, mean=(0.0,), lamb=(1.0,)):
        self.mean = jnp.asarray(mean, jnp.float32)
        self.lamb = jnp.asarray(lamb, jnp.float32)
        assert self.mean.shape == self.lamb.shape

    def sample(self, key, n, h, w):
        """(n, h, w, C) with channel c ~ Laplace(mean[c], lamb[c])."""
        c = self.mean.shape[0]
        return jax.random.laplace(
            key, (n, h, w, c)) * self.lamb + self.mean

    @property
    def stddev(self):
        return np.sqrt(2.0) * np.asarray(self.lamb)
