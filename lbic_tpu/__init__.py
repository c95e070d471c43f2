"""lbic_tpu — TPU-native learned block-based image compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
kamisli-icpl/Learned-block-based-image-compression (Kamisli, MTA 2024):
block-based learned image compression with block-level masked convolutions,
conditional-Gaussian entropy modelling, rANS entropy coding, and asymptotic
closed-loop (ACL) training.

Design stance (not a port):
  * the model is a pure function over block-folded NHWC arrays,
  * block causality is a compile-time weight-mask constant,
  * the closed coding loop runs as a *wavefront* over the block grid
    (all blocks on a wavefront are conditionally independent), batched on
    the MXU, instead of the reference's strictly sequential raster loop
    (reference: graphs/models/BlockBasedImgCompLossy_net.py:339-361),
  * entropy coding is a thin C++ rANS boundary fed by device-computed
    (symbol, cdf-index) arrays,
  * training runs under jit over a jax.sharding.Mesh (data/row axes) so
    1-chip and N-host are the same program.
"""

__version__ = "0.1.0"
