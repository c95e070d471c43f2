"""Decompose codec wall time: device scan vs host transfers vs host rANS.

Run on the real TPU:  python tools_profile.py [batch]
With LBIC_TRACE=<logdir>, additionally dumps a jax.profiler XPlane trace
of one compress+decompress round (view in TensorBoard / Perfetto).
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_lbic"))


def main():
    import jax
    import jax.numpy as jnp

    from lbic_tpu.utils.jaxcache import enable as enable_cache

    enable_cache()

    from lbic_tpu.config import LbicConfig
    from lbic_tpu.engine.turbo import TurboCodec
    from lbic_tpu.models import lbic as M

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = LbicConfig(net_version="v9", block_size=8, KS=(3, 1, 1, 1),
                     N=768, M=96)
    md = M.make_model_def(cfg)
    params = M.init_params(md, jax.random.PRNGKey(0))
    codec = TurboCodec(md, params, G=8)
    hb, wb = 64, 96
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.5, 0.5, (batch, hb, wb, md.cx)).astype(np.float32)

    n, Hb, Wb = batch, hb, wb
    sched = codec.schedule(Hb, Wb)
    fn = codec._scan_fn(n, Hb, Wb)
    cap = codec._caps(n, Hb, Wb)
    hw = jnp.zeros((cap,), jnp.uint32)
    lx = jnp.zeros((n, sched.Dmax, codec.G), jnp.uint32)
    lp = jnp.zeros((n, sched.Dmax, codec.G), jnp.int32)
    xg = jnp.asarray(x)

    # warmup
    out = fn(codec.params, xg, hw, lx, lp, jnp.asarray(False))
    jax.block_until_ready(out)

    def t(f, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            f()
            best = min(best, time.time() - t0)
        return best

    # 1. device-only scan (outputs stay on device)
    dev = t(lambda: jax.block_until_ready(
        fn(codec.params, xg, hw, lx, lp, jnp.asarray(False))))
    print(f"scan device-only            : {dev*1e3:8.1f} ms"
          f"  ({dev/sched.steps*1e3:.2f} ms/step, {sched.steps} steps)")

    # 2. transfers
    zhat, ys_c, idx_c = fn(codec.params, xg, hw, lx, lp, jnp.asarray(False))
    jax.block_until_ready((zhat, ys_c, idx_c))
    tz = t(lambda: np.asarray(zhat))
    ty = t(lambda: np.asarray(ys_c))
    ti = t(lambda: np.asarray(idx_c))
    print(f"zhat D2H  {zhat.nbytes/1e6:6.1f} MB   : {tz*1e3:8.1f} ms")
    print(f"ys   D2H  {ys_c.nbytes/1e6:6.1f} MB   : {ty*1e3:8.1f} ms")
    print(f"idx  D2H  {idx_c.nbytes/1e6:6.1f} MB   : {ti*1e3:8.1f} ms")

    # 3. host rANS encode
    ys_h = np.asarray(ys_c)
    idx_h = np.asarray(idx_c).astype(np.int32)
    from lbic_tpu.coding import api as coding

    tt = codec.tables
    ys_pad = np.zeros((sched.steps, sched.Dmax, md.M), np.int32)
    idx_pad = np.zeros_like(ys_pad)

    def enc_host():
        for i in range(n):
            ys_pad[sched.valid] = ys_h[i]
            idx_pad[sched.valid] = idx_h[i]
            coding.encode_interleaved(
                ys_pad, idx_pad, sched.valid, md.M, codec.G,
                tt["cdf"], tt["cdf_lengths"], tt["offsets"])

    te = t(enc_host)
    print(f"host rANS encode x{n}        : {te*1e3:8.1f} ms")

    # 4. full compress / decompress for reference
    streams, _ = codec.compress(x)
    tc = t(lambda: codec.compress(x))
    td = t(lambda: codec.decompress(streams, hb, wb))
    print(f"compress total              : {tc*1e3:8.1f} ms")
    print(f"decompress total            : {td*1e3:8.1f} ms")
    print(f"H2D stream bytes            : {sum(len(s) for s in streams)/1e6:.2f} MB")

    # 5. optional profiler trace of one round (LBIC_TRACE=<logdir>)
    tracedir = os.environ.get("LBIC_TRACE")
    if tracedir:
        from lbic_tpu.utils.profiling import annotate, trace

        with trace(tracedir):
            with annotate("compress"):
                streams, zh = codec.compress(x)
                jax.block_until_ready(zh)
            with annotate("decompress"):
                jax.block_until_ready(codec.decompress(streams, hb, wb))
        print(f"profiler trace written to {tracedir}")


if __name__ == "__main__":
    main()
