"""Benchmark: end-to-end codec throughput (compress + decompress) on the
flagship v9 B8-lowrate model, one 768x512 image per batch element.

Baseline (BASELINE.md / SURVEY.md §6): the reference takes 11.3 s encode +
19.0 s decode per 768x512 Kodak image on the author's GPU
(experiments/blkbsdimgcomp_B8_KS3111_N768M96_v9/exp_117.045 logs) —
0.0330 images/s for the enc+dec round trip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Env: LBIC_BENCH_SMALL=1 shrinks the model for CPU smoke runs;
LBIC_BENCH_BATCH sets images per batch (default 16; the scan is
launch-latency bound, so batching images is nearly free throughput).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_IMG_PER_S = 1.0 / (11.3 + 19.0)


def main():
    import jax

    from lbic_tpu.utils.jaxcache import enable as enable_cache

    enable_cache()

    from lbic_tpu.config import LbicConfig
    from lbic_tpu.engine.turbo import TurboCodec
    from lbic_tpu.models import lbic as M

    small = bool(os.environ.get("LBIC_BENCH_SMALL"))
    batch = int(os.environ.get("LBIC_BENCH_BATCH", "16"))
    if small:
        cfg = LbicConfig(net_version="v9", block_size=8, KS=(3, 1, 1, 1),
                         N=96, M=24)
        hb, wb = 16, 24  # 128x192
    else:
        cfg = LbicConfig(net_version="v9", block_size=8, KS=(3, 1, 1, 1),
                         N=768, M=96)
        hb, wb = 64, 96  # 768x512 (Kodak portrait: H=512, W=768)

    md = M.make_model_def(cfg)
    params = M.init_params(md, jax.random.PRNGKey(0))
    codec = TurboCodec(md, params, G=8)

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # 8-bit source pixels, dequantized on device (the real codec input is
    # uint8 images; shipping floats would 4x the host->device bytes)
    px = rng.integers(0, 256, (batch, hb, wb, md.cx), dtype=np.uint8)

    @jax.jit
    def to_input(u8):
        return u8.astype(jnp.float32) / 255.0 - 0.5

    # warmup: compiles the shared step functions
    xw = to_input(jnp.asarray(px))
    wsteams, _ = codec.compress(xw)
    codec.decompress(wsteams, hb, wb)

    # best of 3 reps: the TPU tunnel adds jittery host-side latency
    enc_s, dec_s = float("inf"), float("inf")
    for _ in range(3):
        t0 = time.time()
        x = to_input(jnp.asarray(px))   # H2D of the uint8 pixels
        streams, zhat_enc = codec.compress(x)
        jax.block_until_ready(zhat_enc)
        t1 = time.time()
        zhat_dec = codec.decompress(streams, hb, wb)
        jax.block_until_ready(zhat_dec)
        t2 = time.time()
        # bit-exactness check on device (reference's own criterion)
        assert bool(jnp.all(zhat_enc == zhat_dec)), "enc/dec mismatch"
        enc_s, dec_s = min(enc_s, t1 - t0), min(dec_s, t2 - t1)
    img_per_s = batch / (enc_s + dec_s)
    print(json.dumps({
        "metric": "codec_throughput_768x512_encdec",
        "value": round(img_per_s, 4),
        "unit": "images/s",
        "vs_baseline": round(img_per_s / BASELINE_IMG_PER_S, 2),
    }))
    print(f"# enc {enc_s:.2f}s dec {dec_s:.2f}s for {batch} imgs "
          f"({'small' if small else 'full'} model), bit-exact ok",
          file=sys.stderr)


if __name__ == "__main__":
    main()
