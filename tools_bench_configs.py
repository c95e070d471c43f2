"""Benchmark all four shipped model configs against the reference's
per-config enc+dec times (SURVEY.md §6 / BASELINE.md):

  B8  low  (KS 3111, N 768,  M 96):  11.3 s enc / 19.0 s dec per image
  B8  high (KS 3311, N 1152, M 128): 19.6 / 26.4
  B4  high (KS 3311, N 512,  M 96):  43.4 / 72.1
  B16 low  (KS 3111, N 1280, M 192):  5.6 /  6.6

Run on the TPU: python tools_bench_configs.py [batch]
Writes results/turbo_configs.json.
"""

import json
import os
import sys
import time

import numpy as np

REF = {
    "B8_low": (11.3, 19.0),
    "B8_high": (19.6, 26.4),
    "B4_high": (43.4, 72.1),
    "B16_low": (5.6, 6.6),
}

CFGS = {
    "B8_low": dict(block_size=8, KS=(3, 1, 1, 1), N=768, M=96),
    "B8_high": dict(block_size=8, KS=(3, 3, 1, 1), N=1152, M=128),
    "B4_high": dict(block_size=4, KS=(3, 3, 1, 1), N=512, M=96),
    "B16_low": dict(block_size=16, KS=(3, 1, 1, 1), N=1280, M=192),
}


def main():
    import jax
    import jax.numpy as jnp

    from lbic_tpu.utils.jaxcache import enable
    enable()
    from lbic_tpu.config import LbicConfig
    from lbic_tpu.engine.turbo import TurboCodec
    from lbic_tpu.models import lbic as M

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out = {}
    # two engine configurations per model config: speed-max (G=8, one
    # slot per stream) and the rate-faithful default (G=1, 6 slots per
    # stream, ~0.001 bpp overhead) — results/PERF_LOG.md has the sweep
    for eng, (Gw, KSw) in (("speed", (8, 1)), ("faithful", (1, 6))):
      for name, kw in CFGS.items():
        name = f"{name}_{eng}"
        cfg = LbicConfig(net_version="v9", **kw)
        md = M.make_model_def(cfg)
        B = kw["block_size"]
        hb, wb = 512 // B, 768 // B  # one Kodak-sized image
        G = Gw if md.M % Gw == 0 else 4
        params = M.init_params(md, jax.random.PRNGKey(0))
        codec = TurboCodec(md, params, G=G, lane_slots=KSw)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((batch, hb, wb, md.cx),
                                   np.float32) - 0.5)
        streams, zh = codec.compress(x)
        zd = codec.decompress(streams, hb, wb)
        jax.block_until_ready(zd)
        enc_s = dec_s = float("inf")
        for _ in range(3):
            t0 = time.time()
            streams, zh = codec.compress(x)
            jax.block_until_ready(zh)
            t1 = time.time()
            zd = codec.decompress(streams, hb, wb)
            jax.block_until_ready(zd)
            t2 = time.time()
            assert bool(jnp.all(zh == zd)), name
            enc_s, dec_s = min(enc_s, t1 - t0), min(dec_s, t2 - t1)
        re, rd = REF[name.rsplit("_", 1)[0]]
        row = {
            "enc_s_per_img": round(enc_s / batch, 4),
            "dec_s_per_img": round(dec_s / batch, 4),
            "ref_enc_s": re, "ref_dec_s": rd,
            "speedup_encdec": round(
                (re + rd) / ((enc_s + dec_s) / batch), 1),
            "batch": batch, "G": G, "lane_slots": KSw,
            "overhead_bpp": round(
                (codec._lane_grid(codec.schedule(hb, wb))[1] * G * 6 + 2)
                * 8 / (512 * 768), 5),
            "bit_exact": True,
        }
        out[name] = row
        print(name, row, flush=True)
    res_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results")
    os.makedirs(res_dir, exist_ok=True)
    path = os.path.join(res_dir, "turbo_configs.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
