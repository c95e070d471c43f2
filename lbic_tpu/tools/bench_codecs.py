"""Classical-codec benchmark CLI (utils_cai/bench/__main__.py equivalent):

    python -m lbic_tpu.tools.bench_codecs jpeg <image_dir> -q 10 20 ... \
        [-o out.json]

Averages PSNR / MS-SSIM / bpp / enc+dec times over the image dir per
quality and writes the reference results-JSON schema."""

import argparse
import json
import sys

import numpy as np

from lbic_tpu.data.dataset import list_images
from lbic_tpu.tools.codecs import CODECS


def bench(codec_name: str, image_dir: str, qualities) -> dict:
    cls = CODECS[codec_name]
    if not cls.available():
        raise SystemExit(
            f"codec '{codec_name}' is not available in this environment "
            f"(missing binary/feature)")
    codec = cls()
    files = list_images(image_dir)
    if not files:
        raise SystemExit(f"no images in {image_dir}")
    keys = ["psnr", "ms-ssim", "bpp", "encoding_time", "decoding_time"]
    results = {k: [] for k in keys}
    for q in qualities:
        per = {k: [] for k in keys}
        for f in files:
            r = codec.run(f, q)
            for k in keys:
                per[k].append(r[k])
        for k in keys:
            results[k].append(float(np.mean(per[k])))
    return {
        "name": codec_name,
        "description": f"{codec_name} ({len(files)} images)",
        "results": results,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("codec", choices=sorted(CODECS))
    ap.add_argument("image_dir")
    ap.add_argument("-q", "--qualities", type=int, nargs="+",
                    default=[10, 20, 30, 40, 50, 60, 70, 80, 90])
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args(argv)
    out = bench(args.codec, args.image_dir, args.qualities)
    s = json.dumps(out, indent=2)
    if args.output:
        with open(args.output, "w") as f:
            f.write(s)
    else:
        print(s)


if __name__ == "__main__":
    main()
