"""Find the codec quality hitting a target bpp/psnr/ms-ssim by bisection
(utils_cai/find_close/__main__.py:74-111 equivalent):

    python -m lbic_tpu.tools.find_close jpeg img.png 0.5 --metric bpp
"""

import argparse
import json

from lbic_tpu.tools.codecs import CODECS


def find_close(codec_name: str, img: str, target: float,
               metric: str = "bpp", qmin: int = 1, qmax: int = 100):
    cls = CODECS[codec_name]
    if not cls.available():
        raise SystemExit(f"codec '{codec_name}' is not available")
    codec = cls()
    best = None
    while qmax - qmin > 1:
        mid = (qmin + qmax) // 2
        r = codec.run(img, mid)
        v = r[metric]
        best = (mid, r)
        # all supported metrics increase with quality setting
        if v < target:
            qmin = mid
        else:
            qmax = mid
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("codec", choices=sorted(CODECS))
    ap.add_argument("image")
    ap.add_argument("target", type=float)
    ap.add_argument("--metric", default="bpp",
                    choices=["bpp", "psnr", "ms-ssim"])
    args = ap.parse_args(argv)
    q, r = find_close(args.codec, args.image, args.target, args.metric)
    print(json.dumps({"quality": q, **r}, indent=2))


if __name__ == "__main__":
    main()
