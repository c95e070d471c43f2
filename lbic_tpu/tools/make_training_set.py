"""Offline training-corpus prep (utils/training_img_generation.py:9-66
equivalent): crop non-overlapping patches from large images into a flat
training directory.

    python -m lbic_tpu.tools.make_training_set <src_dir> <dst_dir> \
        [--size 256] [--max-per-image 8] [--limit 100000]
"""

import argparse
import os

import numpy as np
from PIL import Image

from lbic_tpu.data.dataset import list_images


def make_training_set(src, dst, size=256, max_per_image=8, limit=None,
                      seed=0):
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    count = 0
    for path in list_images(src):
        with Image.open(path) as im:
            a = np.asarray(im.convert("RGB"))
        h, w = a.shape[:2]
        ny, nx = h // size, w // size
        if ny == 0 or nx == 0:
            continue
        cells = [(i, j) for i in range(ny) for j in range(nx)]
        rng.shuffle(cells)
        stem = os.path.splitext(os.path.basename(path))[0]
        for (i, j) in cells[:max_per_image]:
            patch = a[i * size:(i + 1) * size, j * size:(j + 1) * size]
            Image.fromarray(patch).save(
                os.path.join(dst, f"{stem}_{i}_{j}.png"))
            count += 1
            if limit and count >= limit:
                return count
    return count


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--max-per-image", type=int, default=8)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args(argv)
    n = make_training_set(args.src, args.dst, args.size,
                          args.max_per_image, args.limit)
    print(f"wrote {n} patches to {args.dst}")


if __name__ == "__main__":
    main()
