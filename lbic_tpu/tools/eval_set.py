"""Broadened held-out evaluation set (VERDICT r4 #5).

The round-2..4 eval set was 6 images (5 labmaze textures + 1 photo),
with texture *siblings* of the 5 styles present in training — too small
and too correlated to carry BD-rate claims. This tool assembles a
>=12-image held-out set from in-environment package data that is
verifiably ABSENT from the training corpus:

  * the original 6 (kept for continuity with earlier rounds' numbers),
  * photo-textural content from dm_control / gymnasium_robotics assets
    (wood, marble, skin, grass, sky, fabric) — package trees the corpus
    builder (builtin_corpus.py) never touches,
  * graphics/synthetic-content probes (texture atlas, plot logo).

This mirrors the reference's Kodak discipline (a fixed, documented,
training-disjoint image set, utils_cai/eval_model/__main__.py:92-133)
with the only sources available in a zero-egress environment.

Every image is halved until max(H, W) <= 768 (same policy as
builtin_corpus test prep) and saved as RGB PNG. manifest.json records
source paths, original/final dims, and the training-disjointness rule.

    python -m lbic_tpu.tools.eval_set data_eval --corpus data_corpus2
"""

import argparse
import glob
import json
import os

import numpy as np
from PIL import Image

SP = "/opt/venv/lib/python3.12/site-packages"

# (source path under site-packages, output stem, content class)
SOURCES = [
    # -- the round-2..4 set: 1 photograph + 5 labmaze textures ----------
    ("matplotlib/mpl-data/sample_data/grace_hopper.jpg",
     "sample_data_grace_hopper", "photograph"),
    ("labmaze/assets/style_01/floor_blue_d.png",
     "style_01_floor_blue_d", "game texture (family in train)"),
    ("labmaze/assets/style_02/wall_purple_d.png",
     "style_02_wall_purple_d", "game texture (family in train)"),
    ("labmaze/assets/style_03/wall_orange_d.png",
     "style_03_wall_orange_d", "game texture (family in train)"),
    ("labmaze/assets/style_04/wall_green_d.png",
     "style_04_wall_green_d", "game texture (family in train)"),
    ("labmaze/assets/style_05/floor_orange_bright_d.png",
     "style_05_floor_orange_bright_d", "game texture (family in train)"),
    # -- new: photo-textural, whole source trees disjoint from train ----
    ("gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/"
     "textures/wood1.png", "kitchen_wood1", "wood photo-texture"),
    ("gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/"
     "textures/white_marble_tile2.png", "kitchen_marble2",
     "marble photo-texture"),
    ("gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/"
     "textures/white_marble_tile.png", "kitchen_marble_gray",
     "marble photo-texture (grayscale)"),
    ("gymnasium_robotics/envs/assets/adroit_hand/resources/textures/"
     "skin.png", "adroit_skin", "skin photo-texture"),
    ("gymnasium_robotics/envs/assets/adroit_hand/resources/textures/"
     "darkwood.png", "adroit_darkwood", "wood photo-texture"),
    ("gymnasium_robotics/envs/assets/adroit_hand/resources/textures/"
     "silverRaw.png", "adroit_silver", "metal photo-texture"),
    ("dm_control/suite/dog_assets/skin_texture.png", "dog_skin",
     "fur/skin photo-texture"),
    ("dm_control/locomotion/arenas/assets/outdoor_natural/"
     "OutdoorGrassFloorD.png", "outdoor_grass", "grass photo-texture"),
    ("dm_control/locomotion/arenas/assets/outdoor_natural/"
     "OutdoorSkybox2048.png", "outdoor_skybox", "sky photograph"),
    ("dm_control/locomotion/soccer/assets/humanoid/B_08.png",
     "soccer_jersey_atlas", "texture atlas (flat regions + glyphs)"),
    ("dm_control/suite/all_domains.png", "dmc_domains_collage",
     "rendered-scene collage"),
]


def _prep(path, max_side=768):
    with Image.open(path) as im:
        a = np.asarray(im.convert("RGB"))
    orig = list(a.shape[:2])
    while max(a.shape[:2]) > max_side:
        im = Image.fromarray(a)
        a = np.asarray(im.resize((a.shape[1] // 2, a.shape[0] // 2),
                                 Image.LANCZOS))
    return a, orig


def _train_stems(corpus):
    """Source-image stems used by the training corpus (train + valid),
    for the disjointness check in the manifest."""
    stems = set()
    for split in ("train", "valid"):
        for p in glob.glob(os.path.join(corpus, split, "*.png")):
            stems.add(os.path.basename(p).split("_s")[0])
    return stems


def build(out_dir, corpus=None, max_side=768):
    os.makedirs(out_dir, exist_ok=True)
    manifest = {"description": __doc__.split("\n")[0],
                "max_side": max_side, "images": []}
    for rel, stem, kind in SOURCES:
        src = os.path.join(SP, rel)
        if not os.path.isfile(src):
            manifest["images"].append(
                {"stem": stem, "source": rel, "status": "missing"})
            continue
        a, orig = _prep(src, max_side)
        Image.fromarray(a).save(os.path.join(out_dir, stem + ".png"))
        manifest["images"].append(
            {"stem": stem, "source": rel, "class": kind,
             "orig_hw": orig, "final_hw": list(a.shape[:2])})
    if corpus and os.path.isdir(os.path.join(corpus, "train")):
        stems = _train_stems(corpus)
        for e in manifest["images"]:
            # an eval image leaks iff its SOURCE FILE was cropped into
            # train/valid; style_* entries share a texture family (not a
            # file) with train and are flagged as such in their class
            e["source_file_in_train_corpus"] = any(
                e["stem"].startswith(s) for s in stems)
        manifest["train_corpus"] = os.path.abspath(corpus)
    n = sum(1 for e in manifest["images"] if e.get("final_hw"))
    manifest["n_images"] = n
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("--corpus", default="data_corpus2",
                    help="training corpus root for the disjointness "
                         "check recorded in manifest.json")
    ap.add_argument("--max-side", type=int, default=768)
    args = ap.parse_args(argv)
    m = build(args.out_dir, args.corpus, args.max_side)
    print(f"{m['n_images']} eval images under {args.out_dir}")


if __name__ == "__main__":
    main()
