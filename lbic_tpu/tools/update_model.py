"""Re-export a checkpoint with freshly built entropy-coder CDF tables.

CLI mirror of utils_cai/update_model/__main__.py:100-161: load a
checkpoint (ours or a reference .pth.tar), rebuild the quantized CDF
tables from the 64-entry scale table (and the EntropyBottleneck tables
if a bottleneck is present), and save under `<name>-<sha256[:8]>.pkl`.

    python -m lbic_tpu.tools.update_model ckpt.pkl [-n NAME] [-d DIR]
        [--no-update] [--weights-only]
"""

import argparse
import hashlib
import os

import numpy as np


def sha256_file(path, nbytes=8):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()[:nbytes]


def build_tables():
    from lbic_tpu.ops import entropy as ent

    return ent.build_gaussian_cdfs(np.asarray(ent.get_scale_table()))


def update_checkpoint(path, out_dir=None, name=None, no_update=False,
                      weights_only=False):
    """Returns the final output path."""
    from lbic_tpu.train import checkpoint as ckpt

    payload = ckpt.load_any(path)
    if weights_only:
        payload = {"params": payload["params"]}
    if not no_update:
        payload["cdf_tables"] = build_tables()

    base = os.path.basename(path)
    stem = base.split(".")[0] if name is None else name
    out_dir = out_dir or os.path.dirname(os.path.abspath(path))
    os.makedirs(out_dir, exist_ok=True)
    tmp_path = os.path.join(out_dir, f"{stem}.pkl")
    ckpt.save(tmp_path, payload)
    final = os.path.join(out_dir, f"{stem}-{sha256_file(tmp_path)}.pkl")
    os.replace(tmp_path, final)
    return final


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("filepath")
    p.add_argument("-n", "--name", default=None)
    p.add_argument("-d", "--dir", default=None)
    p.add_argument("--no-update", action="store_true")
    p.add_argument("--weights-only", action="store_true",
                   help="strip optimizer/logger state "
                   "(experiments/extract_model_weights_only.py)")
    a = p.parse_args(argv)
    out = update_checkpoint(a.filepath, a.dir, a.name, a.no_update,
                            a.weights_only)
    print(out)
    return out


if __name__ == "__main__":
    main()
