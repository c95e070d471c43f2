"""Convert a reference PyTorch checkpoint (.pth.tar) to a native .pkl
weights checkpoint this framework loads directly:

    python -m lbic_tpu.tools.import_torch config.json ckpt.pth.tar out.pkl

The conversion (models/torch_import.py) maps the reference's state_dict0
names (prtr_forward*/prtr_inverse*/get_meanscale.*, saved at
agents/base.py:131-152) to the params pytree: OIHW->HWIO conv transpose,
GDN sqrt-reparam copied as-is, entropy-model buffers dropped (CDF tables
are rebuilt natively at codec construction)."""

import argparse

import jax

from lbic_tpu.config import load_config
from lbic_tpu.models import lbic as M
from lbic_tpu.models.torch_import import load_torch_checkpoint
from lbic_tpu.train import checkpoint as ckpt


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="JSON config describing the model")
    ap.add_argument("torch_ckpt", help=".pth.tar checkpoint")
    ap.add_argument("output", help="native .pkl output path")
    args = ap.parse_args(argv)
    cfg = load_config(args.config)
    if isinstance(cfg.lambda_, (list, tuple)):
        cfg.lambda_ = cfg.lambda_[0]
    md = M.make_model_def(cfg)
    params, full = load_torch_checkpoint(args.torch_ckpt, md)
    ckpt.save(args.output, {"params": params, "torch_checkpoint": True,
                            "epoch": full.get("epoch", 0)})
    n = sum(a.size for a in jax.tree.leaves(params))
    print(f"wrote {args.output}: {n/1e6:.2f}M params")


if __name__ == "__main__":
    main()
