"""Evaluate a checkpoint over an image dir -> reference-schema RD JSON
(utils_cai/eval_model/__main__.py equivalent):

    python -m lbic_tpu.tools.eval_model config.json \
        [--checkpoint ckpt.pkl] [--data dir] [-o results.json]
"""

import argparse
import json

from lbic_tpu.agent import BlockBasedImgCompLossyAgent
from lbic_tpu.config import load_config, process_config
from lbic_tpu.utils.loggers import setup_logging


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--data", default=None)
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args(argv)
    cfg = load_config(args.config)
    if isinstance(cfg.lambda_, (list, tuple)):
        cfg.lambda_ = cfg.lambda_[0]
    cfg.mode = "eval_model"
    cfg.multi_agent = False
    if args.data:
        cfg.test_data = args.data
    cfg.exp_name = cfg.exp_name or "eval"
    cfg = process_config(cfg)
    setup_logging(cfg.log_dir)
    agent = BlockBasedImgCompLossyAgent(cfg)
    if args.checkpoint:
        agent.load_checkpoint(args.checkpoint, weights_only=True)
    out = agent.eval_model()
    if args.output:
        with open(args.output, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
