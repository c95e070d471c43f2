"""CLI driver: python main.py configs/<config>.json

Mirrors the reference main.py:7-33: loads the JSON config, optionally
sweeps a multi-run parameter (in practice the lambda_ list), and runs one
agent per value under experiments/<multi_exp_name>/exp_<value>."""

import argparse
import copy
import sys

from lbic_tpu.agent import BlockBasedImgCompLossyAgent
from lbic_tpu.config import load_config, process_config
from lbic_tpu.utils.loggers import setup_logging

AGENTS = {"BlockBasedImgCompLossyAgent": BlockBasedImgCompLossyAgent}


def run_agent(cfg):
    from lbic_tpu.utils.jaxcache import enable as enable_cache

    enable_cache()
    cfg = process_config(cfg)
    setup_logging(cfg.log_dir)
    agent_cls = AGENTS[cfg.agent]
    agent = agent_cls(cfg)
    agent.run()
    return agent


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="path to JSON config")
    ap.add_argument("--mode", default=None, help="override config mode")
    args = ap.parse_args(argv)

    # multi-host bootstrap (no-op single-process); process 0 owns logs
    from lbic_tpu.parallel import distributed as dist

    dist.initialize_from_env()
    dist.quiet_non_main_logging()

    cfg = load_config(args.config)
    if args.mode:
        cfg.mode = args.mode

    if cfg.multi_agent:
        values = cfg.extras.get(cfg.multi_param) or getattr(
            cfg, cfg.multi_param)
        if not isinstance(values, (list, tuple)):
            values = [values]
        for v in values:
            c = copy.deepcopy(cfg)
            setattr(c, cfg.multi_param, v)
            c.multi_agent = False
            c.exp_name = f"{cfg.multi_exp_name}/exp_{v}"
            print(f"=== running {c.exp_name} ===")
            run_agent(c)
    else:
        if isinstance(cfg.lambda_, (list, tuple)):
            cfg.lambda_ = cfg.lambda_[0]
        cfg.exp_name = cfg.exp_name or cfg.multi_exp_name or "exp"
        run_agent(cfg)


if __name__ == "__main__":
    main()
