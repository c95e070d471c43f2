"""Typed configuration.

Field names mirror the reference JSON configs (configs/blkbsdimgcomp_*.json,
parsed at utils/config.py:50-66) so the shipped configs port 1:1, but are
validated through a dataclass instead of an EasyDict.
"""

import dataclasses
import json
import os
from typing import List, Optional, Tuple


@dataclasses.dataclass
class LbicConfig:
    # experiment / driver
    exp_name: str = ""
    multi_exp_name: str = ""
    session: str = "A"
    agent: str = "BlockBasedImgCompLossyAgent"
    mode: str = "eval_model"
    seed: int = 1337

    # model
    net_version: str = "v9"
    block_size: int = 8
    KS: Tuple[int, int, int, int] = (3, 1, 1, 1)
    N: int = 768
    M: int = 96
    use_postpm: bool = False

    # loss / rd
    lambda_: float = 117.045
    distortion: str = "mse"  # mse | ssim | ms_ssim
    loss_switch_thr: float = 6e-5
    training_loss_switch: int = 1

    # training
    learning_rate: float = 0.8e-4
    batch_size: int = 8
    patch_size: int = 0
    val_batch_size: int = 1
    val_patch_size: int = 0
    grad_acc_iters: int = 1
    loss_prnt_iters: int = 2000
    max_epoch: int = 250
    use_amp: bool = False
    validate_every: int = 1
    validate_recu_reco_every: int = 5
    # per-block RD-cost dump during closed-loop validation (the reference's
    # save_blkbsd_rdcosts_to_disk switch, agents/blkbsdimgcomp_agent.py:406)
    save_blkbsd_rdcosts: bool = False
    # override the 8-bit round-trip commit in closed-loop validation
    # (agent:443-445); None = follow the mode (quantize in-training and in
    # validate_recu_reco mode, clamp-only in validate_recu_reco_fast)
    recu_reco_quant8: Optional[bool] = None
    chained_training: bool = False
    resume_training: bool = False
    checkpoint_file: str = "checkpoint"
    modelbest_file_load: str = "model_best_acl_Xrr"

    # codec engine for eval_model:
    #   "wavefront" — single rANS stream per image (host C++ coder):
    #     reference-parity bitstream overhead (~8 B/image), slower decode
    #     (one host sync per wavefront step);
    #   "turbo" — lane-interleaved rans32, fully on-device enc+dec:
    #     ~100x the round-trip throughput, but Dmax*turbo_groups streams
    #     per image cost 8 B each (measured 0.008 bpp/group-count at
    #     768x512 — material at the lowest rate points).
    codec_engine: str = "wavefront"  # wavefront | turbo
    # host entropy coder for the wavefront engine: "ans" (rANS,
    # default) or "rangecoder" — the reference's two-coder choice
    # (entropy_layers_cai.py:18-51); same CDFs, same rate
    entropy_coder: str = "ans"
    # rate-faithful turbo defaults (measured, results/PERF_LOG.md): one
    # channel group and 6 schedule slots per rans32 stream = 8 streams
    # per 768x512 image -> 50 B (0.0010 bpp) header+state overhead,
    # <=1% of the flagship's lowest operating point, at >=100x the
    # reference's round-trip throughput. For maximum speed (225x) use
    # turbo_groups=8, turbo_lane_slots=1 and pay ~0.047 bpp.
    turbo_groups: int = 1
    # schedule slots per rans32 stream: divides the per-stream ~6 B
    # header+state overhead by this factor (engine/turbo.py lane_slots)
    turbo_lane_slots: int = 6

    # ACL
    acl_bool: bool = True
    acl_itr: int = 0
    # bounded-compute extensions (no reference equivalent — the reference's
    # ACL outer loop runs until the user kills it, agent:109): stop after
    # this many ACL iterations / epochs within one iteration (0 = unbounded)
    max_acl_itr: int = 0
    max_epochs_per_acl: int = 0
    # separate cap for ACL iteration 0 (0 = use max_epochs_per_acl): itr 0
    # trains from scratch and has no patience-based exit (its only exits are
    # the rdloss threshold and the epoch cap), so it usually needs a much
    # larger budget than the fine-tuning iterations that follow
    max_epochs_itr0: int = 0
    # resumed-campaign safety: regenerate this iteration's __acl_ recon
    # pairs from the loaded weights before training (the shared corpus
    # dirs may hold another run's recons by the time a point resumes)
    regen_on_resume: bool = False
    acl_lr_alpha: float = 1.0
    cnt_no_improvement_valid_thresholds: Tuple[int, ...] = (8, 8, 7, 6, 5, 5)
    convergence_decsn_mode: str = "ol_loss"  # ol_loss | cl_loss
    acl_itr0_rdloss_threshold: float = 0.32

    # data
    num_train_dirs: int = 1
    train_data_1: str = ""
    train_data_2: str = ""
    train_data_3: str = ""
    train_data_4: str = ""
    valid_data: str = ""
    test_data: str = ""

    # sweep
    multi_agent: bool = False
    multi_param: str = "lambda_"

    # parallel (new; no reference equivalent — reference is single-GPU)
    mesh_data: int = 1  # data-parallel axis size
    mesh_row: int = 1  # spatial row-sharding axis size

    # derived / runtime (filled by process_config)
    exp_dir: str = ""
    checkpoint_dir: str = ""
    out_dir: str = ""
    log_dir: str = ""

    @property
    def lru_compress(self) -> int:
        """Receptive-field half-width for coding: sum of k//2 over KS
        (agents/blkbsdimgcomp_agent.py:481-489, mode='compress')."""
        return int(sum(k // 2 for k in self.KS))

    @property
    def lru_validation(self) -> int:
        """enc+dec receptive field (agent:485)."""
        return int(sum(k // 2 for k in self.KS) + sum(k // 2 for k in self.KS[1:]))


def load_config(path_or_dict) -> "LbicConfig":
    """JSON file/dict -> LbicConfig. Unknown keys are kept in .extras."""
    if isinstance(path_or_dict, (str, os.PathLike)):
        with open(path_or_dict) as f:
            raw = json.load(f)
    else:
        raw = dict(path_or_dict)
    fields = {f.name for f in dataclasses.fields(LbicConfig)}
    known = {k: v for k, v in raw.items() if k in fields}
    if "KS" in known:
        known["KS"] = tuple(known["KS"])
    if "cnt_no_improvement_valid_thresholds" in known:
        known["cnt_no_improvement_valid_thresholds"] = tuple(
            known["cnt_no_improvement_valid_thresholds"]
        )
    cfg = LbicConfig(**known)
    cfg.extras = {k: v for k, v in raw.items() if k not in fields}
    return cfg


def process_config(cfg: LbicConfig, root="experiments") -> LbicConfig:
    """Create experiment dirs (utils/config.py:69-103 equivalent)."""
    name = cfg.exp_name or "exp"
    cfg.exp_dir = os.path.join(root, name)
    cfg.checkpoint_dir = os.path.join(cfg.exp_dir, "checkpoints")
    cfg.out_dir = os.path.join(cfg.exp_dir, "out")
    cfg.log_dir = os.path.join(cfg.exp_dir, "logs")
    for d in (cfg.checkpoint_dir, cfg.out_dir, cfg.log_dir):
        os.makedirs(d, exist_ok=True)
    return cfg
