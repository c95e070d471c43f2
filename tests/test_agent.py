"""End-to-end agent tests on a tiny synthetic dataset: data pipeline,
one ACL iteration of training (with recon-set regeneration and
checkpointing), eval_model codec run, and resume."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from lbic_tpu.agent import BlockBasedImgCompLossyAgent
from lbic_tpu.config import LbicConfig, load_config, process_config
from lbic_tpu.data.dataset import acl_dir


@pytest.fixture
def tiny_exp(tmp_path):
    rng = np.random.default_rng(0)
    train_dir = tmp_path / "train"
    valid_dir = tmp_path / "valid"
    train_dir.mkdir()
    valid_dir.mkdir()
    for d, n, size in ((train_dir, 6, 24), (valid_dir, 2, 20)):
        for i in range(n):
            a = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
            Image.fromarray(a).save(d / f"img{i}.png")
    cfg = LbicConfig(
        exp_name="tiny", net_version="v9", block_size=4, KS=(3, 1, 1, 1),
        N=16, M=8, lambda_=100.0, batch_size=2, patch_size=16,
        learning_rate=1e-3, max_epoch=2, validate_every=1,
        validate_recu_reco_every=1, acl_bool=False,
        cnt_no_improvement_valid_thresholds=(0,),
        acl_itr0_rdloss_threshold=1e9,  # converge immediately at itr 0
        num_train_dirs=1, train_data_1=str(train_dir),
        valid_data=str(valid_dir), test_data=str(valid_dir),
        mode="train_all_acl", seed=7,
    )
    cfg = process_config(cfg, root=str(tmp_path / "experiments"))
    return cfg, train_dir, valid_dir


def test_train_all_acl_one_iteration(tiny_exp):
    cfg, train_dir, valid_dir = tiny_exp
    agent = BlockBasedImgCompLossyAgent(cfg)
    agent.run()
    # checkpoints written
    assert os.path.isfile(os.path.join(cfg.checkpoint_dir,
                                       "model_best_acl_0.pkl"))
    assert os.path.isfile(os.path.join(cfg.checkpoint_dir,
                                       "model_best_acl_0rr.pkl"))
    # recon sets regenerated for ACL itr 1
    td = acl_dir(str(train_dir), cfg.session, 1)
    vd = acl_dir(str(valid_dir), cfg.session, 1)
    assert len(os.listdir(td)) == 6
    assert len(os.listdir(vd)) == 2


def test_eval_model_runs_codec(tiny_exp):
    cfg, _, _ = tiny_exp
    cfg.mode = "eval_model"
    agent = BlockBasedImgCompLossyAgent(cfg)
    out = agent.eval_model()
    r = out["results"]
    assert len(r["psnr"]) == 2
    assert all(b > 0 for b in r["bpp"])
    assert os.path.isfile(os.path.join(cfg.out_dir, "results.json"))


def test_checkpoint_roundtrip(tiny_exp):
    cfg, _, _ = tiny_exp
    agent = BlockBasedImgCompLossyAgent(cfg)
    agent.best_valid_loss = 1.25
    agent.current_epoch = 3
    agent.save_checkpoint()
    path = os.path.join(cfg.checkpoint_dir, "checkpoint.pkl")
    assert os.path.isfile(path)
    agent2 = BlockBasedImgCompLossyAgent(cfg)
    agent2.load_checkpoint(path)
    assert agent2.best_valid_loss == 1.25
    assert agent2.current_epoch == 3
    import jax

    a = jax.tree.leaves(agent.state.params)
    b = jax.tree.leaves(agent2.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_model_size_and_flops(tiny_exp):
    cfg, _, _ = tiny_exp
    agent = BlockBasedImgCompLossyAgent(cfg)
    total, active = agent.model_size_estimation()
    assert 0 < active < total
    fl = agent.flops_estimation(hw=(64, 64))
    assert fl > 0


def test_eval_model_turbo_engine(tiny_exp):
    """codec_engine='turbo' runs eval through TurboCodec (on-device rANS)
    and produces the same results schema."""
    from lbic_tpu.engine.turbo import TurboCodec

    cfg, _, _ = tiny_exp
    cfg.mode = "eval_model"
    cfg.codec_engine = "turbo"
    cfg.turbo_groups = 4
    agent = BlockBasedImgCompLossyAgent(cfg)
    assert isinstance(agent.codec(), TurboCodec)
    out = agent.eval_model()
    r = out["results"]
    assert len(r["psnr"]) == 2
    assert all(b > 0 for b in r["bpp"])


def test_postproc_pipeline(tiny_exp):
    """gen_train_set_postproc writes closed-loop recon images into
    <root>__recurecos_<lambda> (agent:686-736), then train_postproc_mdl
    trains BlkBasedPostProcessing on the (x, recon) pairs until <0.1%
    improvement (agent:308-347)."""
    cfg, train_dir, _ = tiny_exp
    cfg.mode = "gen_train_set_postproc"
    agent = BlockBasedImgCompLossyAgent(cfg)
    agent.run()
    out = str(train_dir).rstrip("/") + f"__recurecos_{cfg.lambda_}"
    assert os.path.isdir(out)
    assert len(os.listdir(out)) == 6
    cfg.mode = "train_postproc_mdl"
    agent2 = BlockBasedImgCompLossyAgent(cfg)
    agent2.run()
    assert agent2.pp_params is not None
    # checkpoint now carries the postproc params
    import pickle
    with open(os.path.join(cfg.checkpoint_dir, "checkpoint.pkl"),
              "rb") as f:
        payload = pickle.load(f)
    assert payload["pp_params"] is not None


def test_main_multi_agent_sweep(tiny_exp, tmp_path, monkeypatch):
    """main.py multi-agent sweep: one agent per lambda_ value under
    experiments/<multi_exp_name>/exp_<v> (reference main.py:17-24)."""
    import json

    import main as main_mod

    cfg, train_dir, valid_dir = tiny_exp
    cj = {
        "agent": "BlockBasedImgCompLossyAgent", "mode": "validate",
        "net_version": "v9", "block_size": 4, "KS": [3, 1, 1, 1],
        "N": 16, "M": 8, "lambda_": [50.0, 100.0], "batch_size": 2,
        "patch_size": 16, "learning_rate": 1e-3, "max_epoch": 1,
        "acl_bool": False, "num_train_dirs": 1,
        "train_data_1": str(train_dir), "valid_data": str(valid_dir),
        "test_data": str(valid_dir), "seed": 7,
        "multi_agent": True, "multi_param": "lambda_",
        "multi_exp_name": "sweeptest",
    }
    cfg_path = tmp_path / "sweep.json"
    cfg_path.write_text(json.dumps(cj))
    monkeypatch.chdir(tmp_path)
    main_mod.main([str(cfg_path)])
    for v in (50.0, 100.0):
        d = tmp_path / "experiments" / "sweeptest" / f"exp_{v}"
        assert d.is_dir(), d


def test_debug_mode_runs_with_nan_trap(tiny_exp):
    """debug mode = train_one_acl under jax_debug_nans (the reference's
    detect_anomaly analog, base.py:187-189), restored afterwards."""
    import jax

    cfg, _, _ = tiny_exp
    cfg.mode = "debug"
    cfg.max_epoch = 1
    agent = BlockBasedImgCompLossyAgent(cfg)
    agent.run()
    assert jax.config.jax_debug_nans is False
