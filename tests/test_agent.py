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


def _f32(a):
    """Loaders now yield uint8 (device-side conversion in the jitted
    steps); test oracles convert the same way."""
    import jax.numpy as jnp

    a = jnp.asarray(a)
    if a.dtype == jnp.uint8:
        a = a.astype(jnp.float32) / 255.0 - 0.5
    return a


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


def test_logger_state_survives_resume(tiny_exp):
    """The reference checkpoints six RDLogger states so epoch statistics
    survive resume (base.py:131-152); ours must round-trip meter state
    and the per-ACL history too."""
    cfg, _, _ = tiny_exp
    agent = BlockBasedImgCompLossyAgent(cfg)
    agent.loggers["train0"].update(1.5, 0.01, 0.3, n=4)
    agent.loggers["valid0"].update(2.5, 30.0, 0.2, n=2)
    agent.acl_history.append({"acl_itr": 0, "best_valid_loss": 2.5})
    agent.save_checkpoint()
    path = os.path.join(cfg.checkpoint_dir, "checkpoint.pkl")
    agent2 = BlockBasedImgCompLossyAgent(cfg)
    agent2.load_checkpoint(path)
    assert agent2.loggers["train0"].meter.state_dict() == \
        agent.loggers["train0"].meter.state_dict()
    assert agent2.loggers["train0"].meter.count == 4
    assert agent2.loggers["valid0"].meter.avg[1] == 30.0
    assert agent2.acl_history == agent.acl_history
    # weights-only loads must NOT clobber live meters
    agent2.loggers["train0"].update(9.9, 9.9, 9.9)
    c = agent2.loggers["train0"].meter.count
    agent2.load_checkpoint(path, weights_only=True)
    assert agent2.loggers["train0"].meter.count == c


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


def test_validate_tracks_reference_rd_loss(tiny_exp):
    """The validate scalar must be the reference's valid_loss =
    TrainRDLoss(x, clamp(xhat), info) = rate + lambda*D
    (blkbsdimgcomp_agent.py:70,393-397) — NOT any PSNR-derived score."""
    import jax.numpy as jnp

    from lbic_tpu.models import lbic as M
    from lbic_tpu.ops.blockfold import block_fold
    from lbic_tpu.train import losses as L

    cfg, _, valid_dir = tiny_exp
    agent = BlockBasedImgCompLossyAgent(cfg)
    _, valid = agent._loaders(mode="train")
    got = agent.validate(valid)
    # recompute by definition
    total = 0.0
    n = 0
    for x, z in valid:
        xb = block_fold(_f32(x), cfg.block_size)
        zb = block_fold(_f32(z), cfg.block_size)
        xhat, info = M.forward_open_loop(agent.md, agent.state.params,
                                         zb, xb, training=False)
        xhat = jnp.clip(xhat, -0.5, 0.5)
        loss, _, _ = L.train_rd_loss(xb, xhat, info, cfg.lambda_,
                                     cfg.distortion, cfg.block_size)
        total += float(loss)
        n += 1
    assert got == pytest.approx(total / n, rel=1e-5)


def test_validate_recu_reco_tracks_rd_and_saves_recos(tiny_exp):
    """Closed-loop validation scalar = bpp + lambda*mse on the committed
    reconstruction (agent:453,529); validate_recu_reco_fast mode saves
    recon PNGs under <exp_dir>/<valid-dir-name> (agent:543-545,
    image_dl_ACL.py:189-205)."""
    cfg, _, valid_dir = tiny_exp
    cfg.mode = "validate_recu_reco_fast"
    agent = BlockBasedImgCompLossyAgent(cfg)
    agent.run()
    out = os.path.join(cfg.exp_dir, os.path.basename(str(valid_dir)))
    assert os.path.isdir(out)
    assert len(os.listdir(out)) == 2
    # scalar matches the definition (clamp-commit path, quant8=False)
    _, valid = agent._loaders(mode="train")
    import jax.numpy as jnp

    from lbic_tpu.ops.blockfold import block_fold, pad_to_block_multiple

    got = agent.validate_recu_reco(valid, save_imgs=False, quant8=False)
    total = 0.0
    n = 0
    for x, z in valid:
        xp, _ = pad_to_block_multiple(_f32(x), cfg.block_size)
        xb = block_fold(xp, cfg.block_size)
        f = agent._cl_scan_fn(xb.shape, quant8=False)
        zhat, bits = f(agent.state.params, xb)
        bpp = float(bits) / (x.shape[0] * xp.shape[1] * xp.shape[2])
        mse = float(jnp.mean(jnp.square(xb - zhat)))
        total += bpp + cfg.lambda_ * mse
        n += 1
    assert got == pytest.approx(total / n, rel=1e-5)


def test_validate_recu_reco_quant8_changes_commit(tiny_exp):
    """quant8 (the reference's 8-bit round-trip commit, agent:443-445) is
    driven from config/mode and changes the committed reconstruction."""
    import jax.numpy as jnp

    from lbic_tpu.ops.blockfold import block_fold, pad_to_block_multiple

    cfg, _, _ = tiny_exp
    agent = BlockBasedImgCompLossyAgent(cfg)
    _, valid = agent._loaders(mode="train")
    x, _ = next(iter(valid))
    xp, _ = pad_to_block_multiple(_f32(x), cfg.block_size)
    xb = block_fold(xp, cfg.block_size)
    z8, _ = agent._cl_scan_fn(xb.shape, quant8=True)(agent.state.params,
                                                     xb)
    zf, _ = agent._cl_scan_fn(xb.shape, quant8=False)(agent.state.params,
                                                      xb)
    v = np.asarray(z8)
    # every committed value is on the 8-bit grid
    np.testing.assert_allclose(
        np.round((v + 0.5) * 255) / 255 - 0.5, v, atol=1e-6)
    assert not np.allclose(v, np.asarray(zf))


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


def test_max_epochs_itr0_cap(tiny_exp):
    """config.max_epochs_itr0 bounds ACL iteration 0 independently of
    max_epochs_per_acl: itr 0 has no patience-based exit (its exits are
    the rdloss threshold and the epoch cap), so campaigns give it a
    separate budget (tools/rd_campaign.py --epochs-itr0)."""
    cfg, _, _ = tiny_exp
    cfg.acl_itr0_rdloss_threshold = 0.0   # never exit via threshold
    cfg.max_epoch = 100
    cfg.max_epochs_per_acl = 50
    cfg.max_epochs_itr0 = 2
    agent = BlockBasedImgCompLossyAgent(cfg)
    agent.run()
    assert agent.current_epoch == 2


def test_resumed_state_is_json_serializable(tiny_exp):
    """Regression: ckpt.save numpy-ifies every scalar leaf; a resumed
    agent must coerce them back to python scalars so the acl_history
    dump (json.dump, agent.train_all_acl) doesn't crash mid-campaign
    with 'ndarray is not JSON serializable'."""
    cfg, _, _ = tiny_exp
    agent = BlockBasedImgCompLossyAgent(cfg)
    agent.best_valid_loss = 1.25
    agent.loggers["valid0"].update(2.5, 30.0, 0.2, n=2)
    # a history entry with a STRING field: old checkpoints numpy-ified
    # it into a 0-d <U7 array, which json could not serialize
    agent.acl_history.append({"acl_itr": 0, "mode": "ol_loss",
                              "chained": False, "lr": 8e-5})
    agent.save_checkpoint()
    path = os.path.join(cfg.checkpoint_dir, "checkpoint.pkl")
    agent2 = BlockBasedImgCompLossyAgent(cfg)
    agent2.load_checkpoint(path)
    assert type(agent2.current_epoch) is int
    assert type(agent2.best_valid_loss) is float
    assert type(agent2.plateau.best) is float
    # meters keep accumulating python floats after resume
    agent2.loggers["valid0"].update(1.0, 28.0, 0.1)
    loss, psnr, rate = agent2.loggers["valid0"].meter.avg
    entry = {"epoch": agent2.current_epoch,
             "best_valid_loss": agent2.best_valid_loss,
             "last_valid": {"loss": loss, "psnr": psnr, "bpp": rate}}
    json.dumps([entry])  # must not raise
    json.dumps(agent2.acl_history)  # restored history must serialize too
    assert agent2.acl_history[0]["mode"] == "ol_loss"


def test_mode_switch_fires_on_epoch_cap_exit(tiny_exp):
    """The ol->cl + chained switch (reference agent:162-176) must also be
    evaluated when an ACL iteration exits via the bounded-compute epoch
    cap — otherwise capped campaigns can never engage chained training."""
    cfg, _, _ = tiny_exp
    cfg.max_epoch = 100
    cfg.max_epochs_per_acl = 1
    agent = BlockBasedImgCompLossyAgent(cfg)
    # loaders built at itr 0 (no __acl_ sibling dirs exist in the fixture)
    train, valid = agent._loaders(mode="train")
    agent.acl_itr = 2
    # make closed-loop improvement impossible: stalled vs previous itr
    agent.best_validrr_loss = 1e-6
    agent.prev_aclitr_best_validrr_loss = 1e-6
    change_mode = agent._run_dl_until_converged(train, valid)
    assert change_mode is True
    # and a clearly-improving iteration must NOT switch
    agent.best_validrr_loss = 0.5
    agent.prev_aclitr_best_validrr_loss = 10.0
    assert agent._run_dl_until_converged(train, valid) is False


def test_regen_on_resume_rewrites_current_itr_pairs(tiny_exp):
    """A campaign resumed at acl_itr > 0 must be able to rebuild the
    __acl_<s>_<itr> recon dirs from the loaded weights (they are shared
    across lambda points and may be stale or absent on resume)."""
    cfg, train_dir, valid_dir = tiny_exp
    cfg.regen_on_resume = True
    cfg.max_epoch = 1  # the ACL loop exits right after the first epoch
    cfg.max_epochs_per_acl = 1
    agent = BlockBasedImgCompLossyAgent(cfg)
    agent.acl_itr = 2  # resume state: itr 2, but no __acl_A_2 dirs exist
    agent.train_all_acl()
    td = acl_dir(str(train_dir), cfg.session, 2)
    vd = acl_dir(str(valid_dir), cfg.session, 2)
    assert len(os.listdir(td)) == 6
    assert len(os.listdir(vd)) == 2


def test_epochs_this_itr_cap_survives_resume(tiny_exp):
    """A repeatedly-killed campaign point must not train unboundedly:
    the per-ACL-iteration epoch counter is checkpointed, so a resumed
    run continues toward max_epochs_per_acl instead of restarting the
    cap from zero (advisor r3)."""
    cfg, _, _ = tiny_exp
    cfg.acl_itr0_rdloss_threshold = 0.0
    cfg.max_epoch = 100
    cfg.max_epochs_itr0 = 3
    agent = BlockBasedImgCompLossyAgent(cfg)
    train, valid = agent._loaders(mode="train")
    agent._run_dl_until_converged(train, valid)
    assert agent.epochs_this_itr == 3
    agent.save_checkpoint()
    path = os.path.join(cfg.checkpoint_dir, "checkpoint.pkl")
    # resumed agent: counter restored, cap already exhausted -> the
    # iteration exits without training any further epochs
    agent2 = BlockBasedImgCompLossyAgent(cfg)
    agent2.load_checkpoint(path)
    assert agent2.epochs_this_itr == 3
    before = agent2.current_epoch
    agent2._run_dl_until_converged(train, valid)
    assert agent2.current_epoch == before


def test_validrr_score_uses_configured_distortion(tiny_exp):
    """For ms-ssim-trained models the closed-loop validation score must
    be bpp + lambda*(1 - ms_ssim) (reference valid_loss = TrainRDLoss
    with the configured distortion, agent:70), not the mse score — an
    mse score would select wrong best-rr checkpoints."""
    cfg, _, valid_dir = tiny_exp
    from lbic_tpu.data.dataset import BatchLoader, ImageDatasetACL

    ds = ImageDatasetACL([str(valid_dir)], patch_size=0, augment=False)
    scores = {}
    for dist_name in ("mse", "ms_ssim"):
        cfg.distortion = dist_name
        agent = BlockBasedImgCompLossyAgent(cfg)
        loader = BatchLoader(ds, 2, shuffle=False, drop_last=False)
        scores[dist_name] = agent.validate_recu_reco(loader, quant8=False)
    # same fresh params/seed, same bpp term; the two distortion scales
    # differ by orders of magnitude at lambda=100, so identical scores
    # would mean the config was ignored
    assert np.isfinite(scores["mse"]) and np.isfinite(scores["ms_ssim"])
    assert scores["mse"] != pytest.approx(scores["ms_ssim"], rel=1e-3)


def test_resumed_itr_keeps_best_stats(tiny_exp):
    """VERDICT r4 #7: a resume that re-enters a half-finished ACL
    iteration must keep the checkpointed per-itr stats — round 4's
    acl_report had inf/nan rows because re-entry reset best_valid_loss
    and dropped last_valid(rr)_stats."""
    cfg, _, _ = tiny_exp
    agent = BlockBasedImgCompLossyAgent(cfg)
    agent.best_valid_loss = 1.25
    agent.best_validrr_loss = 2.5
    agent.epochs_this_itr = 1
    agent.last_valid_stats = {"loss": 1.25, "psnr": 30.0, "bpp": 0.2}
    agent.last_validrr_stats = {"loss": 2.5, "psnr": 28.0, "bpp": 0.25}
    agent.save_checkpoint()
    path = os.path.join(cfg.checkpoint_dir, "checkpoint.pkl")

    agent2 = BlockBasedImgCompLossyAgent(cfg)
    agent2.load_checkpoint(path)
    assert agent2.last_valid_stats == agent.last_valid_stats
    assert agent2.last_validrr_stats == agent.last_validrr_stats
    # re-entering the SAME iteration (epochs_this_itr > 0) keeps the
    # best; only a fresh iteration (epochs_this_itr == 0) resets it
    agent2.cfg.max_epoch = 0  # epoch loop exits immediately
    train, valid = agent2._loaders(mode="train")
    agent2._run_dl_until_converged(train, valid)
    assert agent2.best_valid_loss == 1.25

    agent2.epochs_this_itr = 0
    agent2._run_dl_until_converged(train, valid)
    assert agent2.best_valid_loss == float("inf")


def test_cl_scan_chunked_matches_whole_batch(tiny_exp):
    """Chunked closed-loop validation (the B=4 TPU-worker-crash fix:
    agent.CL_SCAN_MAX_ELEMS caps elements per compiled scan) must be
    numerically identical to one whole-batch scan — per-image scans are
    independent and bits are summed."""
    cfg, _, _ = tiny_exp
    agent = BlockBasedImgCompLossyAgent(cfg)
    _, valid = agent._loaders(mode="train")
    whole = agent.validate_recu_reco(valid, save_imgs=False, quant8=True)
    agent.loggers["rcrec"].meter.reset()
    agent.CL_SCAN_MAX_ELEMS = 1  # force one image per scan
    chunked = agent.validate_recu_reco(valid, save_imgs=False, quant8=True)
    assert chunked == pytest.approx(whole, rel=1e-5)
