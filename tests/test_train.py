"""Training-step tests: loss decreases, loss-switch semantics, chained
training, plateau scheduler, and the whole step running SPMD over the
virtual 8-device CPU mesh (data x row sharding)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lbic_tpu.config import LbicConfig
from lbic_tpu.models import lbic as M
from lbic_tpu.parallel import make_mesh, shard_batch, batch_sharding
from lbic_tpu.train import (
    ReduceLROnPlateau,
    init_state,
    make_eval_step,
    make_train_step,
    get_lr,
    set_lr,
)


def tiny_md():
    return M.make_model_def(
        LbicConfig(net_version="v9", block_size=4, KS=(3, 1, 1, 1),
                   N=16, M=8))


def batch(md, n=4, hb=8, wb=8, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-0.5, 0.5, (n, hb, wb, md.cx)).astype(np.float32)
    return jnp.asarray(x)


def test_loss_decreases():
    md = tiny_md()
    state = init_state(md, jax.random.PRNGKey(0), 1e-3)
    step = make_train_step(md, lambda_=100.0, donate=False)
    x = batch(md)
    first = last = None
    for i in range(30):
        key = jax.random.PRNGKey(i)
        state, m = step(state, x, x, key)
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
    assert np.isfinite(last)
    assert last < first


def test_loss_switch_warmup():
    md = tiny_md()
    state = init_state(md, jax.random.PRNGKey(0), 1e-3,
                       training_loss_switch=0)
    assert not bool(state.use_rd)
    step = make_train_step(md, lambda_=100.0, donate=False)
    x = batch(md)
    _, m = step(state, x, x, jax.random.PRNGKey(0))
    # warmup loss = lambda * distortion only
    assert np.isclose(float(m["loss"]), 100.0 * float(m["distortion"]),
                      rtol=1e-5)
    # flipping the traced bool must NOT recompile (same jitted fn works)
    state2 = init_state(md, jax.random.PRNGKey(0), 1e-3,
                        training_loss_switch=1)
    _, m2 = step(state2, x, x, jax.random.PRNGKey(0))
    assert np.isclose(
        float(m2["loss"]),
        float(m2["rate"]) + 100.0 * float(m2["distortion"]), rtol=1e-5)


def test_chained_training_runs():
    md = tiny_md()
    state = init_state(md, jax.random.PRNGKey(0), 1e-3)
    step = make_train_step(md, lambda_=100.0, chained=True, donate=False)
    x = batch(md)
    state, m = step(state, x, x, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_lr_set_get_no_recompile():
    md = tiny_md()
    state = init_state(md, jax.random.PRNGKey(0), 1e-3)
    assert np.isclose(get_lr(state), 1e-3)
    state = set_lr(state, 8e-4)
    assert np.isclose(get_lr(state), 8e-4)
    step = make_train_step(md, lambda_=100.0, donate=False)
    x = batch(md)
    state, _ = step(state, x, x, jax.random.PRNGKey(0))
    assert np.isclose(get_lr(state), 8e-4)


def test_plateau_scheduler():
    s = ReduceLROnPlateau(factor=0.8, patience=2, min_lr=4e-5)
    lr = 1e-3
    lr = s.step(1.0, lr)  # improvement (best=inf)
    assert lr == 1e-3
    for _ in range(2):
        lr = s.step(1.0, lr)  # no improvement x2 == patience
    assert lr == 1e-3
    lr = s.step(1.0, lr)  # 3rd bad epoch -> reduce
    assert np.isclose(lr, 8e-4)
    # floors at min_lr
    for _ in range(40):
        lr = s.step(1.0, lr)
    assert lr >= 4e-5


def test_spmd_mesh_training():
    """Full train step with batch sharded (data=4, row=2) over 8 CPU
    devices; result must match the unsharded run."""
    md = tiny_md()
    mesh = make_mesh(data=4, row=2)
    state = init_state(md, jax.random.PRNGKey(0), 1e-3)
    step = make_train_step(md, lambda_=100.0, donate=False)
    x = batch(md, n=8, hb=8, wb=8)
    xs = shard_batch(mesh, x)
    state_sh, m_sh = step(state, xs, xs, jax.random.PRNGKey(0))
    state_un, m_un = step(state, x, x, jax.random.PRNGKey(0))
    assert np.isclose(float(m_sh["loss"]), float(m_un["loss"]), rtol=1e-5)
    # eval step too
    ev = make_eval_step(md, lambda_=100.0)
    r = ev(state_sh.params, xs, xs)
    assert np.isfinite(float(r["psnr"]))


def test_amp_bf16_training():
    md = tiny_md()
    state = init_state(md, jax.random.PRNGKey(0), 1e-3)
    from lbic_tpu.train.step import make_train_step as mts

    step = mts(md, lambda_=100.0, donate=False, amp=True)
    x = batch(md)
    for i in range(5):
        state, m = step(state, x, x, jax.random.PRNGKey(i))
    assert np.isfinite(float(m["loss"]))
    # params stay f32
    assert all(a.dtype == jnp.float32
               for a in jax.tree.leaves(state.params))


def test_grad_accumulation():
    md = tiny_md()
    from lbic_tpu.train.step import make_train_step as mts

    state = init_state(md, jax.random.PRNGKey(0), 1e-3, grad_acc_iters=2)
    step = mts(md, lambda_=100.0, donate=False, grad_acc_iters=2)
    x = batch(md)
    p0 = jax.tree.leaves(state.params)[0].copy()
    state, _ = step(state, x, x, jax.random.PRNGKey(0))
    p1 = jax.tree.leaves(state.params)[0]
    # first micro-step: no parameter update yet
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    state, _ = step(state, x, x, jax.random.PRNGKey(1))
    p2 = jax.tree.leaves(state.params)[0]
    assert not np.array_equal(np.asarray(p0), np.asarray(p2))
    # lr get/set works through the MultiSteps wrapper
    assert np.isclose(get_lr(state), 1e-3)
    set_lr(state, 5e-4)
    assert np.isclose(get_lr(state), 5e-4)


def test_loss_variants_two_rate_terms():
    """forward2/forward3/rate-loss parity (rate_dist.py:52-67,
    rate_distortion_loss.py:5-22)."""
    from lbic_tpu.train import losses as L

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 4, 4, 12), np.float32) - 0.5)
    xh = x + 0.01
    si1 = jnp.asarray(rng.random((2, 4, 4, 3), np.float32))
    si2 = jnp.asarray(rng.random((2, 4, 4, 3), np.float32))

    loss, d, r1, r2 = L.train_rd_loss2(x, xh, si1, si2, 10.0)
    assert np.isclose(float(loss), float(r1) + float(r2) + 10.0 * float(d))
    # reference rate normalization: sum(si) / numel(x) * 3
    assert np.isclose(float(r1), float(jnp.sum(si1)) / x.size * 3.0)

    lw, dw, *_ = L.train_rd_loss2(x, xh, si1, si2, 10.0, d_only=True)
    assert np.isclose(float(lw), 10.0 * float(dw))

    l3, d3, r1b, r2b = L.train_rd_loss3(x, xh, si1, [si2, si2], 10.0)
    assert np.isclose(float(r2b), 2 * float(r2))
    assert np.isclose(float(l3), float(r1b) + float(r2b) + 10.0 * float(d3))

    assert np.isclose(float(L.train_rate_loss(si1)),
                      float(jnp.mean(si1)))
    assert L.valid_rate_loss is L.train_rate_loss
