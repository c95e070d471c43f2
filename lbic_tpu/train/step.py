"""Open-loop RD training step, jit-compiled over a device mesh.

Reference training loop semantics (agents/blkbsdimgcomp_agent.py:224-306):
  * forward: xhat, self_info = model(zhat, x) with additive-noise
    quantization (training mode);
  * loss: TrainDLoss warmup until rd_loss < loss_switch_thr, then
    TrainRDLoss (agent:297-302) — here a traced boolean `use_rd` in the
    train state, switched by the driver;
  * chained training (agent:244-248): optional second pass model(xhat0, x),
    losses mixed 0.5/0.5;
  * grad-norm clip 0.5 (agent:281), Adam (agent:44), ReduceLROnPlateau
    (factor 0.8, patience 4, min_lr 4e-5, agent:52-54) — the plateau
    logic runs host-side (plateau.py); the LR itself is dynamic optax
    hyperparam state so changing it does not recompile.

TPU mapping: the whole step is one jitted function; the caller places the
batch with parallel/mesh.py shardings (batch over 'data', block-rows over
'row') and XLA inserts the gradient psum / conv halo exchanges.
"""

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from lbic_tpu.models import lbic as M
from lbic_tpu.ops import metrics
from lbic_tpu.train import losses as L

MIN_LR = 4e-5
GRAD_CLIP = 0.5


def make_optimizer(learning_rate: float, grad_acc_iters: int = 1):
    """Adam with LR as dynamic hyperparam state. Gradient clipping is done
    in the train step (element-wise value clip 0.5, applied only in RD
    mode — agent:272-281 clip_grad_value_ gated on training_loss_switch).
    grad_acc_iters > 1 wraps in optax.MultiSteps (the reference's
    gradient accumulation, agent:244/271-276)."""
    opt = optax.inject_hyperparams(
        lambda learning_rate: optax.adam(learning_rate)
    )(learning_rate=learning_rate)
    if grad_acc_iters > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=grad_acc_iters)
    return opt


def _hyper(opt_state):
    """The hyperparams dict, whether or not MultiSteps wraps it."""
    if hasattr(opt_state, "inner_opt_state"):
        return opt_state.inner_opt_state.hyperparams
    return opt_state.hyperparams


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar
    use_rd: jnp.ndarray  # bool scalar: False = distortion-only warmup


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step", "use_rd"],
    meta_fields=[],
)


def init_state(md: M.ModelDef, key, learning_rate: float,
               training_loss_switch: int = 1,
               grad_acc_iters: int = 1) -> TrainState:
    params = M.init_params(md, key)
    opt = make_optimizer(learning_rate, grad_acc_iters)
    return TrainState(
        params=params,
        opt_state=opt.init(params),
        step=jnp.zeros((), jnp.int32),
        use_rd=jnp.asarray(bool(training_loss_switch)),
    )


def get_lr(state: TrainState) -> float:
    return float(_hyper(state.opt_state)["learning_rate"])


def set_lr(state: TrainState, lr: float) -> TrainState:
    _hyper(state.opt_state)["learning_rate"] = jnp.asarray(
        lr, jnp.float32)
    return state


def _as_image(t):
    """Accept uint8 batches and convert on device to the reference's
    float range [-0.5, 0.5] (ToTensor() - 0.5, image_dl_ACL.py). The
    host->device link is the training bottleneck on a tunneled TPU;
    shipping uint8 quarters the per-step transfer."""
    if t.dtype == jnp.uint8:
        return t.astype(jnp.float32) / 255.0 - 0.5
    return t


def _loss_fn(params, md, x, zhat, key, lambda_, distortion, chained,
             use_rd, amp=False):
    x = _as_image(x)
    zhat = _as_image(zhat)
    if amp:
        # bf16 compute (the reference's AMP autocast, agent:41-42,240):
        # params and activations in bfloat16, loss math back in f32
        cast = lambda t: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, t)
        params, x, zhat = cast(params), cast(x), cast(zhat)
    xhat, info = M.forward_open_loop(md, params, zhat, x, key=key,
                                     training=True)
    if amp:
        xhat = xhat.astype(jnp.float32)
        info = info.astype(jnp.float32)
        x = x.astype(jnp.float32)
    loss_rd, d, rate = L.train_rd_loss(x, xhat, info, lambda_, distortion,
                                       md.B)
    loss_d = lambda_ * d
    loss = jnp.where(use_rd, loss_rd, loss_d)
    if chained:
        # second pass conditioned on this pass's reconstruction
        key2 = jax.random.fold_in(key, 1)
        xhat1 = jnp.clip(xhat, -0.5, 0.5)
        if amp:
            xhat1 = xhat1.astype(jnp.bfloat16)
        xhat2, info2 = M.forward_open_loop(md, params, xhat1, x, key=key2,
                                           training=True)
        loss2_rd, d2, rate2 = L.train_rd_loss(x, xhat2, info2, lambda_,
                                              distortion, md.B)
        loss2 = jnp.where(use_rd, loss2_rd, lambda_ * d2)
        loss = 0.5 * loss + 0.5 * loss2
        d = 0.5 * d + 0.5 * d2
        rate = 0.5 * rate + 0.5 * rate2
    return loss, (d, rate)


def make_train_step(md: M.ModelDef, lambda_: float, distortion: str = "mse",
                    chained: bool = False, donate: bool = True,
                    amp: bool = False, grad_acc_iters: int = 1):
    """Returns jitted train_step(state, x, zhat, key) ->
    (state', metrics dict). Recompiles only when `chained` flips
    (once per ACL convergence-mode switch, agent:162-176)."""
    opt = make_optimizer(0.0, grad_acc_iters)  # lr comes from state

    def step(state: TrainState, x, zhat, key):
        (loss, (d, rate)), grads = jax.value_and_grad(
            _loss_fn, has_aux=True)(
                state.params, md, x, zhat, key, lambda_, distortion,
                chained, state.use_rd, amp)
        # element-wise value clip 0.5, only once in RD mode (agent:272-281)
        grads = jax.tree.map(
            lambda g: jnp.where(state.use_rd,
                                jnp.clip(g, -GRAD_CLIP, GRAD_CLIP), g),
            grads)
        updates, opt_state = opt.update(grads, state.opt_state,
                                        state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1,
            use_rd=state.use_rd)
        return new_state, {"loss": loss, "distortion": d, "rate": rate}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(md: M.ModelDef, lambda_: float, distortion: str = "mse"):
    """Open-loop validation step (agent:349-401): dequantize-mode forward,
    xhat clamped. The scalar the reference minimizes during validation is
    the TRAIN RD loss on the clamped reconstruction —
    `self.valid_loss = TrainRDLoss(...)` (blkbsdimgcomp_agent.py:70) applied
    at agent:393 — i.e. rate + lambda*D, NOT a PSNR-based score. That value
    feeds the plateau scheduler (agent:397) and the ACL convergence
    counters. PSNR is returned for logging only."""

    def step(params, x, zhat):
        x = _as_image(x)
        zhat = _as_image(zhat)
        xhat, info = M.forward_open_loop(md, params, zhat, x,
                                         training=False)
        xhat = jnp.clip(xhat, -0.5, 0.5)
        loss, d, rate = L.train_rd_loss(x, xhat, info, lambda_,
                                        distortion, md.B)
        p = metrics.psnr(x, xhat, data_range=1.0)
        return {"loss": loss, "distortion": d, "psnr": p, "rate": rate}

    return jax.jit(step)
