"""Checkpoint save/load.

Logical schema mirrors the reference's torch.save dict (agents/base.py:131-152):
model params, optimizer state, counters (epoch/iteration), best-loss
scalars, LR-scheduler and logger states — everything needed for
`resume_training` to continue exactly (base.py:89-124).

Format: a single pickle of numpy-ified pytrees (np arrays are portable and
dependency-free; TPU arrays are pulled to host). Weights-only export
(`save_weights`) mirrors experiments/extract_model_weights_only.py:12-33.
Also loads the reference's .pth.tar via models/torch_import.py.
"""

import os
import pickle
import tempfile

import jax
import numpy as np


def _to_host(tree):
    """Pull device arrays to host; leave python scalars/strings/bools
    untouched (numpy-ifying them broke downstream json.dump of restored
    state — e.g. 'ol_loss' became a 0-d <U7 array)."""
    return jax.tree.map(
        lambda a: np.asarray(a) if isinstance(a, (jax.Array, np.ndarray))
        else a, tree)


def save(path: str, payload: dict) -> None:
    """Atomic pickle write of a dict of pytrees/scalars."""
    payload = _to_host(payload)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_weights(path: str, params) -> None:
    save(path, {"params": params})


def load_any(path: str, md=None):
    """Load either this framework's pickle or a reference .pth.tar
    (auto-detected); returns the full payload dict with 'params'."""
    if path.endswith((".pth.tar", ".pth", ".pt")):
        from lbic_tpu.models.torch_import import load_torch_checkpoint

        params, ckpt = load_torch_checkpoint(path, md)
        return {"params": params, "torch_checkpoint": True}
    return load(path)
