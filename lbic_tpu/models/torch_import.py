"""PyTorch checkpoint -> lbic_tpu params importer.

Loads the reference's `.pth.tar` training checkpoints (saved at
agents/base.py:131-152 with model weights under 'state_dict0', or
weights-only checkpoints with a single key, base.py:95-96) and converts
them to this framework's params pytree:

  * conv weights: OIHW -> HWIO transpose,
  * GDN beta/gamma: copied as-is (same sqrt-reparam storage, see ops/gdn.py),
  * masked conv weights arrive already zeroed at masked taps
    (masked_conv2d.py:20 pins them each forward) — imported verbatim,
  * GaussianConditional buffers (scale_table/_offset/_quantized_cdf/...) are
    ignored: CDF tables are rebuilt natively via ops.entropy.build_gaussian_cdfs.
"""

import numpy as np


def _to_np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def state_dict_to_params(state_dict, md):
    """torch state_dict (name -> tensor) -> params pytree for ModelDef md."""
    out = {}
    for name, t in state_dict.items():
        parts = name.split(".")
        top = parts[0]
        if top == "conditional_gaussian_model":
            continue
        a = _to_np(t)
        if top in ("prtr_forward1", "prtr_forward2", "prtr_inverse1",
                   "prtr_inverse2"):
            leaf = out.setdefault(top, {})
            if parts[1] == "weight":
                leaf["w"] = a.transpose(2, 3, 1, 0).astype(np.float32)
            elif parts[1] == "bias":
                leaf["b"] = a.astype(np.float32)
            # 'mask' buffers are recomputed, skip
        elif top in ("prtr_forward3", "prtr_inverse3", "get_meanscale",
                     "res_net"):
            idx, kind = parts[1], parts[2]
            leaf = out.setdefault(top, {}).setdefault(idx, {})
            if kind == "weight":
                leaf["w"] = a.transpose(2, 3, 1, 0).astype(np.float32)
            elif kind == "bias":
                leaf["b"] = a.astype(np.float32)
            elif kind == "beta":
                leaf["beta"] = a.astype(np.float32)
            elif kind == "gamma":
                leaf["gamma"] = a.astype(np.float32)
            # beta_reparam/gamma_reparam pedestal buffers: constants, skip
        # anything else (masks, entropy buffers): skip
    return out


def load_torch_checkpoint(path, md):
    """Load a reference .pth.tar; returns (params, full_checkpoint_dict)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict0" in ckpt:
        sd = ckpt["state_dict0"]
    elif isinstance(ckpt, dict) and len(ckpt) == 1:
        sd = next(iter(ckpt.values()))
    else:
        sd = ckpt
    return state_dict_to_params(sd, md), (ckpt if isinstance(ckpt, dict) else {})
