"""Image display + RGB histogram helpers (utils/image_plots.py:7-64).

Headless (Agg) matplotlib: `show=False` + `out_path` saves to disk, which
is the useful mode on a TPU host. Includes the block fold/unfold pair the
reference duplicates here (utils/image_plots.py:67-87) by re-exporting the
canonical ops implementation.
"""

import numpy as np

from lbic_tpu.ops.blockfold import block_fold, block_unfold  # noqa: F401 (parity re-export)


def _to_uint8(img):
    """Accepts HWC/CHW float in [-0.5,0.5] or [0,1], or uint8."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] in (1, 3) and img.shape[-1] not in (1, 3):
        img = np.moveaxis(img, 0, -1)
    if img.dtype != np.uint8:
        lo = float(img.min())
        if lo < -1e-3:  # [-0.5, 0.5] convention
            img = img + 0.5
        img = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
    return img


def show_image(img, title=None, out_path=None, show=False):
    """Display / save an image (reference display_img, image_plots.py:7-30)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = _to_uint8(img)
    fig, ax = plt.subplots()
    ax.imshow(img, cmap="gray" if img.ndim == 2 else None)
    ax.axis("off")
    if title:
        ax.set_title(title)
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
    if show:  # pragma: no cover - interactive
        plt.show()
    plt.close(fig)
    return out_path


def rgb_histogram(img, bins=256, out_path=None, show=False):
    """Per-channel histogram (reference plot_histogram, image_plots.py:33-64).

    Returns {channel: (counts, bin_edges)} and optionally saves a plot."""
    img = _to_uint8(img)
    if img.ndim == 2:
        img = img[:, :, None]
    names = ["r", "g", "b"][: img.shape[-1]]
    hists = {}
    for c, name in enumerate(names):
        hists[name] = np.histogram(img[..., c].ravel(), bins=bins,
                                   range=(0, 255))
    if out_path or show:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        for name, (cnt, edges) in hists.items():
            ax.plot(edges[:-1], cnt, label=name,
                    color=name if name in "rgb" else None)
        ax.set_xlabel("pixel value")
        ax.set_ylabel("count")
        ax.legend()
        if out_path:
            fig.savefig(out_path, dpi=120, bbox_inches="tight")
        if show:  # pragma: no cover - interactive
            plt.show()
        plt.close(fig)
    return hists
