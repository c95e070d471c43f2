"""RD-curve plotting (utils_cai/plot/__main__.py + utils/plot.py
equivalent):

    python -m lbic_tpu.tools.plot_rd a.json b.json -o rd.png \
        [--metric psnr|ms-ssimdb]

Each input is a results JSON in the reference schema."""

import argparse
import json


def plot(paths, metric="psnr", output="rd.png", title="RD curves"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        r = d["results"]
        ys = r.get(metric)
        if ys is None and metric == "ms-ssimdb":
            import math

            ys = [-10 * math.log10(1 - v) for v in r["ms-ssim"]]
        order = sorted(range(len(r["bpp"])), key=lambda i: r["bpp"][i])
        ax.plot([r["bpp"][i] for i in order], [ys[i] for i in order],
                marker="o", label=d.get("name", p))
    ax.set_xlabel("bpp")
    ax.set_ylabel("PSNR (dB)" if metric == "psnr" else metric)
    ax.set_title(title)
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(output, dpi=150)
    return output


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("results", nargs="+")
    ap.add_argument("--metric", default="psnr")
    ap.add_argument("-o", "--output", default="rd.png")
    ap.add_argument("--title", default="RD curves")
    args = ap.parse_args(argv)
    print(plot(args.results, args.metric, args.output, args.title))


if __name__ == "__main__":
    main()
