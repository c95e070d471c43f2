"""Scatter-plot per-experiment per-block RD dumps.

Mirror of experiments/results_parser.py: walk experiment subdirectories,
read each `results.json` ({block: {dist, rate}} schema written by
validate_recu_reco's per-block dump, agents/blkbsdimgcomp_agent.py:460-475),
and scatter rate-vs-dist per experiment.

    python -m lbic_tpu.tools.results_parser [root] [-o out.png]
"""

import argparse
import json
import os

import numpy as np


def parse_results_json(fname):
    """-> (dist, rate) arrays from a {name: {dist, rate}} dict."""
    with open(fname) as f:
        data = json.load(f)
    arr = np.array([[v["dist"], v["rate"]] for v in data.values()])
    return arr[:, 0], arr[:, 1]


def collect(root="."):
    out = {}
    for d in sorted(os.listdir(root)):
        fname = os.path.join(root, d, "results.json")
        if os.path.isdir(os.path.join(root, d)) and os.path.exists(fname):
            out[d] = parse_results_json(fname)
    return out


def plot(results, out_path=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    for name, (dist, rate) in results.items():
        ax.scatter(rate, dist, label=name, s=8)
    ax.set_xlabel("rate")
    ax.set_ylabel("dist")
    ax.legend(fontsize=7)
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root", nargs="?", default=".")
    p.add_argument("-o", "--out", default="results_scatter.png")
    a = p.parse_args(argv)
    results = collect(a.root)
    if not results:
        print("no results.json found under", a.root)
        return None
    out = plot(results, a.out)
    print(out)
    return out


if __name__ == "__main__":
    main()
