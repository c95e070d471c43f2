"""Side-by-side ACL-trajectory table for the chained-training ablation
(VERDICT r3 #8): same lambda, same budget, chained training forced ON vs
OFF — does the reference's signature mechanism
(agents/blkbsdimgcomp_agent.py:162-176) pay off in this rebuild?

    python -m lbic_tpu.tools.ablation_report \
        --on abl_on/exp_845.325 --off abl_off/exp_845.325 \
        --out results/ablation_chained/table.txt
"""

import argparse
import json
import os


def _rows(exp_dir):
    p = os.path.join(exp_dir, "out", "acl_history.json")
    with open(p) as f:
        hist = json.load(f)
    out = []
    for h in hist:
        rr = h.get("last_validrr") or {}
        out.append({
            "itr": h["acl_itr"], "mode": h["mode"],
            "chained": h["chained"],
            "best_validrr": h["best_validrr_loss"],
            "rr_psnr": rr.get("psnr", float("nan")),
            "rr_bpp": rr.get("bpp", float("nan")),
        })
    return out


def _results(exp_dir):
    p = os.path.join(exp_dir, "out", "results.json")
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        r = json.load(f)["results"]
    import numpy as np
    return {k: float(np.mean(r[k])) for k in ("psnr", "bpp")}


def build_table(on_dir, off_dir):
    on, off = _rows(on_dir), _rows(off_dir)
    lines = ["chained-training ablation: same lambda/seed/budget, "
             "chained forced ON vs OFF",
             "",
             "itr | ON  mode/chained  best_validrr  rr_psnr  rr_bpp | "
             "OFF mode/chained  best_validrr  rr_psnr  rr_bpp"]
    for i in range(max(len(on), len(off))):
        def fmt(rows):
            if i >= len(rows):
                return " " * 46
            r = rows[i]
            return (f"{r['mode']:<8}/{str(r['chained']):<5} "
                    f"{r['best_validrr']:>11.6f} {r['rr_psnr']:>8.3f} "
                    f"{r['rr_bpp']:>7.4f}")
        lines.append(f"{i:>3} | {fmt(on)} | {fmt(off)}")
    ron, roff = _results(on_dir), _results(off_dir)
    if ron and roff:
        lines += ["", f"codec eval ON : {ron['psnr']:.2f} dB @ "
                      f"{ron['bpp']:.4f} bpp",
                  f"codec eval OFF: {roff['psnr']:.2f} dB @ "
                  f"{roff['bpp']:.4f} bpp"]
    return "\n".join(lines) + "\n"


def _rows_from_report(results_dir):
    """Parse the per-itr table out of a campaign's archived
    acl_report.txt (written by rd_campaign into --out). Fallback for
    when the campaign *work* dir (and its acl_history.json) is gone but
    the results dir survives — e.g. across a VM recycle."""
    rows = []
    with open(os.path.join(results_dir, "acl_report.txt")) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 7 and parts[0] != "lambda":
                rows.append({
                    "itr": int(parts[1]), "mode": parts[2],
                    "chained": parts[3] == "True",
                    "best_validrr": float(parts[4]),
                    "rr_psnr": float(parts[6]),
                    "rr_bpp": float("nan"),
                })
    return rows


def _results_from_json(results_dir):
    p = os.path.join(results_dir, "lbic.json")
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        r = json.load(f)["results"]
    return {"psnr": r["psnr"][0], "bpp": r["bpp"][0]}


def build_table_from_reports(on_dir, off_dir):
    on, off = _rows_from_report(on_dir), _rows_from_report(off_dir)
    lines = ["chained-training ablation: same lambda/seed/budget, "
             "chained forced ON vs OFF",
             "(from archived acl_report.txt; rr_bpp not recorded there)",
             "",
             "itr | ON  mode/chained  best_validrr  rr_psnr  rr_bpp | "
             "OFF mode/chained  best_validrr  rr_psnr  rr_bpp"]
    for i in range(max(len(on), len(off))):
        def fmt(rows):
            if i >= len(rows):
                return " " * 46
            r = rows[i]
            return (f"{r['mode']:<8}/{str(r['chained']):<5} "
                    f"{r['best_validrr']:>11.6f} {r['rr_psnr']:>8.3f} "
                    f"{r['rr_bpp']:>7.4f}")
        lines.append(f"{i:>3} | {fmt(on)} | {fmt(off)}")
    ron, roff = _results_from_json(on_dir), _results_from_json(off_dir)
    if ron and roff:
        lines += ["", f"codec eval ON : {ron['psnr']:.2f} dB @ "
                      f"{ron['bpp']:.4f} bpp",
                  f"codec eval OFF: {roff['psnr']:.2f} dB @ "
                  f"{roff['bpp']:.4f} bpp"]
    return "\n".join(lines) + "\n"


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--on", dest="on_dir", required=True)
    ap.add_argument("--off", dest="off_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--from-reports", action="store_true",
                    help="read the archived results dirs (acl_report.txt"
                         " + lbic.json) instead of campaign work dirs")
    args = ap.parse_args(argv)
    if args.from_reports:
        table = build_table_from_reports(args.on_dir, args.off_dir)
    else:
        table = build_table(args.on_dir, args.off_dir)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(table)
    print(table)


if __name__ == "__main__":
    main()
