"""Re-evaluate an already-trained campaign's checkpoints on a different
held-out image set, and recompute anchors + BD (VERDICT r4 #5: the
flagship BD numbers must rest on the broadened >=12-image eval set, not
the original 6).

Training is untouched — this only re-runs the real-codec eval
(agent.eval_model, reference agents/blkbsdimgcomp_agent.py:560-641) per
lambda point with the point's best closed-loop checkpoint, then rebuilds
lbic.json / bd.txt / rd.png in the reference results schema.

    python -m lbic_tpu.tools.reeval --work rd_flagship_r4 \
        --test-dir data_eval --out results/rd_flagship_eval17 \
        --lambdas 435.6675 845.325 3140.7075 11704.5 --n 768 --m 96
"""

import argparse
import glob
import json
import os

import numpy as np

from lbic_tpu.tools.rd_campaign import (RESULT_KEYS, _best_rr_checkpoint,
                                        run_anchor_subprocess)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work", required=True,
                    help="campaign work dir holding exp_<lam>/checkpoints")
    ap.add_argument("--test-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--lambdas", type=float, nargs="+", required=True)
    ap.add_argument("--n", type=int, default=768)
    ap.add_argument("--m", type=int, default=96)
    ap.add_argument("--block-size", type=int, default=8)
    ap.add_argument("--ks", type=int, nargs=4, default=[3, 1, 1, 1])
    ap.add_argument("--label", default="lbic_tpu")
    args = ap.parse_args(argv)

    from lbic_tpu.agent import BlockBasedImgCompLossyAgent as Agent
    from lbic_tpu.config import LbicConfig, process_config
    from lbic_tpu.tools import bd, plot_rd
    from lbic_tpu.tools import codecs as codecs_mod
    from lbic_tpu.utils.jaxcache import enable as enable_cache
    from lbic_tpu.utils.loggers import setup_logging

    enable_cache()
    os.makedirs(args.out, exist_ok=True)
    test_dir = os.path.abspath(args.test_dir)

    # anchors on the same test dir (subprocess: CPU backend only)
    sweeps = [("jpeg", (3, 5, 10, 20, 35, 50, 65, 80, 90, 95)),
              ("webp", (0, 2, 5, 15, 30, 50, 70, 85, 95)),
              ("jpeg2000", (-200, -100, -50, 1, 20, 40, 60, 80, 90, 96))]
    anchors, anchor_paths = [], []
    for name, qualities in sweeps:
        if not codecs_mod.CODECS[name].available():
            continue
        path = os.path.join(args.out, f"{name}.json")
        stamp = {"qualities": list(qualities), "test_dir": test_dir,
                 "n_images": len(glob.glob(os.path.join(test_dir, "*")))}
        anchor = None
        if os.path.isfile(path):
            with open(path) as f:
                cached = json.load(f)
            if cached.get("sweep") == stamp:
                anchor = cached
        if anchor is None:
            anchor = run_anchor_subprocess(name, qualities, test_dir, path)
            anchor["sweep"] = stamp
            with open(path, "w") as f:
                json.dump(anchor, f, indent=2)
        anchors.append(anchor)
        anchor_paths.append(path)

    agg = {"name": args.label,
           "description": (f"{args.label} re-eval of {args.work} "
                           f"checkpoints on {os.path.basename(test_dir)} "
                           f"({len(glob.glob(os.path.join(test_dir, '*.png')))} images)"),
           "results": {k: [] for k in RESULT_KEYS}}
    min_img_psnr = {}
    per_image = {}
    for lam in sorted(args.lambdas):
        ckdir = os.path.join(args.work, f"exp_{lam}", "checkpoints")
        best = _best_rr_checkpoint(ckdir)
        if not os.path.isfile(best + ".pkl"):
            print(f"lambda={lam}: no checkpoint under {ckdir} — skipped",
                  flush=True)
            continue
        cfg = process_config(LbicConfig(
            exp_name=f"reeval_{lam}", net_version="v9",
            block_size=args.block_size, KS=tuple(args.ks),
            N=args.n, M=args.m, lambda_=lam, mode="eval_model",
            modelbest_file_load=best + ".pkl",  # full path: the ckpt
            # lives in the ORIGINAL campaign's work dir, not ours
            test_data=test_dir, valid_data=test_dir, seed=0,
            codec_engine="wavefront",
        ), root=os.path.join(args.out, "work"))
        setup_logging(cfg.log_dir)
        agent = Agent(cfg)
        out = agent.eval_model()
        res = out["results"] if "results" in out else out
        for k in RESULT_KEYS:
            agg["results"][k].append(float(np.mean(res[k])))
        min_img_psnr[lam] = float(np.min(res["psnr"]))
        per_image[lam] = res
        print(f"lambda={lam}: bpp={agg['results']['bpp'][-1]:.4f} "
              f"psnr={agg['results']['psnr'][-1]:.2f} "
              f"min_img={min_img_psnr[lam]:.2f}", flush=True)
        import gc

        import jax
        del agent
        gc.collect()
        jax.clear_caches()

    order = np.argsort(agg["results"]["bpp"])
    out = dict(agg, results={k: [agg["results"][k][i] for i in order]
                             for k in RESULT_KEYS})
    ours_path = os.path.join(args.out, "lbic.json")
    with open(ours_path, "w") as f:
        json.dump(out, f, indent=2)
    with open(os.path.join(args.out, "per_image.json"), "w") as f:
        json.dump(per_image, f, indent=2)
    bd_txt = []
    for anchor in anchors:
        try:
            r = bd.bd_from_results(anchor, out)
            bd_txt.append(f"{args.label} vs {anchor['name']}: BD-rate "
                          f"{r['bd_rate_pct']:+.2f} %  BD-PSNR "
                          f"{r['bd_psnr_db']:+.3f} dB")
        except ValueError as e:
            bd_txt.append(f"{args.label} vs {anchor['name']}: BD failed "
                          f"({e})")
    if min_img_psnr:
        worst = min(min_img_psnr.items(), key=lambda kv: kv[1])
        bd_txt.append(
            f"min per-image PSNR: {worst[1]:.2f} dB (lambda={worst[0]})"
            + ("" if worst[1] > 20.0 else "  ** BELOW 20 dB FLOOR **"))
    plot_rd.plot([ours_path] + anchor_paths, metric="psnr",
                 output=os.path.join(args.out, "rd.png"),
                 title=f"{args.label} vs anchors, "
                       f"{os.path.basename(test_dir)}")
    with open(os.path.join(args.out, "bd.txt"), "w") as f:
        f.write("\n".join(bd_txt) + "\n")
    print("\n".join(bd_txt), flush=True)


if __name__ == "__main__":
    main()
