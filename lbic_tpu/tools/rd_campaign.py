"""RD-parity campaign: train the codec through the real ACL loop at
several lambda operating points on the in-environment natural corpus,
run the real-codec eval on held-out images, and compute BD-rate against
classical anchors (JPEG/WebP) with overlapping rate ranges.

This is the round-2 "prove the codec is good" driver (VERDICT.md #1):
the reference's workflow is configs/*.json -> main.py multi-lambda sweep
-> train_all_acl -> eval_model -> utils/bjontegaard_get.py; this tool
chains the same components end-to-end with bounded compute
(max_acl_itr/max_epochs_per_acl) so a full multi-point curve is
reproducible in-environment.

    python -m lbic_tpu.tools.rd_campaign --corpus data_corpus \
        --out results/rd_v2 --work rd_work \
        --lambdas 435.6675 845.325 3140.7075 11704.5 \
        --n 192 --m 48 --acl-itrs 2 --epochs-per-acl 8

Model scale note: N/M default to 192/48 (quarter of the published
B8-lowrate N=768 M=96) because the in-environment corpus is ~1k 256x256
patches — the full model would be data-starved; scale is recorded in the
output JSON description.
"""

import argparse
import glob
import json
import os

import numpy as np

RESULT_KEYS = ("psnr", "ms-ssim", "ms-ssimdb", "bpp", "encoding_time",
               "decoding_time")


def train_and_eval_point(lam, args, dirs, exp_root):
    from lbic_tpu.agent import BlockBasedImgCompLossyAgent as Agent
    from lbic_tpu.config import LbicConfig, process_config
    from lbic_tpu.utils.loggers import setup_logging

    base = dict(
        exp_name=f"exp_{lam}", net_version="v9", block_size=8,
        KS=(3, 1, 1, 1), N=args.n, M=args.m, lambda_=lam,
        distortion="mse", batch_size=args.batch, patch_size=args.patch,
        val_batch_size=8, learning_rate=args.lr, max_epoch=10000,
        max_acl_itr=args.acl_itrs, max_epochs_per_acl=args.epochs_per_acl,
        validate_every=1, validate_recu_reco_every=3,
        acl_bool=True, training_loss_switch=1,
        chained_training=args.chained,
        cnt_no_improvement_valid_thresholds=(2, 2, 1, 1),
        acl_itr0_rdloss_threshold=0.0,  # itr 0 exits via the epoch cap
        num_train_dirs=1, train_data_1=dirs["train"],
        valid_data=dirs["valid"], test_data=dirs["test"], seed=0,
        codec_engine="wavefront",
    )
    cfg = process_config(LbicConfig(**base, mode="train_all_acl"),
                         root=exp_root)
    setup_logging(cfg.log_dir)
    done_marker = os.path.join(cfg.out_dir, "results.json")
    if not (args.resume and os.path.isfile(done_marker)):
        ck = os.path.join(cfg.checkpoint_dir, "checkpoint.pkl")
        if args.resume and os.path.isfile(ck):
            cfg.resume_training = True
        agent = Agent(cfg)
        agent.run()
        # eval with the best closed-loop snapshot of the last ACL itr
        bests = sorted(glob.glob(os.path.join(
            cfg.checkpoint_dir, "model_best_acl_*rr.pkl")))
        best = (bests[-1] if bests else "model_best_acl_0").replace(
            ".pkl", "")
        cfg2 = process_config(LbicConfig(**base, mode="eval_model"),
                              root=exp_root)
        cfg2.modelbest_file_load = os.path.basename(best)
        agent2 = Agent(cfg2)
        agent2.eval_model()
    with open(done_marker) as f:
        return json.load(f)


def anchor_sweep(codec, test_dir, qualities):
    from lbic_tpu.data.dataset import list_images

    out = {"name": codec.name,
           "description": f"Pillow {codec.name} anchor",
           "results": {k: [] for k in ("psnr", "ms-ssim", "bpp")}}
    for q in qualities:
        ms = [codec.run(p, q) for p in list_images(test_dir)]
        for k in out["results"]:
            out["results"][k].append(float(np.mean([m[k] for m in ms])))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", default="data_corpus")
    ap.add_argument("--out", default="results/rd_v2")
    ap.add_argument("--work", default="rd_work")
    ap.add_argument("--lambdas", type=float, nargs="+",
                    default=[435.6675, 845.325, 3140.7075, 11704.5])
    ap.add_argument("--n", type=int, default=192)
    ap.add_argument("--m", type=int, default=48)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=8e-4)
    ap.add_argument("--acl-itrs", type=int, default=4)
    ap.add_argument("--epochs-per-acl", type=int, default=6)
    ap.add_argument("--chained", action="store_true",
                    help="chained training from the start (the reference "
                         "enables it when closed-loop improvement stalls, "
                         "agent:162-176; with few bounded ACL itrs it is "
                         "the strongest closed-loop-quality lever)")
    ap.add_argument("--resume", action="store_true", default=True)
    args = ap.parse_args(argv)

    from lbic_tpu.tools import bd, builtin_corpus, codecs, plot_rd
    from lbic_tpu.utils.jaxcache import enable as enable_cache

    enable_cache()
    os.makedirs(args.out, exist_ok=True)
    if not os.path.isdir(os.path.join(args.corpus, "train")):
        builtin_corpus.build(args.corpus)
    dirs = {s: os.path.abspath(os.path.join(args.corpus, s))
            for s in ("train", "valid", "test")}

    # anchors first (CPU-cheap) so every incremental artifact below can
    # include the BD comparison
    anchors, anchor_paths = [], []
    # qualities start very low so the anchor curves' QUALITY range
    # reaches below any honestly-scaled model's operating points (BD
    # integrates over the quality overlap; a strong-anchor-only sweep
    # can fail to overlap a small model's curve from above)
    for name, qualities in (("jpeg", (3, 5, 10, 20, 35, 50, 65, 80, 90,
                                      95)),
                            ("webp", (0, 2, 5, 15, 30, 50, 70, 85, 95))):
        anchor = anchor_sweep(codecs.CODECS[name](), dirs["test"],
                              qualities)
        path = os.path.join(args.out, f"{name}.json")
        with open(path, "w") as f:
            json.dump(anchor, f, indent=2)
        anchors.append(anchor)
        anchor_paths.append(path)

    agg = {"name": "lbic_tpu",
           "description": (f"lbic_tpu v9 B=8 KS=3111 N={args.n} M={args.m} "
                           f"(scaled from N=768 M=96), real ACL training "
                           f"({args.acl_itrs} itrs) on the in-env corpus, "
                           f"wavefront codec eval on held-out images"),
           "results": {k: [] for k in RESULT_KEYS}}
    ours_path = os.path.join(args.out, "lbic.json")

    def publish():
        """(Re)write lbic.json / bd.txt / rd.png from the lambda points
        finished so far — the campaign leaves a usable artifact after
        every point, not only at the very end. Returns True while any BD
        computation still fails."""
        order = np.argsort(agg["results"]["bpp"])
        out = dict(agg, results={k: [agg["results"][k][i] for i in order]
                                 for k in RESULT_KEYS})
        with open(ours_path, "w") as f:
            json.dump(out, f, indent=2)
        bd_txt, failed = [], False
        for anchor in anchors:
            name = anchor["name"]
            try:
                r = bd.bd_from_results(anchor, out)
                bd_txt.append(f"lbic_tpu vs {name}: BD-rate "
                              f"{r['bd_rate_pct']:+.2f} %  BD-PSNR "
                              f"{r['bd_psnr_db']:+.3f} dB")
            except ValueError as e:
                failed = True
                bd_txt.append(
                    f"lbic_tpu vs {name}: BD failed ({e}) — ours bpp "
                    f"{out['results']['bpp']} psnr "
                    f"{[round(p, 2) for p in out['results']['psnr']]}")
        bd_txt.append(f"({len(out['results']['bpp'])} lambda points: "
                      f"{sorted(done)})")
        plot_rd.plot([ours_path] + anchor_paths, metric="psnr",
                     output=os.path.join(args.out, "rd.png"),
                     title="lbic_tpu (ACL-trained) vs JPEG/WebP, "
                           "held-out set")
        with open(os.path.join(args.out, "bd.txt"), "w") as f:
            f.write("\n".join(bd_txt) + "\n")
        print("\n".join(bd_txt), flush=True)
        return failed

    # rate-range extremes first: any prefix >= 2 points already spans the
    # final curve's rate range, so BD overlap is established early
    lams = sorted(args.lambdas)
    order = ([lams[0], lams[-1]] + lams[1:-1][::-1]
             if len(lams) > 2 else lams)
    done = []
    failed = True

    def add_point(lam, res):
        for k in RESULT_KEYS:
            agg["results"][k].append(float(np.mean(res["results"][k])))
        done.append(lam)
        print(f"lambda={lam}: bpp={agg['results']['bpp'][-1]:.4f} "
              f"psnr={agg['results']['psnr'][-1]:.2f}", flush=True)
        return publish()

    # pre-publish every already-finished point (a restarted campaign
    # leaves a usable artifact before any new training starts)
    pending = []
    for lam in order:
        marker = os.path.join(args.work, f"exp_{lam}", "out",
                              "results.json")
        if args.resume and os.path.isfile(marker):
            with open(marker) as f:
                failed = add_point(lam, json.load(f))
        else:
            pending.append(lam)
    for lam in pending:
        failed = add_point(lam, train_and_eval_point(
            lam, args, dirs, args.work))
    return 1 if failed else 0


if __name__ == "__main__":
    main()
