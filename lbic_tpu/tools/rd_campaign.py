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
import re
import subprocess
import sys
import time

import numpy as np

RESULT_KEYS = ("psnr", "ms-ssim", "ms-ssimdb", "bpp", "encoding_time",
               "decoding_time")


def _best_rr_checkpoint(checkpoint_dir):
    """The best-rr snapshot with the HIGHEST ACL iteration — since
    best_validrr_loss is global across iterations (agent.py), the
    highest-numbered rr file holds the overall best closed-loop model.
    Sorted numerically: a lexical sort returns `_9rr` over `_10rr`."""
    bests = glob.glob(os.path.join(checkpoint_dir,
                                   "model_best_acl_*rr.pkl"))
    if not bests:
        # no closed-loop best — fall back to the highest open-loop best
        # instead of a hardcoded name that may not exist
        bests = glob.glob(os.path.join(checkpoint_dir,
                                       "model_best_acl_*[0-9].pkl"))
        if not bests:
            return "model_best_acl_0"
        key = lambda p: int(re.search(r"_(\d+)\.pkl$", p).group(1))
        return max(bests, key=key).replace(".pkl", "")
    key = lambda p: int(re.search(r"_(\d+)rr\.pkl$", p).group(1))
    return max(bests, key=key).replace(".pkl", "")


def _warm_init_checkpoint(work, done, lam):
    """--warm-seq: the best-rr snapshot of the nearest already-finished
    LOWER lambda, or None when no usable neighbor exists (first point,
    or neighbor trained without leaving a best-rr file)."""
    lower = [d for d in done if d < lam]
    if not lower:
        return None
    src = os.path.join(work, f"exp_{max(lower)}", "checkpoints")
    # None (cold start) when the neighbor left no rr snapshot — never
    # fall through to the open-loop itr-0 default name (advisor r3)
    bests = glob.glob(os.path.join(src, "model_best_acl_*rr.pkl"))
    if not bests:
        return None
    key = lambda p: int(re.search(r"_(\d+)rr\.pkl$", p).group(1))
    return max(bests, key=key)


def train_and_eval_point(lam, args, dirs, exp_root, init_from_path=None,
                         epochs_itr0=None):
    from lbic_tpu.agent import BlockBasedImgCompLossyAgent as Agent
    from lbic_tpu.config import LbicConfig, process_config
    from lbic_tpu.data.dataset import BatchLoader, ImageDatasetACL
    from lbic_tpu.utils.loggers import setup_logging

    base = dict(
        exp_name=f"exp_{lam}", net_version="v9",
        block_size=args.block_size,
        KS=tuple(args.ks), N=args.n, M=args.m, lambda_=lam,
        distortion=args.distortion, batch_size=args.batch,
        patch_size=args.patch,
        val_batch_size=32, learning_rate=args.lr, max_epoch=10000,
        max_acl_itr=args.acl_itrs, max_epochs_per_acl=args.epochs_per_acl,
        max_epochs_itr0=(args.epochs_itr0 if epochs_itr0 is None
                         else epochs_itr0),
        validate_every=1, validate_recu_reco_every=3,
        acl_bool=True, training_loss_switch=1,
        chained_training=args.chained, session=args.session,
        cnt_no_improvement_valid_thresholds=tuple(args.patience),
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
            # the __acl_ recon dirs are shared across lambda points; a
            # resumed point must rebuild its own pairs first
            cfg.regen_on_resume = True
        agent = Agent(cfg)
        if not cfg.resume_training:
            # warm start: weights only, fresh optimizer/ACL state.
            # Either an explicit --init-from template, or (--warm-seq)
            # the best-rr checkpoint of the previously trained lambda —
            # multi-rate fine-tuning: adjacent operating points share
            # most of their transform, so itr-0 shrinks to a fine-tune.
            path = init_from_path or (
                args.init_from.format(lam=lam) if args.init_from else "")
            if path and os.path.isfile(path):
                print(f"warm start from {path}", flush=True)
                agent.load_checkpoint(path, weights_only=True)
            elif path:
                print(f"init-from {path} not found — cold start",
                      flush=True)
        agent.run()
        # release this point's memory before the next phase: the ACL
        # loop rebuilds loaders (each holding a RAM image cache) every
        # iteration and jit caches grow per lambda — a 4-lambda campaign
        # in one process leaked to >60 GB RSS and host-side step time
        # tripled (round-4 incident)
        import gc

        import jax

        del agent
        gc.collect()
        jax.clear_caches()
        # eval with the overall best closed-loop snapshot. Training that
        # left NO best snapshot (e.g. every epoch diverged to inf/nan)
        # must fail the point loudly — the round-4 ms-ssim campaign
        # silently evaluated FRESH params here and published 9 dB points
        bests = glob.glob(os.path.join(cfg.checkpoint_dir,
                                       "model_best_acl_*.pkl"))
        if not bests:
            raise RuntimeError(
                f"lambda={lam}: training saved no best checkpoint in "
                f"{cfg.checkpoint_dir} — refusing to eval fresh params")
        best = _best_rr_checkpoint(cfg.checkpoint_dir)
        cfg2 = process_config(LbicConfig(**base, mode="eval_model"),
                              root=exp_root)
        cfg2.modelbest_file_load = os.path.basename(best)
        agent2 = Agent(cfg2)
        agent2.eval_model()
        # eval<->validrr consistency probe (VERDICT r2 #3): the codec
        # commits clamped floats, exactly like the quant8=False scan, so
        # closed-loop validation ON THE TEST SET with the same snapshot
        # must land within ~0.5 dB of the codec eval (the remaining gap
        # is only block padding included in the scan's PSNR).
        ds = ImageDatasetACL([dirs["test"]], patch_size=0, augment=False)
        loader = BatchLoader(ds, 1, shuffle=False, drop_last=False)
        agent2.validate_recu_reco(loader, quant8=False)
        probe = dict(agent2.last_validrr_stats or {})
        hist_path = os.path.join(cfg.out_dir, "acl_history.json")
        report = {"lambda": lam, "eval_checkpoint": os.path.basename(best),
                  "validrr_test": probe,
                  "acl_history": (json.load(open(hist_path))
                                  if os.path.isfile(hist_path) else [])}
        with open(os.path.join(cfg.out_dir, "acl_report.json"), "w") as f:
            json.dump(report, f, indent=2)
        del agent2
        gc.collect()
        jax.clear_caches()
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


def run_anchor_subprocess(name, qualities, test_dir, out_path):
    """Run one anchor sweep in a CPU-only child process. The campaign's
    main process must only ever initialize the axon TPU backend —
    mixing a CPU-backend anchor phase into the same process put the
    remote-compile path into a pathological state, and running the
    non-jitted ms_ssim op-by-op over the TPU tunnel is minutes-slow on
    a cold cache either way."""
    import subprocess
    import sys

    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import json, sys\n"
        "from lbic_tpu.tools import codecs\n"
        "from lbic_tpu.tools.rd_campaign import anchor_sweep\n"
        f"a = anchor_sweep(codecs.CODECS[{name!r}](), {test_dir!r}, "
        f"{tuple(qualities)!r})\n"
        f"json.dump(a, open({out_path!r}, 'w'), indent=2)\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, "-c", code], check=True, env=env)
    with open(out_path) as f:
        return json.load(f)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", default="data_corpus")
    ap.add_argument("--test-dir", default="",
                    help="override the held-out eval dir (default "
                         "<corpus>/test); use with the broadened "
                         "tools/eval_set.py set so BD rests on >=12 "
                         "training-disjoint images (VERDICT r4 #5)")
    ap.add_argument("--out", default="results/rd_v2")
    ap.add_argument("--work", default="rd_work")
    ap.add_argument("--lambdas", type=float, nargs="+",
                    default=[435.6675, 845.325, 3140.7075, 11704.5])
    ap.add_argument("--n", type=int, default=192)
    ap.add_argument("--m", type=int, default=48)
    ap.add_argument("--block-size", type=int, default=8,
                    help="B: 4/8/16 (configs/blkbsdimgcomp_B*_*.json)")
    ap.add_argument("--ks", type=int, nargs=4, default=[3, 1, 1, 1],
                    help="KS kernel list, e.g. 3 3 1 1 for the highrate "
                         "and B4 configs")
    ap.add_argument("--distortion", default="mse",
                    choices=["mse", "ms_ssim"],
                    help="training distortion (reference rate_dist.py:42-45)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=8e-5,
                    help="the reference's learning rate (configs/"
                         "blkbsdimgcomp_B8_lowrate.json:25 = 0.8e-4); "
                         "round 2 ran at 8e-4 and oscillated")
    ap.add_argument("--acl-itrs", type=int, default=5)
    ap.add_argument("--epochs-per-acl", type=int, default=14)
    ap.add_argument("--epochs-itr0", type=int, default=0,
                    help="epoch cap for ACL itr 0 only (0 = same as "
                         "--epochs-per-acl); itr 0 trains from scratch "
                         "and has no patience exit, so it needs a larger "
                         "budget than the fine-tune iterations")
    ap.add_argument("--patience", type=int, nargs="+",
                    default=[4, 4, 3, 3, 2],
                    help="cnt_no_improvement_valid_thresholds, a "
                         "budget-scaled version of the reference's "
                         "[8,8,7,6,5,5]")
    ap.add_argument("--session", default="A")
    ap.add_argument("--init-from", default="",
                    help="warm-start checkpoint path template with {lam}, "
                         "e.g. rd_work/exp_{lam}/checkpoints/"
                         "model_best_acl_2rr.pkl; loaded weights-only")
    ap.add_argument("--warm-seq", action="store_true",
                    help="train lambdas in ascending order and warm-start "
                         "each point from the previous lambda's best-rr "
                         "checkpoint (multi-rate fine-tuning); the warm "
                         "points use --epochs-itr0-warm as their itr-0 cap")
    ap.add_argument("--epochs-itr0-warm", type=int, default=12,
                    help="itr-0 epoch cap for warm-started lambda points "
                         "under --warm-seq")
    ap.add_argument("--chained", action="store_true",
                    help="chained training from the start (the reference "
                         "enables it when closed-loop improvement stalls, "
                         "agent:162-176; with few bounded ACL itrs it is "
                         "the strongest closed-loop-quality lever)")
    ap.add_argument("--resume", action="store_true", default=True)
    ap.add_argument("--retries", type=int, default=2,
                    help="re-attempts per lambda point after a crash "
                         "(TPU worker faults killed the round-4 B4 "
                         "campaign at its first point; each retry "
                         "re-enters via the checkpoint-resume path)")
    ap.add_argument("--in-process-points", action="store_true",
                    help="run lambda points in this process instead of "
                         "one child process per point (a worker crash "
                         "then kills the whole campaign — child "
                         "processes isolate the parent from a poisoned "
                         "TPU backend and from the axon per-transfer "
                         "host-memory leak)")
    ap.add_argument("--one-point", type=float, default=None,
                    help=argparse.SUPPRESS)  # internal: child-process mode
    args = ap.parse_args(argv)
    base_argv = list(sys.argv[1:]) if argv is None else list(argv)

    from lbic_tpu.tools import bd, builtin_corpus, codecs, plot_rd
    from lbic_tpu.utils.jaxcache import enable as enable_cache

    enable_cache()
    os.makedirs(args.out, exist_ok=True)
    if not os.path.isdir(os.path.join(args.corpus, "train")):
        builtin_corpus.build(args.corpus)
    dirs = {s: os.path.abspath(os.path.join(args.corpus, s))
            for s in ("train", "valid", "test")}
    if args.test_dir:
        dirs["test"] = os.path.abspath(args.test_dir)

    if args.one_point is not None:
        # child-process mode: train+eval exactly one lambda point, leave
        # the results.json marker, and exit. The parent retries this
        # child on failure; a resumed attempt re-enters via checkpoint.
        train_and_eval_point(args.one_point, args, dirs, args.work)
        return 0

    # anchors first (CPU-cheap) so every incremental artifact below can
    # include the BD comparison
    anchors, anchor_paths = [], []
    # qualities start very low so the anchor curves' QUALITY range
    # reaches below any honestly-scaled model's operating points (BD
    # integrates over the quality overlap; a strong-anchor-only sweep
    # can fail to overlap a small model's curve from above)
    # jpeg2000 qualities < 1 extend the Pillow wrapper's ratio mapping
    # (ratio = 101 - q) below 0.24 bpp so the anchor overlaps the
    # low-rate end of the model curve
    sweeps = [("jpeg", (3, 5, 10, 20, 35, 50, 65, 80, 90, 95)),
              ("webp", (0, 2, 5, 15, 30, 50, 70, 85, 95)),
              ("jpeg2000", (-200, -100, -50, 1, 20, 40, 60, 80, 90, 96))]
    from lbic_tpu.tools import codecs as codecs_mod
    for name, qualities in sweeps:
        if not codecs_mod.CODECS[name].available():
            continue
        path = os.path.join(args.out, f"{name}.json")
        # provenance stamp: a cached anchor is only reused when it was
        # produced by the SAME quality sweep on the SAME test dir —
        # a stale cache from an older sweep otherwise silently feeds
        # BD/plots with a mismatched anchor curve (advisor r4)
        stamp = {"qualities": list(qualities),
                 "test_dir": dirs["test"],
                 "n_images": len(glob.glob(
                     os.path.join(dirs["test"], "*")))}
        anchor = None
        if args.resume and os.path.isfile(path):
            with open(path) as f:
                cached = json.load(f)
            if cached.get("sweep") == stamp:
                anchor = cached
            else:
                print(f"anchor {name}: cached sweep differs "
                      f"({cached.get('sweep')} != {stamp}) — regenerating",
                      flush=True)
        if anchor is None:
            anchor = run_anchor_subprocess(name, qualities, dirs["test"],
                                           path)
            anchor["sweep"] = stamp
            with open(path, "w") as f:
                json.dump(anchor, f, indent=2)
        anchors.append(anchor)
        anchor_paths.append(path)

    scale_note = ("the published scale" if (args.n, args.m) == (768, 96)
                  and args.block_size == 8 else "scaled from the "
                  "published config")
    ks_str = "".join(map(str, args.ks))
    agg = {"name": "lbic_tpu",
           "description": (f"lbic_tpu v9 B={args.block_size} KS={ks_str} "
                           f"N={args.n} M={args.m} "
                           f"({scale_note}), real ACL training "
                           f"({args.acl_itrs} itrs, {args.distortion}) on "
                           f"the in-env corpus, "
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
        if min_img_psnr:
            worst = min(min_img_psnr.items(), key=lambda kv: kv[1])
            bd_txt.append(
                f"min per-image PSNR: {worst[1]:.2f} dB (lambda={worst[0]})"
                + ("" if worst[1] > 20.0 else "  ** BELOW 20 dB FLOOR **"))
        plot_rd.plot([ours_path] + anchor_paths, metric="psnr",
                     output=os.path.join(args.out, "rd.png"),
                     title="lbic_tpu (ACL-trained) vs JPEG/WebP, "
                           "held-out set")
        with open(os.path.join(args.out, "bd.txt"), "w") as f:
            f.write("\n".join(bd_txt) + "\n")
        print("\n".join(bd_txt), flush=True)
        return failed

    def publish_acl_report():
        """Combined per-lambda ACL table: validrr loss per iteration and
        the eval<->validrr(test) agreement (VERDICT r2 #3)."""
        lines = ["lambda    itr  mode     chained  best_valid  "
                 "best_validrr  validrr_psnr"]
        tail = []
        for lam in sorted(done):
            p = os.path.join(args.work, f"exp_{lam}", "out",
                             "acl_report.json")
            if not os.path.isfile(p):
                continue
            with open(p) as f:
                rep = json.load(f)
            for h in rep.get("acl_history", []):
                rr = (h.get("last_validrr") or {})
                lines.append(
                    f"{lam:<9g} {h['acl_itr']:>3}  {h['mode']:<8} "
                    f"{str(h['chained']):<7}  {h['best_valid_loss']:>10.6f} "
                    f" {h['best_validrr_loss']:>12.6f} "
                    f" {rr.get('psnr', float('nan')):>11.4f}")
            pr = rep.get("validrr_test") or {}
            ev_psnr = agg["results"]["psnr"][done.index(lam)]
            tail.append(
                f"lambda={lam}: eval_psnr={ev_psnr:.2f} "
                f"validrr_test_psnr={pr.get('psnr', float('nan')):.2f} "
                f"validrr_test_bpp={pr.get('bpp', float('nan')):.4f} "
                f"(ckpt {rep.get('eval_checkpoint')})")
        with open(os.path.join(args.out, "acl_report.txt"), "w") as f:
            f.write("\n".join(lines + [""] + tail) + "\n")

    # rate-range extremes first: any prefix >= 2 points already spans the
    # final curve's rate range, so BD overlap is established early.
    # Under --warm-seq, ascending order instead: each point fine-tunes
    # from its nearest (lower) neighbor, so adjacency beats early overlap
    lams = sorted(args.lambdas)
    order = (lams if args.warm_seq else
             [lams[0], lams[-1]] + lams[1:-1][::-1]
             if len(lams) > 2 else lams)
    done = []
    min_img_psnr = {}  # lambda -> worst per-image eval PSNR
    failed = True

    def add_point(lam, res):
        for k in RESULT_KEYS:
            agg["results"][k].append(float(np.mean(res["results"][k])))
        min_img_psnr[lam] = float(np.min(res["results"]["psnr"]))
        done.append(lam)
        print(f"lambda={lam}: bpp={agg['results']['bpp'][-1]:.4f} "
              f"psnr={agg['results']['psnr'][-1]:.2f}", flush=True)
        r = publish()
        publish_acl_report()
        return r

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
    failed_points = []
    for lam in pending:
        init_path, itr0_cap = None, None
        if args.warm_seq:
            init_path = _warm_init_checkpoint(args.work, done, lam)
            if init_path:
                itr0_cap = args.epochs_itr0_warm
        res = None
        for attempt in range(args.retries + 1):
            try:
                if args.in_process_points:
                    res = train_and_eval_point(
                        lam, args, dirs, args.work,
                        init_from_path=init_path, epochs_itr0=itr0_cap)
                else:
                    res = run_point_subprocess(lam, base_argv, init_path,
                                               itr0_cap, args.work)
                break
            except Exception as e:  # noqa: BLE001 — incl. JaxRuntimeError
                print(f"lambda={lam} attempt {attempt + 1}/"
                      f"{args.retries + 1} failed: {type(e).__name__}: "
                      f"{e}", flush=True)
                if attempt >= args.retries:
                    break
                time.sleep(30 * (attempt + 1))  # let the worker recover
        if res is None:
            failed_points.append(lam)
            print(f"lambda={lam}: giving up after {args.retries + 1} "
                  f"attempts — continuing with remaining points",
                  flush=True)
            continue
        failed = add_point(lam, res)
    if failed_points:
        with open(os.path.join(args.out, "FAILED_POINTS.txt"), "w") as f:
            f.write("lambda points that failed every retry: "
                    f"{failed_points}\n")
    return 1 if (failed or failed_points) else 0


def run_point_subprocess(lam, base_argv, init_path, itr0_cap, work):
    """One lambda point in a child process (crash isolation: a TPU
    worker fault or OOM kills only the child; the parent retries and the
    child resumes from the point's checkpoint). Returns the results.json
    payload; raises on child failure."""
    argv = [a for a in base_argv] + ["--one-point", repr(lam)]
    if init_path:
        argv += ["--init-from", init_path]  # last occurrence wins
    if itr0_cap is not None:
        argv += ["--epochs-itr0", str(itr0_cap)]
    proc = subprocess.run([sys.executable, "-m",
                           "lbic_tpu.tools.rd_campaign"] + argv)
    if proc.returncode != 0:
        raise RuntimeError(f"point subprocess exited {proc.returncode}")
    marker = os.path.join(work, f"exp_{lam}", "out", "results.json")
    with open(marker) as f:
        return json.load(f)


if __name__ == "__main__":
    main()
