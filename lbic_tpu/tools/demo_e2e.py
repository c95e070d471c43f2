"""End-to-end demo: synthetic data -> train -> real-codec eval -> RD curve
-> BD-rate vs JPEG, exercising the whole framework through the same entry
points a user of the reference would use (config -> agent -> tools).

    python -m lbic_tpu.tools.demo_e2e [--root demo] [--lambdas 117 845]
        [--epochs 3] [--n 96] [--m 24] [--train-imgs 48] [--test-imgs 4]

Produces under <root>/:
    data/{train,valid,test}/          synthetic PNGs
    experiments/exp_<lambda>/         checkpoints + logs per operating point
    results/lbic_demo.json            reference-schema RD results
    results/jpeg.json                 JPEG anchor on the same test set
    results/rd.png                    RD plot
    results/bd.txt                    BD-rate / BD-PSNR vs the anchor

The synthetic corpus is Gaussian-filtered noise mixed with smooth ramps —
compressible structure with tunable bandwidth, so a small model trained
for a few epochs already beats JPEG at low rates on this distribution.
"""

import argparse
import json
import os

import numpy as np


def synth_image(rng, h, w):
    """Filtered-noise + ramp image in uint8 RGB."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    for c in range(3):
        a = rng.normal(size=(h, w)).astype(np.float32)
        # cheap separable low-pass: repeated box filters, random radius
        r = int(rng.integers(1, 8))
        k = np.ones(2 * r + 1, np.float32) / (2 * r + 1)
        for axis in (0, 1):
            a = np.apply_along_axis(
                lambda v: np.convolve(v, k, mode="same"), axis, a)
        a = (a - a.min()) / (np.ptp(a) + 1e-9)
        gx, gy = rng.uniform(-1, 1, 2) / max(h, w)
        ramp = gx * xx + gy * yy
        ramp = (ramp - ramp.min()) / (np.ptp(ramp) + 1e-9)
        mix = rng.uniform(0.3, 0.7)
        img[..., c] = mix * a + (1 - mix) * ramp
    return (img * 255).astype(np.uint8)


def gen_dataset(root, rng, n_train, n_valid, n_test, size=96,
                test_size=(192, 288)):
    from PIL import Image
    made = {}
    for split, n, hw in (("train", n_train, (size, size)),
                         ("valid", n_valid, (size, size)),
                         ("test", n_test, test_size)):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            Image.fromarray(synth_image(rng, *hw)).save(
                os.path.join(d, f"img_{i:03d}.png"))
        made[split] = d
    return made


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="demo")
    p.add_argument("--lambdas", type=float, nargs="+",
                   default=[117.045, 1625.625, 11704.5])
    p.add_argument("--publish", default="",
                   help="also copy the four result artifacts into this "
                        "directory (e.g. results/demo, which is in git)")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--n", type=int, default=96)
    p.add_argument("--m", type=int, default=24)
    p.add_argument("--train-imgs", type=int, default=48)
    p.add_argument("--test-imgs", type=int, default=4)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args(argv)

    from lbic_tpu.config import LbicConfig, process_config
    from lbic_tpu.agent import BlockBasedImgCompLossyAgent as Agent
    from lbic_tpu.tools import bd, codecs, plot_rd
    from lbic_tpu.utils.jaxcache import enable as enable_cache

    enable_cache()
    root = os.path.abspath(args.root)
    rng = np.random.default_rng(0)
    dirs = gen_dataset(os.path.join(root, "data"), rng,
                       args.train_imgs, 8, args.test_imgs)
    res_dir = os.path.join(root, "results")
    os.makedirs(res_dir, exist_ok=True)

    agg = {"name": "lbic_demo",
           "description": "lbic_tpu demo run (synthetic corpus)",
           "results": {k: [] for k in ("psnr", "ms-ssim", "ms-ssimdb",
                                       "bpp", "encoding_time",
                                       "decoding_time")}}
    for lam in args.lambdas:
        cfg = LbicConfig(
            exp_name=f"exp_{lam}", mode="train_one_acl", net_version="v9",
            block_size=8, KS=(3, 1, 1, 1), N=args.n, M=args.m,
            lambda_=lam, distortion="mse", batch_size=args.batch,
            patch_size=64, learning_rate=1e-3, max_epoch=args.epochs,
            validate_every=1, validate_recu_reco_every=args.epochs,
            acl_bool=False, training_loss_switch=1,
            cnt_no_improvement_valid_thresholds=(args.epochs,),
            train_data_1=dirs["train"], valid_data=dirs["valid"],
            test_data=dirs["test"], seed=0)
        cfg = process_config(cfg, root=os.path.join(root, "experiments"))
        agent = Agent(cfg)
        agent.run()
        # real-codec eval with this run's best open-loop weights
        cfg.mode = "eval_model"
        cfg.modelbest_file_load = "model_best_acl_0"
        agent2 = Agent(cfg)
        res = agent2.eval_model()
        for k, v in res["results"].items():
            if k in agg["results"]:
                agg["results"][k].append(float(np.mean(v)))

    ours_path = os.path.join(res_dir, "lbic_demo.json")
    with open(ours_path, "w") as f:
        json.dump(agg, f, indent=2)

    # JPEG anchor over a quality sweep on the same test images
    jpeg = codecs.JPEG()
    jq = {"name": "jpeg", "description": "Pillow JPEG anchor",
          "results": {"psnr": [], "ms-ssim": [], "bpp": []}}
    from lbic_tpu.data.dataset import list_images
    for q in (2, 3, 5, 10, 25, 50, 75, 92):
        ms = [jpeg.run(ip, q) for ip in list_images(dirs["test"])]
        for k in ("psnr", "ms-ssim", "bpp"):
            jq["results"][k].append(float(np.mean([m[k] for m in ms])))
    jpeg_path = os.path.join(res_dir, "jpeg.json")
    with open(jpeg_path, "w") as f:
        json.dump(jq, f, indent=2)

    plot_rd.plot([ours_path, jpeg_path], metric="psnr",
                 output=os.path.join(res_dir, "rd.png"),
                 title="lbic_tpu demo vs JPEG (synthetic test set)")
    try:
        r = bd.bd_from_results(jq, agg)
        bd_txt = (f"BD-rate vs JPEG: {r['bd_rate_pct']:.2f} %\n"
                  f"BD-PSNR vs JPEG: {r['bd_psnr_db']:.3f} dB\n")
    except ValueError as e:  # curves may not overlap on short demo runs
        r = {"error": str(e)}
        bd_txt = f"BD computation failed: {e}\n"
    with open(os.path.join(res_dir, "bd.txt"), "w") as f:
        f.write(bd_txt)
    print(json.dumps({"ours": agg["results"], "jpeg": jq["results"],
                      "bd": r}, indent=2))
    if args.publish:
        import shutil
        os.makedirs(args.publish, exist_ok=True)
        for fn in ("lbic_demo.json", "jpeg.json", "rd.png", "bd.txt"):
            shutil.copy2(os.path.join(res_dir, fn),
                         os.path.join(args.publish, fn))
        print(f"published artifacts to {args.publish}")


if __name__ == "__main__":
    main()
