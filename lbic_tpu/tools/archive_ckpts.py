"""Archive a finished campaign's best checkpoints into its committed
results directory.

Round-5 lesson: campaign work dirs (rd_*/exp_*/checkpoints) are
gitignored and do NOT survive across rounds — round 4's flagship
checkpoints were lost, which made VERDICT r4 #5/#6 (re-evaluate and
continue the flagship points) impossible. The reference keeps its
published model weights next to its results
(utils/results_files/..., checkpoints loaded by agents/base.py:163-178);
this tool is that discipline for lbic_tpu: after a campaign completes,
the per-lambda best closed-loop checkpoint (the one eval used) is
gzipped into results/<campaign>/checkpoints/ so a later round can warm
-start, re-evaluate on a new test set (tools/reeval.py), or continue
ACL iterations without retraining.

    python -m lbic_tpu.tools.archive_ckpts --work rd_b4 \
        --out results/rd_b4/checkpoints
"""

import argparse
import glob
import gzip
import os
import re
import shutil


def best_rr_path(exp_dir):
    """Latest model_best_acl_<i>rr.pkl — the checkpoint eval_model loads
    (campaign convention, see tools/rd_campaign.py)."""
    cands = glob.glob(os.path.join(exp_dir, "checkpoints",
                                   "model_best_acl_*rr.pkl"))
    if not cands:
        return None
    def itr(p):
        m = re.search(r"model_best_acl_(\d+)rr\.pkl$", p)
        return int(m.group(1)) if m else -1
    return max(cands, key=itr)


def archive(work, out):
    os.makedirs(out, exist_ok=True)
    n = 0
    for exp_dir in sorted(glob.glob(os.path.join(work, "exp_*"))):
        src = best_rr_path(exp_dir)
        if src is None:
            print(f"{exp_dir}: no best-rr checkpoint — skipped")
            continue
        name = (os.path.basename(exp_dir) + "__"
                + os.path.basename(src) + ".gz")
        dst = os.path.join(out, name)
        with open(src, "rb") as fi, gzip.open(dst, "wb", 6) as fo:
            shutil.copyfileobj(fi, fo)
        mb = os.path.getsize(dst) / 1e6
        print(f"{dst}: {mb:.1f} MB (from {src})")
        n += 1
    return n


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    if archive(args.work, args.out) == 0:
        raise SystemExit("no checkpoints archived")


if __name__ == "__main__":
    main()
