#!/bin/bash
# Round-4 follow-on chip work, run sequentially after the flagship
# campaign (pid $1) exits: B=4 and B=16 mini-curves (VERDICT r3 #4),
# ms-ssim operating points (#5), and the chained-training ablation (#8).
while kill -0 "$1" 2>/dev/null; do sleep 60; done; sleep 90
cd /root/repo
# gate: only proceed when the flagship campaign actually published all
# 4 lambda points (a TPU-worker crash must not cascade into follow-ons)
NPTS=$(python3 -c "import json;print(len(json.load(open('results/rd_flagship_r4/lbic.json'))['results']['bpp']))" 2>/dev/null || echo 0)
if [ "$NPTS" != "4" ]; then
  echo "flagship incomplete ($NPTS/4 points) — not running follow-ons" > followons_r4.done
  exit 1
fi

# --- B=4 mini-curve (KS 3311: the OTHER entropy-net wavefront slope) ---
python3 -m lbic_tpu.tools.rd_campaign \
  --corpus data_corpus2 --out results/rd_b4 --work rd_b4 \
  --block-size 4 --ks 3 3 1 1 \
  --lambdas 3140.7075 11704.5 --n 128 --m 24 --batch 16 --lr 1e-4 \
  --acl-itrs 2 --epochs-itr0 10 --epochs-per-acl 6 --epochs-itr0-warm 6 \
  --patience 2 2 --warm-seq > results_rd_b4.log 2>&1

# --- B=16 mini-curve ---
python3 -m lbic_tpu.tools.rd_campaign \
  --corpus data_corpus2 --out results/rd_b16 --work rd_b16 \
  --block-size 16 --ks 3 1 1 1 \
  --lambdas 117.045 435.6675 --n 320 --m 48 --batch 16 --lr 1e-4 \
  --acl-itrs 2 --epochs-itr0 10 --epochs-per-acl 6 --epochs-itr0-warm 6 \
  --patience 2 2 --warm-seq > results_rd_b16.log 2>&1

# --- ms-ssim-trained flagship points, warm from the mse flagship -------
WARM=$(ls -1v rd_flagship_r4/exp_3140.7075/checkpoints/model_best_acl_*rr.pkl 2>/dev/null | tail -1)
python3 -m lbic_tpu.tools.rd_campaign \
  --corpus data_corpus2 --out results/rd_msssim --work rd_msssim \
  --distortion ms_ssim \
  --lambdas 40 120 --n 768 --m 96 --batch 16 --lr 5e-5 \
  --acl-itrs 2 --epochs-itr0 6 --epochs-per-acl 5 --epochs-itr0-warm 5 \
  --patience 2 2 --warm-seq \
  ${WARM:+--init-from "$WARM"} > results_rd_msssim.log 2>&1

# --- chained-training ablation (quarter scale, same seed/budget) -------
python3 -m lbic_tpu.tools.rd_campaign \
  --corpus data_corpus2 --out results/ablation_chained/on --work abl_on \
  --lambdas 845.325 --n 192 --m 48 --batch 16 --lr 1e-4 --chained \
  --acl-itrs 3 --epochs-itr0 8 --epochs-per-acl 6 \
  --patience 2 2 2 > results_abl_on.log 2>&1
python3 -m lbic_tpu.tools.rd_campaign \
  --corpus data_corpus2 --out results/ablation_chained/off --work abl_off \
  --lambdas 845.325 --n 192 --m 48 --batch 16 --lr 1e-4 \
  --acl-itrs 3 --epochs-itr0 8 --epochs-per-acl 6 \
  --patience 2 2 2 > results_abl_off.log 2>&1
echo "followons done $(date)" > followons_r4.done

# --- corpus ablation: round-3 quarter-scale recipe, ONLY the corpus ----
# changed (925-patch data_corpus -> 3253-patch data_corpus2); budget,
# batch, lr, model, lambda all match round 3's rd_work/exp_845.325 so a
# PSNR-at-equal-bpp comparison isolates the data lever (VERDICT r3 #3)
python3 -m lbic_tpu.tools.rd_campaign \
  --corpus data_corpus2 --out results/ablation_corpus --work abl_corpus \
  --lambdas 845.325 --n 192 --m 48 --batch 8 --lr 8e-5 \
  --acl-itrs 6 --epochs-itr0 4 --epochs-per-acl 10 \
  --patience 4 4 3 3 2 > results_abl_corpus.log 2>&1
echo "corpus ablation done $(date)" >> followons_r4.done

# --- ablation table ----------------------------------------------------
python3 -m lbic_tpu.tools.ablation_report \
  --on abl_on/exp_845.325 --off abl_off/exp_845.325 \
  --out results/ablation_chained/table.txt >> followons_r4.log 2>&1 || true
echo "ablation table done $(date)" >> followons_r4.done
