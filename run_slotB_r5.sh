#!/bin/bash
# Round-5 slot-B chip chain: runs AFTER abl_on (pid $1) exits.
# Each job is internally fault-tolerant (child-per-point + bounded
# retries, tools/rd_campaign.py); the chain just sequences them so the
# chip never idles. Slot A (B4 -> B16) is driven manually in parallel.
while kill -0 "$1" 2>/dev/null; do sleep 30; done; sleep 10
cd /root/repo

# --- chained-training ablation, OFF arm (same budget as ON) -----------
python3 -m lbic_tpu.tools.rd_campaign \
  --corpus data_corpus2 --test-dir data_eval \
  --out results/ablation_chained/off --work abl_off \
  --lambdas 845.325 --n 192 --m 48 --batch 16 --lr 1e-4 \
  --acl-itrs 3 --epochs-itr0 8 --epochs-per-acl 6 \
  --patience 2 2 2 > results_abl_off.log 2>&1
echo "abl_off done $(date)" >> slotB_r5.done

# --- ms-ssim-trained quarter-scale points (same scale+budget as the
#     mse ablation arms, so ms-ssim-dB at equal bpp is a fair fight) ---
python3 -m lbic_tpu.tools.rd_campaign \
  --corpus data_corpus2 --test-dir data_eval \
  --out results/rd_msssim --work rd_msssim \
  --distortion ms_ssim --chained \
  --lambdas 40 120 --n 192 --m 48 --batch 16 --lr 1e-4 \
  --acl-itrs 3 --epochs-itr0 8 --epochs-per-acl 6 --epochs-itr0-warm 6 \
  --patience 2 2 2 --warm-seq > results_rd_msssim.log 2>&1
echo "msssim done $(date)" >> slotB_r5.done

# --- corpus ablation: equal recipe, ONLY the corpus changes -----------
# (925-patch round-3 corpus vs 3253-patch round-4 corpus; both eval on
# the shared 6-image held-out set, which is training-disjoint for BOTH.
# The 3253 arm reuses abl_off's checkpoints — same corpus, same recipe,
# chained OFF — re-evaluated on the 6-image set; only the 925 arm needs
# fresh training.)
python3 -m lbic_tpu.tools.rd_campaign \
  --corpus data_corpus --test-dir data_corpus2/test \
  --out results/ablation_corpus/c925 --work abl_c925 \
  --lambdas 845.325 --n 192 --m 48 --batch 16 --lr 1e-4 \
  --acl-itrs 3 --epochs-itr0 8 --epochs-per-acl 6 \
  --patience 2 2 2 > results_abl_c925.log 2>&1
echo "corpus 925 done $(date)" >> slotB_r5.done
python3 -m lbic_tpu.tools.reeval \
  --work abl_off --test-dir data_corpus2/test \
  --out results/ablation_corpus/c3253 --lambdas 845.325 \
  --n 192 --m 48 > results_abl_c3253.log 2>&1
echo "corpus 3253 reeval done $(date)" >> slotB_r5.done
