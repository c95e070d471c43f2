#!/bin/bash
# Post-collision slot-B chain: waits for abl_off (pid $1), then runs the
# remaining campaigns with DISTINCT --session names so their ACL recon
# dirs (__acl_<session>_<itr>) never collide (two concurrent campaigns
# sharing data_corpus2 under session A overwrote each other's pairs).
while kill -0 "$1" 2>/dev/null; do sleep 30; done; sleep 10
cd /root/repo
python3 -m lbic_tpu.tools.rd_campaign \
  --corpus data_corpus2 --test-dir data_eval \
  --out results/rd_msssim --work rd_msssim --session MS \
  --distortion ms_ssim --chained \
  --lambdas 40 120 --n 192 --m 48 --batch 16 --lr 1e-4 \
  --acl-itrs 3 --epochs-itr0 8 --epochs-per-acl 6 --epochs-itr0-warm 6 \
  --patience 2 2 2 --warm-seq > results_rd_msssim.log 2>&1
echo "msssim done $(date)" >> slotB_r5.done
python3 -m lbic_tpu.tools.rd_campaign \
  --corpus data_corpus --test-dir data_corpus2/test \
  --out results/ablation_corpus/c925 --work abl_c925 --session C9 \
  --lambdas 845.325 --n 192 --m 48 --batch 16 --lr 1e-4 \
  --acl-itrs 3 --epochs-itr0 8 --epochs-per-acl 6 \
  --patience 2 2 2 > results_abl_c925.log 2>&1
echo "corpus 925 done $(date)" >> slotB_r5.done
python3 -m lbic_tpu.tools.reeval \
  --work abl_off --test-dir data_corpus2/test \
  --out results/ablation_corpus/c3253 --lambdas 845.325 \
  --n 192 --m 48 > results_abl_c3253.log 2>&1
echo "corpus 3253 reeval done $(date)" >> slotB_r5.done
