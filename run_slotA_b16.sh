#!/bin/bash
# Round-5 slot-A follow-on: the credible B=16 redo (VERDICT r4 #2),
# launched when abl_on (pid $1) frees its chip slot. Budget honors the
# style_05 diagnosis: N=640 (vs round-4's 320), itr-0 cap 12, 4 ACL
# itrs with the chained switch armed, warm-seq, lambdas moved up so the
# curve overlaps the anchors in rate AND quality.
while kill -0 "$1" 2>/dev/null; do sleep 30; done; sleep 10
cd /root/repo
python3 -m lbic_tpu.tools.rd_campaign \
  --corpus data_corpus2 --test-dir data_eval \
  --out results/rd_b16 --work rd_b16 \
  --block-size 16 --ks 3 1 1 1 \
  --lambdas 845.325 3140.7075 --n 640 --m 96 --batch 16 --lr 1e-4 \
  --acl-itrs 4 --epochs-itr0 12 --epochs-per-acl 6 --epochs-itr0-warm 6 \
  --patience 2 2 2 2 --warm-seq --chained > results_rd_b16.log 2>&1
echo "b16 done $(date)" >> slotA_r5.done
