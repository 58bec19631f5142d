#!/bin/bash
# Round-5 queue phase G (serialized — one chip): the taps5 variant of the
# backbone+refine STE recipe.
#
# If queue9's train C holds AP at the matched backbone+refine=nearest
# deploy (14.65 img/s), the remaining trained-matched lever on that
# recipe is the 5-tap refine (taps must match train time). Steps:
#   1. bench the deploy path backbone+refine=nearest + taps5 (random
#      weights, pure throughput — never measured).
#   2. train D: 36e, nearest_ste at backbone+refine, LSNET_REFINE_TAPS=5.
#   3. eval D meta-armed (sidecar arms nearest@sites + taps5).
set -u
cd /root/repo
R=docs/perf/r5
A=docs/accuracy/r5

# serialize behind queue9
while ps -p 30891 >/dev/null 2>&1; do sleep 30; done

step() { echo "=== $1 ($(date +%H:%M:%S)) ===" >> $R/queue10.log; }
rc() { echo "rc=$?" >> $R/queue10.log; }

step "bench: backbone+refine=nearest + taps5 (deploy path of train D)"
LSNET_DCN_SAMPLING=backbone=nearest,refine=nearest LSNET_REFINE_TAPS=5 \
  timeout 1200 python bench.py > $R/bench_br_taps5.log 2>&1; rc
tail -1 $R/bench_br_taps5.log > $R/bench_br_taps5.json 2>/dev/null

step "train D: R50-DCN 36e, backbone+refine=nearest_ste, refine taps5"
LSNET_DCN_SAMPLING=backbone=nearest_ste,refine=nearest_ste \
  LSNET_REFINE_TAPS=5 timeout 7200 \
  python tools/accuracy_run.py --task bbox --dcn --epochs 36 \
  --out work/acc_ste36brt5 > $A/train_ste36brt5.log 2>&1; rc
cp work/acc_ste36brt5/result.json $A/ste36brt5_clean.json 2>/dev/null

CKD=$(python -c "from lsnet_tpu.train.checkpoint import latest_checkpoint as l; print(l('work/acc_ste36brt5/ckpts') or '')")
echo "ckpt D: $CKD" >> $R/queue10.log

step "eval-only D meta-armed (nearest@backbone+refine, taps5 from sidecar)"
timeout 2400 python tools/accuracy_run.py --task bbox --dcn \
  --out work/acc_ste36brt5_ev --eval-only "$CKD" \
  > $A/ev_ste_brt5_armed.log 2>&1; rc
cp work/acc_ste36brt5_ev/result.json $A/ev_ste_brt5_armed.json 2>/dev/null

step "all done"
