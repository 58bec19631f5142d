#!/bin/bash
# Round-5 queue phase B-fixed: the AP frontier evals against the CORRECT
# final checkpoint (queue3 picked step_80 via an underscore-broken sort),
# then the accuracy levers. Serialized — one chip.
set -u
cd /root/repo
R=docs/perf/r5
A=docs/accuracy/r5

step() { echo "=== $1 ($(date +%H:%M:%S)) ===" >> $R/queue4.log; }
rc() { echo "rc=$?" >> $R/queue4.log; }

CKPT=$(ls -d work/acc_dcn36/ckpts/step_* | sed 's/.*step_//' | sort -n | tail -1)
CKPT="work/acc_dcn36/ckpts/step_$CKPT"
echo "ckpt: $CKPT" >> $R/queue4.log

ev() { # name, env...
  local name=$1; shift
  step "eval-only $name"
  env "$@" timeout 2400 python tools/accuracy_run.py --task bbox --dcn \
    --out work/acc_dcn36_ev_$name --eval-only "$CKPT" \
    > $A/ev_$name.log 2>&1; rc
  cp work/acc_dcn36_ev_$name/result.json $A/ev_$name.json 2>/dev/null
}

ev bilinear LSNET_NOOP=1
ev hyb_b    LSNET_DCN_SAMPLING=backbone=nearest
ev hyb_bt   LSNET_DCN_SAMPLING=backbone=nearest,tower=nearest
ev taps5    LSNET_REFINE_TAPS=5
ev hyb_bt_taps5 LSNET_DCN_SAMPLING=backbone=nearest,tower=nearest LSNET_REFINE_TAPS=5
ev nearest  LSNET_DCN_SAMPLING=nearest
ev near_taps5 LSNET_DCN_SAMPLING=nearest LSNET_REFINE_TAPS=5

step "DMA gather on-chip rate (flagship shape)"
timeout 1800 python tools/bench_dma_gather.py > $R/bench_dma_gather.log 2>&1; rc

step "CPV per-part breakdown"
timeout 2400 python tools/bench_cpv.py > $R/bench_cpv.json 2> $R/bench_cpv.log; rc

step "all done"
