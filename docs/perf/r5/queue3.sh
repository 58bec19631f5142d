#!/bin/bash
# Round-5 TPU measurement queue, phase B (serialized — one chip).
# The AP side of the sampling frontier (VERDICT r4 #3): train the R50-DCN
# synthetic checkpoint once, then eval-only under every sampling policy
# measured in phase A (docs/perf/r5/bench_*.json). Then the accuracy
# levers (VERDICT r4 #4): segm long schedule + first pose_kbox run, and
# the round-5 DMA probes.
set -u
cd /root/repo
R=docs/perf/r5
A=docs/accuracy/r5
mkdir -p $A

step() { echo "=== $1 ($(date +%H:%M:%S)) ===" >> $R/queue3.log; }
rc() { echo "rc=$?" >> $R/queue3.log; }

step "train R50-DCN bbox 36e (frontier checkpoint)"
timeout 7200 python tools/accuracy_run.py --task bbox --dcn --epochs 36 \
  --out work/acc_dcn36 > $A/train_dcn36.log 2>&1; rc
cp work/acc_dcn36/result.json $A/dcn36_clean.json 2>/dev/null

CKPT=$(ls -d work/acc_dcn36/ckpts/step_* 2>/dev/null | sort -t_ -k2 -n | tail -1)
echo "ckpt: $CKPT" >> $R/queue3.log

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

step "DMA probe variants (8-row-aligned rework)"
timeout 900 python tools/probe_dma2.py > $R/probe_dma2.log 2>&1; rc

step "segm 48e / 320 imgs (VERDICT r4 #4 long-schedule lever)"
timeout 10800 python tools/accuracy_run.py --task segm --epochs 48 \
  --train 320 --out work/acc_segm48 > $A/train_segm48.log 2>&1; rc
cp work/acc_segm48/result.json $A/segm48.json 2>/dev/null

step "pose_kbox first convergence run (36e)"
timeout 7200 python tools/accuracy_run.py --task pose_kbox --epochs 36 \
  --out work/acc_kbox36 > $A/train_kbox36.log 2>&1; rc
cp work/acc_kbox36/result.json $A/kbox36.json 2>/dev/null

step "all done"
