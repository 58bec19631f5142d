#!/bin/bash
# Round-5 queue phase C: DMA gather rate, CPV breakdown, segm48, kbox36.
# (ev_nearest / ev_near_taps5 / ev_hyb_bt_taps5 skipped: tower=nearest
# (-5.6 AP) and taps5 (-5.8 AP) are each measured far over the -0.3
# budget, so every policy containing them is disqualified; the frontier
# decision rests on hyb_b. hyb_bt_taps5's eval also compiled >14 min.)
set -u
cd /root/repo
R=docs/perf/r5
A=docs/accuracy/r5

step() { echo "=== $1 ($(date +%H:%M:%S)) ===" >> $R/queue5.log; }
rc() { echo "rc=$?" >> $R/queue5.log; }

step "DMA gather on-chip rate (flagship shape)"
timeout 1800 python tools/bench_dma_gather.py > $R/bench_dma_gather.log 2>&1; rc

step "CPV per-part breakdown"
timeout 2400 python tools/bench_cpv.py > $R/bench_cpv.json 2> $R/bench_cpv.log; rc

step "segm 48e / 320 imgs (VERDICT r4 #4)"
timeout 7200 python tools/accuracy_run.py --task segm --epochs 48 \
  --train 320 --out work/acc_segm48 > $A/train_segm48.log 2>&1; rc
cp work/acc_segm48/result.json $A/segm48.json 2>/dev/null

step "pose_kbox first convergence run (36e)"
timeout 5400 python tools/accuracy_run.py --task pose_kbox --epochs 36 \
  --out work/acc_kbox36 > $A/train_kbox36.log 2>&1; rc
cp work/acc_kbox36/result.json $A/kbox36.json 2>/dev/null

step "all done"
