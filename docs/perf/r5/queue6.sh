#!/bin/bash
set -u
cd /root/repo
R=docs/perf/r5
A=docs/accuracy/r5
step() { echo "=== $1 ($(date +%H:%M:%S)) ===" >> $R/queue6.log; }
rc() { echo "rc=$?" >> $R/queue6.log; }

step "segm 48e / 320 imgs (VERDICT r4 #4)"
timeout 5400 python tools/accuracy_run.py --task segm --epochs 48 \
  --train 320 --out work/acc_segm48 > $A/train_segm48.log 2>&1; rc
cp work/acc_segm48/result.json $A/segm48.json 2>/dev/null

step "pose_kbox first convergence run (36e)"
timeout 4200 python tools/accuracy_run.py --task pose_kbox --epochs 36 \
  --out work/acc_kbox36 > $A/train_kbox36.log 2>&1; rc
cp work/acc_kbox36/result.json $A/kbox36.json 2>/dev/null

step "warm the bench exec cache at the shipped default"
timeout 1200 python bench.py > $R/bench_default_final.json 2> $R/bench_default_final.log; rc

step "all done"
