#!/bin/bash
# Round-5 queue phase F (serialized — one chip): targeted nearest-aware
# training at the two sites where nearest deploy is cheap.
#
# queue7 measured backbone+refine=nearest post-hoc at -0.69 AP for
# 14.65 img/s (towers bilinear). queue8 showed STE training recovers
# AP at matched deploy (all-nearest: post-hoc <=62.7 -> STE 64.93) and
# that towers are the component that cannot take nearest even trained.
# Train C therefore applies nearest_ste ONLY at backbone+refine: if the
# matched deploy (backbone=nearest,refine=nearest, 14.65 img/s) holds
# within ~0.3 AP of the 68.36 bilinear parity, the 2x-throughput point
# becomes a skew-free paired train+deploy recipe (the checkpoint meta
# sidecar auto-arms it at eval restore).
set -u
cd /root/repo
R=docs/perf/r5
A=docs/accuracy/r5

# wait for queue8's chip work to finish (one chip, serialize)
while ps -p 19263 >/dev/null 2>&1; do sleep 30; done

step() { echo "=== $1 ($(date +%H:%M:%S)) ===" >> $R/queue9.log; }
rc() { echo "rc=$?" >> $R/queue9.log; }

step "train C: R50-DCN 36e, sampling=backbone=nearest_ste,refine=nearest_ste"
LSNET_DCN_SAMPLING=backbone=nearest_ste,refine=nearest_ste timeout 7200 \
  python tools/accuracy_run.py --task bbox --dcn --epochs 36 \
  --out work/acc_ste36br > $A/train_ste36br.log 2>&1; rc
cp work/acc_ste36br/result.json $A/ste36br_clean.json 2>/dev/null

CKC=$(python -c "from lsnet_tpu.train.checkpoint import latest_checkpoint as l; print(l('work/acc_ste36br/ckpts') or '')")
echo "ckpt C: $CKC" >> $R/queue9.log

step "eval-only C meta-armed (no env: deploy policy from ckpt sidecar)"
timeout 2400 python tools/accuracy_run.py --task bbox --dcn \
  --out work/acc_ste36br_ev --eval-only "$CKC" \
  > $A/ev_ste_br_armed.log 2>&1; rc
cp work/acc_ste36br_ev/result.json $A/ev_ste_br_armed.json 2>/dev/null

step "eval-only C explicit backbone+refine=nearest"
LSNET_DCN_SAMPLING=backbone=nearest,refine=nearest timeout 2400 \
  python tools/accuracy_run.py --task bbox --dcn \
  --out work/acc_ste36br_ev2 --eval-only "$CKC" \
  > $A/ev_ste_br_near.log 2>&1; rc
cp work/acc_ste36br_ev2/result.json $A/ev_ste_br_near.json 2>/dev/null

step "all done"
