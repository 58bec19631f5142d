#!/bin/bash
# Round-5 queue phase D (serialized — one chip): gather-source row
# quantization (VERDICT r4 #3c, the one frontier lever never measured)
# plus the unmeasured refine=nearest AP point.
#
# Throughput side: bench.py e2e @B4 under each quant/sampling policy
# (the shipped inference default backbone=nearest applies unless
# LSNET_DCN_SAMPLING overrides; LSNET_GATHER_QUANT is explicit in every
# run). AP side: retrain the R50-DCN 36e frontier checkpoint (work/ was
# wiped between sessions), then eval-only under each policy with every
# knob explicit — protocol identical to queue3/queue5.
set -u
cd /root/repo
R=docs/perf/r5
A=docs/accuracy/r5

step() { echo "=== $1 ($(date +%H:%M:%S)) ===" >> $R/queue7.log; }
rc() { echo "rc=$?" >> $R/queue7.log; }

step "e2e: int8 gather rows, all sites (on shipped backbone=nearest)"
LSNET_GATHER_QUANT=int8 timeout 1800 python bench.py \
  > $R/bench_q_int8.json 2> $R/bench_q_int8.log; rc

step "e2e: int8 gather rows, backbone site only"
LSNET_GATHER_QUANT=backbone=int8 timeout 1800 python bench.py \
  > $R/bench_q_bint8.json 2> $R/bench_q_bint8.log; rc

step "e2e: fp8 gather rows, all sites"
LSNET_GATHER_QUANT=fp8 timeout 1800 python bench.py \
  > $R/bench_q_fp8.json 2> $R/bench_q_fp8.log; rc

step "e2e: backbone=nearest + refine=nearest (unmeasured sampling point)"
LSNET_DCN_SAMPLING=backbone=nearest,refine=nearest timeout 1800 \
  python bench.py > $R/bench_refnear.json 2> $R/bench_refnear.log; rc

step "retrain R50-DCN 36e frontier checkpoint (work/ wiped)"
timeout 7200 python tools/accuracy_run.py --task bbox --dcn --epochs 36 \
  --out work/acc_dcn36b > $A/train_dcn36b.log 2>&1; rc
cp work/acc_dcn36b/result.json $A/dcn36b_clean.json 2>/dev/null

CKPT=$(ls -d work/acc_dcn36b/ckpts/step_* 2>/dev/null | sort -t_ -k2 -n | tail -1)
echo "ckpt: $CKPT" >> $R/queue7.log

ev() { # name, env...
  local name=$1; shift
  step "eval-only $name"
  env "$@" timeout 2400 python tools/accuracy_run.py --task bbox --dcn \
    --out work/acc_dcn36b_ev_$name --eval-only "$CKPT" \
    > $A/ev2_$name.log 2>&1; rc
  cp work/acc_dcn36b_ev_$name/result.json $A/ev2_$name.json 2>/dev/null
}

ev bilinear      LSNET_DCN_SAMPLING=bilinear
ev b_near        LSNET_DCN_SAMPLING=backbone=nearest
ev int8          LSNET_DCN_SAMPLING=bilinear LSNET_GATHER_QUANT=int8
ev b_near_int8   LSNET_DCN_SAMPLING=backbone=nearest LSNET_GATHER_QUANT=int8
ev b_near_bint8  LSNET_DCN_SAMPLING=backbone=nearest LSNET_GATHER_QUANT=backbone=int8
ev b_near_fp8    LSNET_DCN_SAMPLING=backbone=nearest LSNET_GATHER_QUANT=fp8
ev refnear       LSNET_DCN_SAMPLING=backbone=nearest,refine=nearest

step "all done"
