#!/bin/bash
# Round-5 queue phase E (serialized — one chip): nearest-aware TRAINING.
#
# queue3/queue5 established that post-hoc nearest sampling at the
# tower/refine sites costs ~5.6 AP on a bilinear-trained checkpoint
# (the trained offsets expect tent-weight interpolation). The
# nearest_ste sampling mode (ops/flat_deform.py) trains offsets that
# live on the rounded lattice: forward = the 1-read nearest sample,
# backward = bilinear tent-weight gradients. If such a checkpoint
# holds AP when DEPLOYED at sampling=nearest, the measured all-nearest
# inference paths (17.0 img/s, 18.2 with taps5) become shippable.
#
# Run A: train 36e with nearest_ste at every site -> deploy point
#        "nearest" (17.02 img/s e2e @B4 flagship).
# Run B: train 36e with nearest_ste + 5-tap refine -> deploy point
#        "nearest + taps5" (18.19 img/s) — taps must match train time
#        (post-hoc taps5 cost -5.8 AP on a 9-tap checkpoint).
set -u
cd /root/repo
R=docs/perf/r5
A=docs/accuracy/r5

step() { echo "=== $1 ($(date +%H:%M:%S)) ===" >> $R/queue8.log; }
rc() { echo "rc=$?" >> $R/queue8.log; }

step "train A: R50-DCN 36e, sampling=nearest_ste (all sites)"
LSNET_DCN_SAMPLING=nearest_ste timeout 7200 python tools/accuracy_run.py \
  --task bbox --dcn --epochs 36 --out work/acc_ste36 \
  > $A/train_ste36.log 2>&1; rc
cp work/acc_ste36/result.json $A/ste36_clean.json 2>/dev/null

CKA=$(python -c "from lsnet_tpu.train.checkpoint import latest_checkpoint as l; print(l('work/acc_ste36/ckpts') or '')")
echo "ckpt A: $CKA" >> $R/queue8.log

eva() { # name, env...
  local name=$1; shift
  step "eval-only A $name"
  env "$@" timeout 2400 python tools/accuracy_run.py --task bbox --dcn \
    --out work/acc_ste36_ev_$name --eval-only "$CKA" \
    > $A/ev_ste_$name.log 2>&1; rc
  cp work/acc_ste36_ev_$name/result.json $A/ev_ste_$name.json 2>/dev/null
}

eva nearest   LSNET_DCN_SAMPLING=nearest
eva bilinear  LSNET_DCN_SAMPLING=bilinear
# (near_int8 dropped: queue7 measured int8 gather quant LOSING throughput
#  at every site split — no win to trade AP against)

step "train B: R50-DCN 36e, sampling=nearest_ste + refine taps5"
LSNET_DCN_SAMPLING=nearest_ste LSNET_REFINE_TAPS=5 timeout 7200 \
  python tools/accuracy_run.py --task bbox --dcn --epochs 36 \
  --out work/acc_ste36t5 > $A/train_ste36t5.log 2>&1; rc
cp work/acc_ste36t5/result.json $A/ste36t5_clean.json 2>/dev/null

CKB=$(python -c "from lsnet_tpu.train.checkpoint import latest_checkpoint as l; print(l('work/acc_ste36t5/ckpts') or '')")
echo "ckpt B: $CKB" >> $R/queue8.log

step "eval-only B nearest+taps5"
LSNET_DCN_SAMPLING=nearest LSNET_REFINE_TAPS=5 timeout 2400 \
  python tools/accuracy_run.py --task bbox --dcn \
  --out work/acc_ste36t5_ev --eval-only "$CKB" \
  > $A/ev_ste_t5_nearest.log 2>&1; rc
cp work/acc_ste36t5_ev/result.json $A/ev_ste_t5_nearest.json 2>/dev/null

step "all done"
