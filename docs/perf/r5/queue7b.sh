#!/bin/bash
# Round-5 queue phase D', re-run of queue7's eval block: the first run
# selected "step_N.meta.json" sidecar files via the `step_*` glob (the
# r5 checkpoint train-meta sidecars originally shipped glob-visible; now
# dotfiles — see train/checkpoint._meta_path) so every eval restored
# from a non-checkpoint path and died. The retrain itself succeeded
# (work/acc_dcn36b, bbox mAP 68.04 at the armed backbone=nearest
# default); these evals reuse it.
set -u
cd /root/repo
R=docs/perf/r5
A=docs/accuracy/r5

step() { echo "=== $1 ($(date +%H:%M:%S)) ===" >> $R/queue7b.log; }
rc() { echo "rc=$?" >> $R/queue7b.log; }

CKPT=$(python -c "from lsnet_tpu.train.checkpoint import latest_checkpoint as l; print(l('work/acc_dcn36b/ckpts') or '')")
echo "ckpt: $CKPT" >> $R/queue7b.log

ev() { # name, env...
  local name=$1; shift
  step "eval-only $name"
  env "$@" timeout 2400 python tools/accuracy_run.py --task bbox --dcn \
    --out work/acc_dcn36b_ev_$name --eval-only "$CKPT" \
    > $A/ev2_$name.log 2>&1; rc
  cp work/acc_dcn36b_ev_$name/result.json $A/ev2_$name.json 2>/dev/null
}

# refnear first — it gates the biggest no-retrain default decision
# (backbone+refine nearest measured 14.65 img/s e2e @B4)
ev refnear       LSNET_DCN_SAMPLING=backbone=nearest,refine=nearest
ev bilinear      LSNET_DCN_SAMPLING=bilinear
ev b_near        LSNET_DCN_SAMPLING=backbone=nearest
# int8/fp8 gather quant LOST throughput at every site split (bench_q_*);
# their AP points can no longer change any decision — dropped.

step "all done"
