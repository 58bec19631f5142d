#!/bin/bash
# Round-5 TPU measurement queue, phase A (serialized - one chip).
# The hybrid-sampling / tap-reduction throughput frontier (VERDICT r4 #3),
# the remaining orphaned r4 A/Bs (nearest, fuse_towers, train B2), and the
# per-round DMA toolchain probe (VERDICT r4 #8).
# Artifacts land in docs/perf/r5/ and are committed.
set -u
cd /root/repo
R=docs/perf/r5

step() { echo "=== $1 ($(date +%H:%M:%S)) ===" >> $R/queue2.log; }
rc() { echo "rc=$?" >> $R/queue2.log; }

step "nearest-sampling e2e (rerun, interrupted 05:27)"
LSNET_DCN_SAMPLING=nearest timeout 1200 python bench.py \
  > $R/bench_nearest.json 2> $R/bench_nearest.log; rc

step "hybrid backbone=nearest e2e"
LSNET_DCN_SAMPLING=backbone=nearest timeout 1200 python bench.py \
  > $R/bench_hyb_b.json 2> $R/bench_hyb_b.log; rc

step "hybrid backbone+tower=nearest e2e"
LSNET_DCN_SAMPLING=backbone=nearest,tower=nearest timeout 1200 python bench.py \
  > $R/bench_hyb_bt.json 2> $R/bench_hyb_bt.log; rc

step "refine taps=5 e2e"
LSNET_REFINE_TAPS=5 timeout 1200 python bench.py \
  > $R/bench_taps5.json 2> $R/bench_taps5.log; rc

step "hybrid bt-nearest + taps5 e2e"
LSNET_DCN_SAMPLING=backbone=nearest,tower=nearest LSNET_REFINE_TAPS=5 \
  timeout 1200 python bench.py \
  > $R/bench_hyb_bt_taps5.json 2> $R/bench_hyb_bt_taps5.log; rc

step "nearest + taps5 e2e (max reduction)"
LSNET_DCN_SAMPLING=nearest LSNET_REFINE_TAPS=5 timeout 1200 python bench.py \
  > $R/bench_near_taps5.json 2> $R/bench_near_taps5.log; rc

step "fuse_towers e2e"
LSNET_FUSE_TOWERS=1 timeout 1200 python bench.py \
  > $R/bench_fuse.json 2> $R/bench_fuse.log; rc

step "DMA toolchain probe (r5 ritual)"
timeout 600 python tools/probe_dma.py > $R/probe_dma.log 2>&1; rc

step "train B2 baseline"
timeout 2400 python tools/bench_train.py --batch 2 --iters 8 \
  > $R/train_base.log 2>&1; rc

step "train B2 quad"
LSNET_DCN_QUAD=1 timeout 2400 python tools/bench_train.py --batch 2 --iters 8 \
  > $R/train_quad.log 2>&1; rc

step "all done"
