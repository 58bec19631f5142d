#!/bin/bash
# Round-5 TPU measurement queue (serialized - one chip).
# Artifacts land in docs/perf/r5/ and are committed (VERDICT r4 weak #4).
set -u
cd /root/repo
R=docs/perf/r5

step() { echo "=== $1 ($(date +%H:%M:%S)) ===" >> $R/queue.log; }

step "quad e2e (MAXC default 512)"
LSNET_DCN_QUAD=1 timeout 1500 python bench.py \
  > $R/bench_quad.json 2> $R/bench_quad.log
echo "rc=$?" >> $R/queue.log

step "quad e2e all widths (MAXC=2048)"
LSNET_DCN_QUAD=1 LSNET_DCN_QUAD_MAXC=2048 timeout 1500 python bench.py \
  > $R/bench_quad2048.json 2> $R/bench_quad2048.log
echo "rc=$?" >> $R/queue.log

step "nearest-sampling e2e"
LSNET_DCN_SAMPLING=nearest timeout 1500 python bench.py \
  > $R/bench_nearest.json 2> $R/bench_nearest.log
echo "rc=$?" >> $R/queue.log

step "fuse_towers e2e"
LSNET_FUSE_TOWERS=1 timeout 1500 python bench.py \
  > $R/bench_fuse.json 2> $R/bench_fuse.log
echo "rc=$?" >> $R/queue.log

step "train B2 baseline"
timeout 2400 python tools/bench_train.py --batch 2 --iters 8 \
  > $R/train_base.log 2>&1
echo "rc=$?" >> $R/queue.log

step "train B2 quad"
LSNET_DCN_QUAD=1 timeout 2400 python tools/bench_train.py --batch 2 --iters 8 \
  > $R/train_quad.log 2>&1
echo "rc=$?" >> $R/queue.log

step "all done"
