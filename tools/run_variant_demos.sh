#!/bin/bash
# Brief-train the ddpm / tesr / gdp baseline variants on the native UCM
# corpus (VERDICT r3 #3: put quality next to the --full speedups), one at
# a time (one TPU process rule). Each config ends with an in-train val at
# its own T (1000/2000) and a final checkpoint; logs land in
# /tmp/train_<variant>.log and experiments/.
set -u
cd /root/repo
# 100-step dispatch chaining (exact; tests/test_train.py): rides out the
# tunnel's degraded per-dispatch phases, ~15.7 s/1000 iters measured
export FASTDIFFSR_TPU_STEPS_PER_CALL=100
for v in ddpm tesr gdp; do
  echo "=== $v: $(date) ==="
  python -m fastdiffsr_tpu.cli.sr_mfe -p train \
    -c fastdiffsr_tpu/configs/demo_ucm_native_16_64_${v}.json \
    > /tmp/train_${v}.log 2>&1
  echo "exit: $? ($v)"
  tail -3 /tmp/train_${v}.log
done
echo "ALL VARIANTS DONE $(date)"
