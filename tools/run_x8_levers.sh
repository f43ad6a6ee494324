#!/bin/bash
# x8 SSIM corpus levers (VERDICT r3 #5): train the three
# orientation-preserving corpus variants one at a time (one TPU process
# rule) — s8h (stride-8 + hflip, 972 tiles), midh (stride-16 + hflip,
# 600 tiles), s8 (stride-8, 486 tiles) — extending the r2/r3 data-scaling
# curve (24 / 150 / 1200-dihedral). Logs land in /tmp/train_x8_<tag>.log;
# in-train val every 10k iters reports PSNR/SSIM on the 4 clean holdout
# quadrants.
set -u
cd /root/repo
export FASTDIFFSR_TPU_STEPS_PER_CALL=100
for tag in s8h midh s8; do
  echo "=== x8 $tag: $(date) ==="
  python -m fastdiffsr_tpu.cli.sr_mfe -p train \
    -c fastdiffsr_tpu/configs/demo_ucm_native_8_64_${tag}.json \
    > /tmp/train_x8_${tag}.log 2>&1
  echo "exit: $? ($tag)"
  grep Validation /tmp/train_x8_${tag}.log | tail -8
done
echo "ALL X8 DONE $(date)"
