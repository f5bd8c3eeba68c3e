#!/bin/bash
# Round-4 training campaign driver.  The r3 corpus turned out to be 5/6
# all-zero inputs (the rng-offset-as-iteration bug, fixed in
# data/datagen.py) — so r4 regenerates the train inputs in place (GT
# reused) and trains FROM SCRATCH on the fixed corpus in a separate
# model dir, BN-recalibrates, and exports a SEPARATE artifact
# (denoiser_multiscene_r4.npz).  The default-artifact swap is gated on
# the eval beating r2 (VERDICT r3 #3), done manually afterward.
# Auto-retries over tunneled-backend drops (checkpoint resume is exact).
cd /root/repo
ARGS="--out runs/r3 --train-scenes 28 --eval-scenes 4 --frames 24 --movs 2 \
      --noise-seeds 3 --gt-spp 800 --gt-spp-eval 2000 --epochs 100 --batch 4 \
      --quantize u8 --device-data --render-backend pallas_operand \
      --models-subdir models_r4 \
      --artifact denoiser_multiscene_r4.npz --bn-recal 120"
STAGE="${1:-train}"
for attempt in $(seq 1 8); do
  echo "=== attempt $attempt stage $STAGE $(date) ==="
  timeout 10800 python -u tools/train_pipeline.py $ARGS --resume --stages "$STAGE" && break
  echo "=== stage $STAGE failed (attempt $attempt), sleeping 180s ==="
  sleep 180
done
