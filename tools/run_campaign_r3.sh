#!/bin/bash
# Round-3 training campaign driver with auto-retry (the tunneled TPU
# backend occasionally drops; datagen resumes per frame, training resumes
# from the last checkpoint).
cd /root/repo
ARGS="--out runs/r3 --train-scenes 28 --eval-scenes 4 --frames 24 --movs 2 \
      --noise-seeds 3 --gt-spp 800 --gt-spp-eval 2000 --epochs 100 --batch 4 \
      --quantize u8 --device-data --render-backend pallas_operand"
STAGE="$1"
for attempt in $(seq 1 12); do
  echo "=== attempt $attempt stage $STAGE $(date) ==="
  timeout 7200 python -u tools/train_pipeline.py $ARGS --resume --stages "$STAGE" && break
  echo "=== stage $STAGE failed (attempt $attempt), sleeping 180s ==="
  sleep 180
done
