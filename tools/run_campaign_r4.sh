#!/bin/bash
# Round-4 training campaign driver.  The r3 corpus was 5/6 all-zero
# inputs (the rng-offset-as-iteration bug, fixed in data/datagen.py), so
# r4 regenerates the corpus from scratch and trains the FULL 100-epoch
# schedule on it.  Scale vs r3: GT 1200 spp (was 800; toward the ~2000
# quality knee, reference README.md:89), eval GT 2500 spp (the
# reference's own GT regime).  The corpus shape (28 scenes x 24 frames x
# 2 pans x 3 seeds @512^2 u8) is bounded by HBM: the device-resident
# training path uploads the whole corpus once (~11 GB of 16 GB on one
# v5e chip).  Exports a SEPARATE artifact (denoiser_multiscene_r4.npz);
# the default-artifact swap is gated on held-out eval beating the r2
# artifact (VERDICT r3 #3), via tools/compare_evals.py afterward.
# Auto-retries over tunneled-backend drops (checkpoint resume is exact).
cd /root/repo
ARGS="--out runs/r4 --train-scenes 28 --eval-scenes 4 --frames 24 --movs 2 \
      --noise-seeds 3 --gt-spp 1200 --gt-spp-eval 2500 --epochs 100 --batch 4 \
      --quantize u8 --device-data --render-backend pallas_operand \
      --models-subdir models \
      --artifact denoiser_multiscene_r4.npz --bn-recal 120"
STAGE="${1:-train}"
for attempt in $(seq 1 12); do
  echo "=== attempt $attempt stage $STAGE $(date) ==="
  timeout 10800 python -u tools/train_pipeline.py $ARGS --resume --stages "$STAGE" && break
  echo "=== stage $STAGE failed (attempt $attempt), sleeping 120s ==="
  sleep 120
done
