#!/bin/bash
# End-of-round campaign finish: export from the latest checkpoint, eval
# BOTH artifacts on the same held-out pool, and gate the default swap on
# the comparison (VERDICT r3 #3 / ADVICE r3 #2).  Run AFTER stopping the
# training process.
set -e
cd /root/repo
OUT=runs/r4
ARGS="--out $OUT --train-scenes 28 --eval-scenes 4 --frames 24 --movs 2 \
      --noise-seeds 3 --gt-spp 1200 --gt-spp-eval 2500 --epochs 100 --batch 4 \
      --quantize u8"

echo "=== export r4 artifact from latest checkpoint (BN recal) ==="
timeout 2400 python -u tools/export_latest.py --model-dir $OUT/models \
    --data $OUT/data/train --artifact denoiser_multiscene_r4.npz

echo "=== eval r4 artifact on held-out pool ==="
timeout 2400 python -u tools/train_pipeline.py $ARGS --stages eval \
    --artifact denoiser_multiscene_r4.npz --prefix r4_
cp $OUT/eval.json $OUT/eval_r4.json

echo "=== eval the current default (r2) artifact on the SAME pool ==="
timeout 2400 python -u tools/train_pipeline.py $ARGS --stages eval \
    --artifact denoiser_multiscene.npz --prefix r2_
cp $OUT/eval.json $OUT/eval_r2.json

echo "=== gate ==="
python tools/compare_evals.py $OUT/eval_r2.json $OUT/eval_r4.json
