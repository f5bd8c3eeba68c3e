#!/bin/bash
# Round-5 training campaign: the host-streamed regime (VERDICT r4 #3+#7).
#
# Regime: 12 train scenes x 50 frames x 2 pans x 5 noise seeds = 6,000
# frames at 512^2 (u8) — 100 frames/scene and the reference's full
# 5-seed noise axis (README.md:96-103), a ~20 GB corpus that CANNOT fit
# the 16 GB chip: it trains through the r5 host-streamed sharded feed
# (train/stream_data.py, --stream-gb 6).  GT 1200 spp shared across the
# seed axis; eval pool 4 unseen scenes at GT 2500 spp.
#
# Conv-impl A/B (VERDICT r4 #7): run `ab` first — two 2-epoch runs from
# the same init, pallas2 (the TPU-default custom-VJP CHW kernel) vs
# matmul — compare loss trajectories + step time in runs/r5ab_*/, then
# train the full campaign with the winner via APTD_CONV_IMPL.
#
# Stages:  bash tools/run_campaign_r5.sh datagen|ab|train|eval|report
cd /root/repo
DATA="--out runs/r5 --train-scenes 12 --eval-scenes 4 --frames 50 --movs 2 \
      --noise-seeds 5 --gt-spp 1200 --gt-spp-eval 2500 --batch 4 \
      --quantize u8 --render-backend pallas_operand \
      --artifact denoiser_multiscene_r5.npz --bn-recal 120"
STAGE="${1:-train}"

run_retry() {
  for attempt in $(seq 1 12); do
    echo "=== attempt $attempt: $* $(date) ==="
    timeout 10800 "$@" && return 0
    echo "=== failed (attempt $attempt), sleeping 120s ==="
    sleep 120
  done
  return 1
}

case "$STAGE" in
  datagen)
    run_retry python -u tools/train_pipeline.py $DATA --resume \
        --stages datagen ;;
  ab)
    for impl in pallas2 matmul; do
      APTD_CONV_IMPL=$impl run_retry python -u tools/train_pipeline.py \
          --out runs/r5ab_$impl --train-scenes 12 --eval-scenes 4 \
          --frames 50 --movs 2 --noise-seeds 5 --gt-spp 1200 \
          --gt-spp-eval 2500 --batch 4 --quantize u8 \
          --render-backend pallas_operand --data-from runs/r5 \
          --epochs 2 --stream-gb 6 --stages train \
          --models-subdir models
    done ;;
  train)
    # APTD_CONV_IMPL set by the caller per the ab verdict
    run_retry python -u tools/train_pipeline.py $DATA --resume \
        --epochs 100 --stream-gb 6 --models-subdir models --stages train ;;
  eval|report)
    run_retry python -u tools/train_pipeline.py $DATA --resume \
        --stream-gb 6 --models-subdir models --stages "$STAGE" ;;
esac
