"""Export a deployable artifact from the LATEST training checkpoint.

Insurance for wall-clock-bounded campaigns: recalibrates BN running
stats (forward-only) and writes the artifact without needing the
training loop to reach its final epoch.

    python tools/export_latest.py --model-dir runs/r3/models_r4 \
        --data runs/r3/data/train --artifact denoiser_multiscene_r4.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--artifact", default="denoiser_multiscene_r4.npz")
    ap.add_argument("--bn-recal", type=int, default=120)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--crop", type=int, default=256)
    args = ap.parse_args()

    import jax

    from ai_path_tracer_denoiser_tpu.config import ModelOptions, TrainOptions
    from ai_path_tracer_denoiser_tpu.data import (SequenceDataset,
                                                  sequence_batches)
    from ai_path_tracer_denoiser_tpu.models.export import save_model
    from ai_path_tracer_denoiser_tpu.train import (checkpoint_epoch,
                                                   init_train_state,
                                                   latest_checkpoint,
                                                   load_checkpoint,
                                                   recalibrate_bn)

    topt = TrainOptions(batch_size=args.batch, crop_size=args.crop,
                        remat_frames=args.batch >= 4)
    mopt = ModelOptions()
    state = init_train_state(jax.random.PRNGKey(0), mopt, topt)
    ckpt = latest_checkpoint(args.model_dir)
    assert ckpt, args.model_dir
    state = load_checkpoint(ckpt, state)
    epoch = checkpoint_epoch(ckpt)
    print(f"loaded {ckpt} (resume epoch {epoch}, step {int(state.step)})")

    dataset = SequenceDataset(os.path.join(args.data, "input"),
                              os.path.join(args.data, "gt"),
                              crop=True, crop_size=args.crop)
    if args.bn_recal:
        print(f"recalibrating BN over {args.bn_recal} batches ...")
        state = recalibrate_bn(
            state, sequence_batches(dataset, batch_size=args.batch,
                                    seed=10_007),
            args.bn_recal, topt, mopt)
    path = os.path.join(REPO, "artifacts", args.artifact)
    save_model(path, state.params, state.bn_state,
               meta={"trained_on": os.path.basename(args.data),
                     "epochs": (epoch - 1) if epoch else int(state.step),
                     "bn_recalibrated_batches": args.bn_recal},
               options=mopt)
    print(f"exported {path}")


if __name__ == "__main__":
    main()
