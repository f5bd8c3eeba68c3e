"""Command-line application.

The user-facing surface replacing the reference's interactive binary
(main.cpp) and its satellite scripts:

  render      accumulate N spp, save PNG/HDR      <- GROUND_TRUTH mode + image.cpp
  interactive headless frame-sequence driver:      <- runCuda loop (main.cpp:120-168)
              per frame 1spp trace -> denoise -> save, orbiting camera
  datagen     training-data generation             <- train.sh + data_gen branch
  randomize   scene-variant generation             <- scenes/create_scene.py
  preprocess  PNG dirs -> npy                      <- training/preprocess.py
  train       denoiser training                    <- training/train.py
  eval        [input | prediction | GT] strips     <- training/test.py
  export      deployable model artifact            <- convert_to_torchscript.py
  bench       per-scene timing harness             <- cornell_timing scenes + TIME flag

There is no GL window (headless TPU pods); the "preview" equivalent is the
PNG frame stream written by ``interactive``.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np


def _platform_arg(p):
    if p:
        import jax
        jax.config.update("jax_platforms", p)


def _default_model_path():
    """Shipped-artifact default for ``interactive`` when --model is absent —
    the runtime analogue of the reference's compile-time MODEL_PATH
    (main.cpp:39).  Preference order: multi-scene campaign model, then the
    Cornell demo checkpoint."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for name in ("denoiser_multiscene.npz", "demo_denoiser_cornell.npz"):
        path = os.path.join(root, "artifacts", name)
        if os.path.exists(path):
            return path
    return None


def _load_scene_scaled(path, res=None, res_wh=None):
    """Load a scene, optionally re-deriving the camera at --res (square)
    or --res-wh (arbitrary, e.g. 1920x1080 — the renderer has no squareness
    constraint; the reference asserts square at pathtrace.cu:426)."""
    from ..scene import load_scene
    from ..scene.camera import derive_camera
    scene = load_scene(path)
    target = tuple(res_wh) if res_wh else ((res, res) if res else None)
    if target is not None and tuple(scene.camera.resolution) != target:
        cam = derive_camera(target, float(scene.camera.fov[1]),
                            np.asarray(scene.camera.position),
                            np.asarray(scene.camera.look_at),
                            np.asarray(scene.camera.up))
        scene = dataclasses.replace(scene, camera=cam)
    return scene


def _render_options(args):
    from ..config import RenderOptions
    kwargs = {}
    for flag in ("stream_compaction", "sort_material", "cache_first_bounce",
                 "ray_culling", "antialias", "motion_blur", "denoise",
                 "mesh_normal_view", "fresnels", "dielectric",
                 "mesh_octant_sort", "mesh_kernel_lanes", "mesh_kernel_impl",
                 "mesh_sort_cells"):
        if getattr(args, flag, None) is not None:
            kwargs[flag] = getattr(args, flag)
    if getattr(args, "rng", None):
        kwargs["rng"] = args.rng
    return RenderOptions(**kwargs)


def _display_image(image, flip: bool) -> np.ndarray:
    """Accumulated radiance -> display orientation (un-mirror)."""
    img = np.asarray(image)
    return img[:, ::-1] if flip else img


def cmd_render(args):
    _platform_arg(args.platform)
    from ..render import render
    from ..utils import save_hdr, save_png_scaled
    scene = _load_scene_scaled(args.scene, args.res, getattr(args, "res_wh", None))
    options = _render_options(args)
    spp = args.spp or scene.iterations
    t0 = time.time()
    image, gbuffer, state = render(scene, options, num_iterations=spp)
    image = _display_image(image, flip=True)
    dt = time.time() - t0
    out = args.out or scene.image_name
    path = save_png_scaled(out if out.endswith(".png") else out + ".png", image)
    if args.hdr:
        save_hdr(out.replace(".png", ""), image)
    if args.save_gbuffer:
        np.save(out.replace(".png", "") + "_gbuffer.npy", np.asarray(gbuffer))
    print(f"rendered {spp} spp in {dt:.2f}s -> {path}")


def cmd_interactive(args):
    """Headless interactive loop: 1spp + denoise per frame, orbiting camera.

    Per-frame flow mirrors runCuda (main.cpp:120-168): camera moves ->
    accumulation resets -> 1spp trace fills the G-buffer -> denoiser
    consumes it -> frame written.  Hidden states persist across frames
    (fixing the reference's traced-export reset, SURVEY.md §7).
    """
    _platform_arg(args.platform)
    import jax
    import jax.numpy as jnp

    from ..config import ModelOptions
    from ..models import (apply_frame, apply_frame_fast, init_autoencoder,
                          init_hidden, load_model, prepare_inference)
    from ..render import render_gbuffer_frame
    from ..scene.camera import orbit_camera, orbit_params_from_camera
    from ..utils import save_png_scaled

    scene = _load_scene_scaled(args.scene, args.res, getattr(args, "res_wh", None))
    options = _render_options(args)
    w, h = scene.camera.resolution
    model_path = args.model or _default_model_path()
    if model_path and os.path.exists(model_path):
        if not args.model:
            print(f"using default model {model_path}")
        params, bn_state, meta = load_model(model_path)
        from ..models import model_options_from_meta
        mopts = model_options_from_meta(meta)
    else:
        print("no trained model given; using randomly initialized denoiser")
        mopts = ModelOptions()
        params, bn_state = init_autoencoder(jax.random.PRNGKey(0), mopts)

    # Non-/32 resolutions (the 1080p north star: H 1080 -> pad 1088) run
    # through the pad-and-crop wrapper; hidden lives at the padded size.
    from ..models.inference import padded_resolution
    hp, wp = padded_resolution(h, w)
    # The (10,H,W) gbuffer -> NHWC input transform rides INSIDE the
    # denoise jit: over a tunneled backend every separate dispatch costs
    # ~3 ms of relay round-trip, so the per-frame host loop issues exactly
    # two programs (trace, denoise) instead of three.
    if args.parity_denoise or mopts.norm != "batch":
        # train-graph eval mode: BN applied from running stats each frame
        def _pad_apply(gbuf, hd):
            x = jnp.moveaxis(gbuf, 0, -1)[None]
            x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)),
                        mode="edge") if (hp, wp) != (h, w) else x
            y, hd, _ = apply_frame(params, bn_state, x, hd, train=False,
                                   bf16=True, options=mopts)
            return y[:, :h, :w, :], hd
        denoise = jax.jit(_pad_apply)
        hidden = init_hidden(1, hp, wp, mopts)
    else:
        # deployment path: BN folded into the convs, bf16 end-to-end
        # (models/inference.py) — the TorchScript-export analogue
        # (convert_to_torchscript.py) minus the hidden-reset bug.
        from ..models.inference import apply_frame_fast_padded
        folded = prepare_inference(params, bn_state, mopts)
        denoise = jax.jit(lambda gbuf, hd: apply_frame_fast_padded(
            folded, jnp.moveaxis(gbuf, 0, -1)[None], hd, mopts))
        hidden = init_hidden(1, hp, wp, mopts, dtype=jnp.bfloat16)
    phi, theta, zoom = orbit_params_from_camera(scene.camera)
    os.makedirs(args.out_dir, exist_ok=True)
    server = None
    if args.serve:
        # live preview stream — the headless stand-in for the reference's
        # GL window + imshow (preview.cpp:174-203, main.cpp:89-100)
        from ..utils.preview import PreviewServer
        server = PreviewServer(port=args.serve,
                               host=args.serve_host)
        print(f"live preview at http://localhost:{server.port}/")
    def _emit(frame, denoised, t0):
        # The device->host fetch of frame i-1 runs while frame i's trace +
        # denoise execute (jax dispatch is async): over a tunneled TPU a
        # readback costs a full RTT, which this one-frame pipeline hides.
        out = np.clip(np.asarray(denoised[0]), 0, 1)
        dt = time.time() - t0
        if server is not None:
            server.push(out)
        path = save_png_scaled(
            os.path.join(args.out_dir, f"frame_{frame:04d}"), out)
        print(f"frame {frame}: {dt * 1e3:.1f} ms -> {path}")

    pending = None
    t_loop = time.time()
    import math as _math
    gt_spp = (args.spp or scene.iterations) if args.ground_truth else 1
    if args.ground_truth:
        # GROUND_TRUTH mode (main.cpp:40-42, 160-165): hold the camera and
        # accumulate the scene's full spp budget before the denoiser sees
        # the frame — the reference's denoise-vs-converged comparison flow.
        print(f"ground-truth mode: {gt_spp} spp per frame")
    for frame in range(args.frames):
        if frame:
            phi += args.dphi
        if server is not None:
            # user orbit input from the preview page (the mouse/key
            # callbacks' headless analogue, main.cpp:169-223)
            cam_in = server.pop_camera()
            phi = cam_in.get("phi", phi) + cam_in.get("dphi", 0.0)
            theta = cam_in.get("theta", theta) + cam_in.get("dtheta", 0.0)
            zoom = cam_in.get("zoom", zoom) + cam_in.get("dzoom", 0.0)
            theta = min(max(theta, 1e-3), _math.pi - 1e-3)
            zoom = max(zoom, 0.1)
        cam = orbit_camera(scene.camera, phi, theta, zoom)
        fscene = dataclasses.replace(scene, camera=cam)
        t0 = time.time()
        if args.ground_truth:
            from ..render import render
            _, gbuffer, _ = render(fscene, options, num_iterations=gt_spp)
        else:
            _, gbuffer, _ = render_gbuffer_frame(fscene, options)
        denoised, hidden = denoise(gbuffer, hidden)
        if pending is not None:
            _emit(*pending)
        pending = (frame, denoised, t0)
    if pending is not None:
        _emit(*pending)
    if args.frames > 1:
        avg = (time.time() - t_loop) / args.frames
        print(f"{args.frames} frames, {avg * 1e3:.1f} ms/frame sustained "
              f"({1.0 / avg:.1f} fps)")


def cmd_datagen(args):
    _platform_arg(args.platform)
    from ..data import generate_training_data
    from ..scene import load_scene, parse_scene_text
    from ..scene.randomizer import generate_variants
    base = load_scene(args.scene)
    scenes = [base]
    if args.variants:
        template = open(args.scene).read()
        base_dir = os.path.dirname(os.path.abspath(args.scene))
        for text in generate_variants(template, args.variants, args.seed):
            scenes.append(parse_scene_text(text, base_dir=base_dir))
    if args.res:
        scenes = [_rescale(s, args.res) for s in scenes]
    generate_training_data(
        scenes, args.out_dir, frames_per_scene=args.frames,
        gt_spp=args.gt_spp, noise_seeds=args.noise_seeds, movs=args.movs,
        quantize=args.quantize or None,
        options=_render_options(args), png_dump=args.png_dump)


def _rescale(scene, res):
    from ..scene.camera import derive_camera
    cam = derive_camera((res, res), float(scene.camera.fov[1]),
                        np.asarray(scene.camera.position),
                        np.asarray(scene.camera.look_at),
                        np.asarray(scene.camera.up))
    return dataclasses.replace(scene, camera=cam)


def cmd_randomize(args):
    from ..scene.randomizer import generate_variants
    template = open(args.scene).read()
    os.makedirs(args.out_dir, exist_ok=True)
    for i, text in enumerate(generate_variants(template, args.count, args.seed)):
        path = os.path.join(args.out_dir, f"scene_{i + 1}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(path)


def cmd_preprocess(args):
    from ..data import preprocess_png_dirs
    preprocess_png_dirs(args.root, args.rgb, args.depth, args.albedo,
                        args.normal, args.gt, args.size)


def cmd_train(args):
    _platform_arg(args.platform)
    import jax

    from ..config import ModelOptions, TrainOptions
    from ..data import SequenceDataset, sequence_batches
    from ..train import (MetricsLogger, checkpoint_epoch, fit,
                         init_train_state, latest_checkpoint, load_checkpoint,
                         save_checkpoint)

    topt = TrainOptions(lr=args.lr, epochs=args.epochs,
                        crop_size=args.crop_size, batch_size=args.batch_size)
    mopt = ModelOptions() if not args.tpu_friendly else ModelOptions.tpu_friendly()
    state = init_train_state(jax.random.PRNGKey(topt.seed), mopt, topt)
    resume_epoch = None
    if args.resume:
        ckpt = latest_checkpoint(args.model_dir)
        if ckpt:
            state = load_checkpoint(ckpt, state)
            resume_epoch = checkpoint_epoch(ckpt)
            print(f"resumed from {ckpt} at step {int(state.step)}, "
                  f"epoch {resume_epoch}")
            if resume_epoch is not None and resume_epoch >= 2 ** 30:
                # 'final' sentinel: the previous run completed its whole
                # schedule.  --resume --epochs N for a larger N must EXTEND
                # training, not silently train zero epochs and rewrite
                # 'final' — fall back to the step-count epoch inference.
                print("checkpoint is a completed run's 'final'; extending: "
                      "falling back to step-count epoch inference")
                resume_epoch = None

    # Window boundaries come from the filenames themselves (the dataset
    # builds its per-(scene, mov, noise) table; the reference's find_max
    # pre-scan — dataloader.py:17-23 — is redundant here).
    dataset = SequenceDataset(os.path.join(args.data_dir, "input"),
                              os.path.join(args.data_dir, "gt"),
                              crop=args.crop_size > 0, crop_size=args.crop_size)
    logger = MetricsLogger(args.log_dir)

    if args.data_parallel:
        from ..parallel import make_dp_train_step, make_mesh, shard_batch
        mesh = make_mesh()
        dp_step = make_dp_train_step(mesh, topt)
        n_dev = mesh.shape["data"]
        print(f"data-parallel over {n_dev} devices")
        # simple DP epoch loop
        import dataclasses as dc

        import jax.numpy as jnp

        from ..train.schedule import step_lr
        step_count = int(state.step)
        # Resume mid-campaign: restart at the epoch the checkpoint recorded
        # so StepLR continues from the decayed rate instead of the base LR.
        # Pre-r3 checkpoints never stored it -> fall back to inferring from
        # the step count (only valid if corpus and batch size are unchanged).
        steps_per_epoch = max(1, len(dataset) // n_dev)
        start_ep = resume_epoch
        if start_ep is None:
            start_ep = step_count // steps_per_epoch
            if step_count:
                print(f"warning: checkpoint lacks an epoch record; inferred "
                      f"start epoch {start_ep} from step count (wrong if the "
                      f"corpus or batch size changed)")
        for epoch in range(start_ep, args.epochs):
            lr = step_lr(topt.lr, epoch, topt.lr_step_epochs, topt.lr_gamma)
            state = dc.replace(state, lr=jnp.asarray(lr, jnp.float32))
            for i, (x, y) in enumerate(sequence_batches(
                    dataset, batch_size=n_dev, seed=epoch)):
                xs, ys = shard_batch(jnp.asarray(x), jnp.asarray(y), mesh)
                state, metrics = dp_step(state, xs, ys)
                step_count += 1
                # sample metrics at the logging cadence with ONE host fetch
                # (per-step per-scalar float() costs a tunnel RTT each —
                # same pathology train/trainer.py fit() avoids)
                if i % 5 == 0:
                    m = {k: float(v)
                         for k, v in jax.device_get(metrics).items()}
                    logger.scalars(step_count, m)
                    print(f"epoch {epoch} step {i} total {m['total']:.4f}")
            if epoch % topt.checkpoint_every_epochs == 0:
                save_checkpoint(args.model_dir, state, epoch)
        save_checkpoint(args.model_dir, state, "final")
    else:
        # epoch-aware iterator (fresh shuffle + crop stream per epoch) and
        # resume-aware start_epoch (StepLR continues from the decayed rate)
        start_ep = resume_epoch
        if start_ep is None:
            steps_per_epoch = max(1, len(dataset) // topt.batch_size)
            start_ep = int(state.step) // steps_per_epoch
            if int(state.step):
                print(f"warning: checkpoint lacks an epoch record; inferred "
                      f"start epoch {start_ep} from step count (wrong if the "
                      f"corpus or batch size changed)")
        fit(state,
            lambda epoch: sequence_batches(dataset, batch_size=topt.batch_size,
                                           seed=epoch),
            topt, epochs=args.epochs, logger=logger,
            checkpoint_fn=lambda s, e: save_checkpoint(args.model_dir, s, e),
            model_options=mopt,
            start_epoch=start_ep)


def cmd_eval(args):
    """[noisy input | prediction | ground truth] strips -> GIF (test.py:36-55)."""
    _platform_arg(args.platform)
    import jax
    import jax.numpy as jnp

    from ..config import ModelOptions
    from ..data import SequenceDataset
    from ..models import apply_frame, init_autoencoder, init_hidden, load_model
    from ..train import latest_checkpoint, load_checkpoint, init_train_state
    from ..utils import save_png_scaled

    if args.model.endswith(".npz") and "model_" in os.path.basename(args.model):
        from ..config import TrainOptions
        from ..models import model_options_from_params
        template = init_train_state(jax.random.PRNGKey(0))
        state = load_checkpoint(args.model, template)
        params, bn_state = state.params, state.bn_state
        # widths come from the checkpoint's own shapes (a tpu_friendly
        # checkpoint evaluated with hardcoded defaults would crash on the
        # hidden/width concat); norm is unrecoverable from shapes -> --norm
        mopts = model_options_from_params(params,
                                          norm=getattr(args, "norm", "batch"))
    else:
        params, bn_state, meta = load_model(args.model)
        from ..models import model_options_from_meta
        mopts = model_options_from_meta(meta)

    dataset = SequenceDataset(os.path.join(args.data_dir, "input"),
                              os.path.join(args.data_dir, "gt"), None)
    denoise = jax.jit(lambda p, s, x, hd: apply_frame(p, s, x, hd,
                                                      train=False)[:2])
    frames = []
    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(0, len(dataset), 7):
        x, y = dataset[i]
        t, h, w, _ = x.shape
        hidden = init_hidden(1, h, w, mopts)
        for j in range(t):
            pred, hidden = denoise(params, bn_state,
                                   jnp.asarray(x[j:j + 1]), hidden)
            strip = np.concatenate([
                np.clip(x[j, :, :, :3], 0, 1),
                np.clip(np.asarray(pred[0]), 0, 1),
                np.clip(y[j], 0, 1)], axis=1)
            frames.append((strip * 255).astype(np.uint8))
        if args.max_sequences and len(frames) >= args.max_sequences * 7:
            break
    gif_path = os.path.join(args.out_dir, "network_output.gif")
    try:
        import imageio
        imageio.mimsave(gif_path, frames)
        print(f"wrote {gif_path} ({len(frames)} frames)")
    except ImportError:
        for k, fr in enumerate(frames):
            save_png_scaled(os.path.join(args.out_dir, f"strip_{k:04d}"),
                            fr / 255.0)
        print(f"imageio unavailable; wrote {len(frames)} PNG strips")


def cmd_export(args):
    """Checkpoint -> deployable artifact (convert_to_torchscript.py analogue)."""
    import jax

    from ..models import model_options_from_params, save_model
    from ..train import init_train_state, load_checkpoint
    # The template only supplies the opt_state tree *structure* (identical
    # for every channel plan); params/bn_state come wholly from the file,
    # and the exported widths metadata is derived from their shapes.
    template = init_train_state(jax.random.PRNGKey(0))
    state = load_checkpoint(args.checkpoint, template)
    mopt = model_options_from_params(state.params,
                                     norm=getattr(args, "norm", "batch"))
    save_model(args.out, state.params, state.bn_state, options=mopt)
    print(f"exported {args.out} (widths {mopt.widths}, norm {mopt.norm})")


def cmd_bench(args):
    """Per-scene timing harness (metrics.xlsx reproduction)."""
    _platform_arg(args.platform)
    import jax
    import jax.numpy as jnp

    import contextlib

    from ..render import render
    from ..utils.debug import profile_trace
    results = {}
    for scene_path in args.scenes:
        scene = _load_scene_scaled(scene_path, args.res, getattr(args, "res_wh", None))
        options = _render_options(args)
        # warm compile, then time with a host transfer as the fence
        # (block_until_ready can return early over tunneled backends)
        _, _, state = render(scene, options, num_iterations=2)
        np.asarray(state.accum.x)
        ctx = (profile_trace(args.profile) if args.profile
               else contextlib.nullcontext())
        with ctx:
            t0 = time.time()
            _, _, state = render(scene, options, num_iterations=args.iters)
            np.asarray(state.accum.x)
            dt = (time.time() - t0) * 1e3
        results[os.path.basename(scene_path)] = round(dt, 1)
        print(f"{scene_path}: {args.iters} iterations in {dt:.1f} ms")
    print(json.dumps(results))


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="python -m ai_path_tracer_denoiser_tpu.app",
        description="TPU-native path tracer + recurrent denoiser")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_common(sp, scene=True):
        if scene:
            sp.add_argument("scene", help="scene .txt file")
        sp.add_argument("--res", type=int, default=None)
        sp.add_argument("--res-wh", type=int, nargs=2, default=None,
                        metavar=("W", "H"),
                        help="non-square resolution, e.g. --res-wh 1920 1080 "
                             "(denoiser pads H/W to /32 and crops back)")
        sp.add_argument("--platform", default=None,
                        help="jax platform override (e.g. cpu)")
        for flag in ("stream-compaction", "sort-material", "cache-first-bounce",
                     "ray-culling", "antialias", "motion-blur", "denoise",
                     "mesh-normal-view", "fresnels", "dielectric"):
            dest = flag.replace("-", "_")
            sp.add_argument(f"--{flag}", dest=dest, action="store_true",
                            default=None)
            sp.add_argument(f"--no-{flag}", dest=dest, action="store_false",
                            default=None)
        sp.add_argument("--rng", choices=("parity", "fast"), default=None)
        sp.add_argument("--mesh-octant-sort", dest="mesh_octant_sort",
                        action="store_true", default=None)
        sp.add_argument("--no-mesh-octant-sort", dest="mesh_octant_sort",
                        action="store_false", default=None)
        sp.add_argument("--mesh-sort-cells", dest="mesh_sort_cells",
                        type=int, default=None,
                        help="with octant sort, origin-cell Morton major "
                             "key over N^3 cells (0 = octant only)")
        sp.add_argument("--mesh-kernel-lanes", type=int, default=None,
                        help="rays per BVH-kernel program for secondary "
                             "bounces (128 or 1024)")
        sp.add_argument("--mesh-kernel-impl", choices=("v2", "v2p", "v2s", "v3"),
                        default=None,
                        help="BVH traversal kernel (bitwise-identical "
                             "results; perf/experimental choice)")

    sp = sub.add_parser("render", help="accumulate N spp and save an image")
    add_common(sp)
    sp.add_argument("--spp", type=int, default=None)
    sp.add_argument("--out", default=None)
    sp.add_argument("--hdr", action="store_true")
    sp.add_argument("--save-gbuffer", action="store_true")
    sp.set_defaults(fn=cmd_render)

    sp = sub.add_parser("interactive",
                        help="headless 1spp+denoise frame loop (orbit camera)")
    add_common(sp)
    sp.add_argument("--frames", type=int, default=30)
    sp.add_argument("--dphi", type=float, default=0.01)
    sp.add_argument("--model", default=None)
    sp.add_argument("--out-dir", default="frames")
    sp.add_argument("--serve-host", default="127.0.0.1",
                    help="preview bind address (default loopback only)")
    sp.add_argument("--serve", type=int, default=0, metavar="PORT",
                    help="stream frames live over HTTP (MJPEG) on PORT")
    sp.add_argument("--parity-denoise", action="store_true",
                    help="run the train-graph eval path instead of the "
                         "BN-folded bf16 deployment path")
    sp.add_argument("--ground-truth", action="store_true",
                    help="accumulate the scene's full spp budget (or --spp) "
                         "per frame before denoising — GROUND_TRUTH mode "
                         "(main.cpp:40-42, 160-165)")
    sp.add_argument("--spp", type=int, default=None,
                    help="spp per frame in --ground-truth mode "
                         "(default: the scene's ITERATIONS)")
    sp.set_defaults(fn=cmd_interactive)

    sp = sub.add_parser("datagen", help="generate training data")
    add_common(sp)
    sp.add_argument("--out-dir", required=True)
    sp.add_argument("--frames", type=int, default=60)
    sp.add_argument("--gt-spp", type=int, default=512)
    sp.add_argument("--noise-seeds", type=int, default=1)
    sp.add_argument("--movs", type=int, default=2,
                    help="camera pans per scene (reference 'mov' axis)")
    sp.add_argument("--quantize", default="", choices=("u8", ""),
                    help="store npy as uint8 (reference 8-bit regime)")
    sp.add_argument("--variants", type=int, default=0)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--png-dump", action="store_true")
    sp.set_defaults(fn=cmd_datagen)

    sp = sub.add_parser("randomize", help="write randomized scene variants")
    sp.add_argument("scene")
    sp.add_argument("--count", type=int, default=30)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--out-dir", default="scenes_generated")
    sp.set_defaults(fn=cmd_randomize)

    sp = sub.add_parser("preprocess", help="PNG dirs -> npy training pairs")
    sp.add_argument("--root", required=True)
    sp.add_argument("--rgb", required=True)
    sp.add_argument("--depth", required=True)
    sp.add_argument("--albedo", required=True)
    sp.add_argument("--normal", required=True)
    sp.add_argument("--gt", required=True)
    sp.add_argument("--size", type=int, default=512)
    sp.set_defaults(fn=cmd_preprocess)

    sp = sub.add_parser("train", help="train the denoiser")
    sp.add_argument("--data-dir", required=True)
    sp.add_argument("--model-dir", default="models_out")
    sp.add_argument("--log-dir", default="logs")
    sp.add_argument("--epochs", type=int, default=100)
    sp.add_argument("--lr", type=float, default=1e-3)
    sp.add_argument("--crop-size", type=int, default=256)
    sp.add_argument("--batch-size", type=int, default=1)
    sp.add_argument("--resume", action="store_true")
    sp.add_argument("--data-parallel", action="store_true")
    sp.add_argument("--tpu-friendly", action="store_true")
    sp.add_argument("--platform", default=None)
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("eval", help="render comparison strips / GIF")
    sp.add_argument("--data-dir", required=True)
    sp.add_argument("--model", required=True)
    sp.add_argument("--out-dir", default="eval_out")
    sp.add_argument("--max-sequences", type=int, default=8)
    sp.add_argument("--platform", default=None)
    sp.add_argument("--norm", default="batch", choices=("batch", "group"),
                    help="norm layer of a raw checkpoint (unrecoverable "
                         "from its shapes; .npz artifacts carry it in meta)")
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("export", help="checkpoint -> deployable .npz")
    sp.add_argument("checkpoint")
    sp.add_argument("--out", default="model_deploy.npz")
    sp.add_argument("--norm", default="batch", choices=("batch", "group"),
                    help="norm layer the checkpoint was trained with "
                         "(unrecoverable from shapes; written to meta)")
    sp.set_defaults(fn=cmd_export)

    sp = sub.add_parser("bench", help="per-scene timing harness")
    add_common(sp, scene=False)
    sp.add_argument("scenes", nargs="+")
    sp.add_argument("--iters", type=int, default=500)
    sp.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler trace of the timed run")
    sp.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
