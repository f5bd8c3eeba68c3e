"""Device-resident training data: upload every frame once, crop on device.

The reference's loader re-reads PNG-derived npy files from disk every step
(dataloader.py:50-52).  The host-streaming analogue here
(`data/dataset.py` + `fit`) ships ~50 MB per batch-8 step over the
host->device link — which on tunneled TPU hosts both bounds step time and
(with the tunnel client's host-RAM transfer leak) bounds process lifetime.

This module removes the per-step transfer entirely, the TPU-native way:

  * the full frame corpus is uploaded ONCE as two device arrays
    X (F, H, W, 10) / Y (F, H, W, 3) in bfloat16 (a 28-scene 512^2
    campaign is ~8.6 GB — fits HBM beside batch-8 remat training);
  * each step sends only three small int32 vectors (window starts, crop
    offsets); the 7-frame 256^2 crop windows are sliced ON DEVICE with a
    vmapped ``lax.dynamic_slice`` fused into the jitted train step.

Windows are consecutive frame POSITIONS (``SequenceDataset.window_start``
— the reference's end-of-sequence clamp, dataloader.py:48-49), so one
dynamic_slice per sequence covers the whole (T, crop, crop, C) block.
Crop offsets stay crop_size-ALIGNED with the same per-(seed, item) RNG
keying as the host loader, so curves are run-reproducible.
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelOptions, TrainOptions
from .trainer import TrainState, train_step
from .schedule import step_lr


def load_device_dataset(dataset, dtype=jnp.bfloat16, chunk: int = 96):
    """Upload a SequenceDataset's frames to device.

    Returns (X (F,H,W,10), Y (F,H,W,3) device arrays in ``dtype``,
    window_starts (F,) int32 host array).  Frames are staged in ``chunk``-
    frame pieces written into donated device buffers, so peak device
    memory is dataset + one chunk.
    """
    import ml_dtypes

    f0 = np.load(dataset.path_of(0, gt=False), mmap_mode="r")
    h, w = f0.shape[:2]
    n = len(dataset)
    if f0.dtype == np.uint8:
        # u8-quantized corpus (datagen quantize="u8"): upload RAW uint8 —
        # 1/2 the bf16 footprint (a 2-pan x 3-seed 512^2 campaign fits a
        # 16 GB chip only this way) — and decode on device AFTER cropping,
        # so host and device paths see identical values.
        dtype = jnp.uint8
        np_dtype = np.uint8
    else:
        np_dtype = ml_dtypes.bfloat16 if dtype == jnp.bfloat16 else np.float32

    @partial(jax.jit, donate_argnums=(0,))
    def insert(buf, piece, start):
        return jax.lax.dynamic_update_slice(
            buf, piece, (start,) + (0,) * (buf.ndim - 1))

    def upload(shape, gt):
        buf = jnp.zeros(shape, dtype)
        for s in range(0, n, chunk):
            e = min(n, s + chunk)
            piece = np.empty((e - s,) + shape[1:], np_dtype)
            for i in range(s, e):
                frame = np.load(dataset.path_of(i, gt=gt), mmap_mode="r")
                # A mixed f32/u8 corpus (reachable via datagen resume-skip
                # across a --quantize change) would silently corrupt here:
                # the numpy cast into `piece` truncates f32 [0,1] values to
                # 0/1 in a u8 buffer, or reinterprets raw u8 0-255 as float
                # G-buffer magnitudes.  The host loader decodes per-file and
                # would silently diverge — fail loudly instead.
                if frame.dtype != f0.dtype:
                    raise ValueError(
                        f"mixed-dtype corpus: {dataset.path_of(i, gt=gt)} is "
                        f"{frame.dtype} but frame 0 is {f0.dtype}; "
                        "regenerate the corpus with one --quantize mode")
                piece[i - s] = frame
            buf = insert(buf, jnp.asarray(piece), s)
        return buf

    X = upload((n, h, w, 10), gt=False)
    Y = upload((n, h, w, 3), gt=True)
    X.block_until_ready()
    starts = np.asarray([dataset.window_start(i) for i in range(n)],
                        np.int32)
    return X, Y, starts


def _crop_batch(X, Y, starts, cys, cxs, t, ch, cw):
    """(N,) windows -> time-major (T, N, ch, cw, C) batches, on device."""
    def one(s, cy, cx):
        x = jax.lax.dynamic_slice(X, (s, cy, cx, 0), (t, ch, cw, X.shape[-1]))
        y = jax.lax.dynamic_slice(Y, (s, cy, cx, 0), (t, ch, cw, Y.shape[-1]))
        return x, y
    xs, ys = jax.vmap(one)(starts, cys, cxs)           # (N, T, c, c, C)
    return jnp.swapaxes(xs, 0, 1), jnp.swapaxes(ys, 0, 1)


def fit_device_data(state: TrainState, dataset,
                    train_options: TrainOptions = TrainOptions(),
                    epochs: Optional[int] = None,
                    logger=None, checkpoint_fn=None, log_every: int = 5,
                    model_options: Optional[ModelOptions] = None,
                    start_epoch: int = 0,
                    data=None) -> TrainState:
    """fit() with the corpus device-resident; same schedule/logging contract.

    ``data``: optional pre-loaded (X, Y, window_starts) triple from
    ``load_device_dataset`` (loaded here if absent).
    """
    topt = train_options
    epochs = epochs if epochs is not None else topt.epochs
    if data is None:
        t0 = time.time()
        # Upload dtype follows the compute dtype: with bf16_compute=False
        # the host fit() path trains on f32 inputs, and this path must
        # match it numerically rather than silently quantizing to bf16.
        data = load_device_dataset(
            dataset,
            dtype=jnp.bfloat16 if topt.bf16_compute else jnp.float32)
        print(f"[device-data] uploaded {len(dataset)} frames "
              f"({(data[0].nbytes + data[1].nbytes) / 2**30:.1f} GiB) "
              f"in {time.time() - t0:.0f}s")
    X, Y, starts_tbl = data
    n = len(dataset)
    batch = topt.batch_size
    t_frames = topt.sequence_length
    h, w = X.shape[1:3]
    # crop_size=0 disables cropping: full (H, W) frames, like the host path.
    crop_h = topt.crop_size if topt.crop_size else h
    crop_w = topt.crop_size if topt.crop_size else w
    steps_per_epoch = n // batch

    # X/Y ride as ARGUMENTS, not closure captures: captured device arrays
    # are baked into the lowered program as constants (9 GB of them — the
    # lowering itself warns), while arguments pass by reference for free.
    in_dtype = jnp.bfloat16 if topt.bf16_compute else jnp.float32

    @jax.jit
    def jit_step(state, X, Y, starts, cys, cxs):
        x, y = _crop_batch(X, Y, starts, cys, cxs, t_frames, crop_h, crop_w)
        if X.dtype == jnp.uint8:
            # decode the u8 regime post-crop (data/dataset.py decode_u8_*)
            x = x.astype(jnp.float32) / 255.0
            x = jnp.concatenate([x[..., 0:3], x[..., 3:6] * 2.0 - 1.0,
                                 x[..., 6:7] * 10.0, x[..., 7:10]], axis=-1)
            x = x.astype(in_dtype)
            y = (y.astype(jnp.float32) / 255.0).astype(in_dtype)
        return train_step(state, x, y, topt, model_options=model_options)

    overall_step = int(state.step)
    for epoch in range(start_epoch, epochs):
        lr = step_lr(topt.lr, epoch, topt.lr_step_epochs, topt.lr_gamma)
        state = dataclasses.replace(state, lr=jnp.asarray(lr, jnp.float32))
        t0 = time.time()
        order = np.arange(n)
        np.random.default_rng(epoch).shuffle(order)
        total, count = 0.0, 0
        epoch_base = overall_step

        def _log(i, metrics):
            nonlocal total, count
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            total += m["total"]
            count += 1
            if logger is not None:
                logger.scalars(epoch_base + i + 1, m)
            print(f"Epoch [{epoch}] Step [{i}] "
                  f"Total {m['total']:.4f} L1 {m['l1']:.4f} "
                  f"HFEN {m['hfen']:.4f} "
                  f"Temporal {m['temporal']:.4f} lr {lr:g}")

        pending = None
        for i in range(steps_per_epoch):
            idxs = order[i * batch:(i + 1) * batch]
            # same (seed, item) crop keying as sequence_batches
            cy = np.empty(batch, np.int32)
            cx = np.empty(batch, np.int32)
            for j, item in enumerate(idxs):
                rng = np.random.default_rng([epoch, int(item)])
                # EXACT same draw expression as SequenceDataset.__getitem__
                # (dataset.py) — identical crops bit-for-bit, and identical
                # failure (integers(0) raises) on frames smaller than the
                # crop, instead of silently clamping out-of-range offsets.
                cy[j] = int(rng.integers(h // crop_h)) * crop_h
                cx[j] = int(rng.integers(w // crop_w)) * crop_w
            state, metrics = jit_step(
                state, X, Y, jnp.asarray(starts_tbl[idxs]), jnp.asarray(cy),
                jnp.asarray(cx))
            if i % log_every == 0:
                if pending is not None:
                    _log(*pending)
                pending = (i, metrics)
        if pending is not None:
            _log(*pending)
        overall_step += steps_per_epoch
        dt = time.time() - t0
        if count:
            print(f"Epoch {epoch}: avg loss {total / count:.4f} ({dt:.1f}s)")
        if checkpoint_fn is not None and \
                epoch % topt.checkpoint_every_epochs == 0:
            checkpoint_fn(state, epoch)
    if checkpoint_fn is not None:
        checkpoint_fn(state, "final")
    return state
