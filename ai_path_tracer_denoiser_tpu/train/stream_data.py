"""Host-streamed sharded training: corpora bigger than HBM (r5).

The device-resident path (train/device_data.py) uploads the whole corpus
once — which caps the corpus at what fits beside training (~11 GB on a
16 GB v5e; the r4 campaign's 24-frames/scene regime was pinned by
exactly this, VERDICT r4 §missing #1).  This module lifts the bound the
TPU-native way: the corpus splits into **sequence-aligned shards**, each
shard trains from the same on-device crop/slice path, and shards swap
through two persistent donated device buffers while a host thread
prefetches the next shard's frames from disk.

  * Shards are cut at (scene, mov, noise) GROUP boundaries, so a 7-frame
    window never crosses a shard (window_start stays in-group by
    construction, data/dataset.py).
  * Transfer amortizes over a shard's whole step run: a ~6 GB shard
    uploads once per epoch-visit (~seconds) against minutes of steps —
    <10% overhead vs device-resident, with no corpus size limit.
  * Sampling is shard-stratified: shard order reshuffles every epoch
    (rng(epoch)), windows shuffle within each shard (rng([epoch,
    shard])).  With one shard this degenerates to the device-resident
    path's exact global shuffle (rng(epoch)) — bitwise-comparable, and
    tested so.  Crop offsets keep the global (epoch, item) keying, so
    they are identical under any sharding.

Reference anchor: the regime this unlocks is the reference's own
(~300 frames/scene x 2 pans x 5 noise seeds, README.md:96-103,
train.sh:13-30) — far past single-chip HBM at 512^2.
"""
from __future__ import annotations

import dataclasses
import threading
import time
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelOptions, TrainOptions
from .device_data import _crop_batch
from .schedule import step_lr
from .trainer import TrainState, train_step


def group_ranges(dataset) -> List[Tuple[int, int]]:
    """Contiguous index ranges of the (scene, mov, noise) groups."""
    ranges = []
    prev = None
    start = 0
    for i, (s, mv, nz, _f) in enumerate(dataset._keys):
        key = (s, mv, nz)
        if key != prev and prev is not None:
            ranges.append((start, i))
            start = i
        prev = key
    ranges.append((start, len(dataset)))
    return ranges


def shard_plan(dataset, max_frames: int) -> List[Tuple[int, int]]:
    """Greedy pack whole groups into shards of <= max_frames frames."""
    shards = []
    cur_s, cur_e = None, None
    for (s, e) in group_ranges(dataset):
        if e - s > max_frames:
            raise ValueError(
                f"group [{s},{e}) has {e - s} frames > shard capacity "
                f"{max_frames}; raise the shard budget")
        if cur_s is None:
            cur_s, cur_e = s, e
        elif e - cur_s <= max_frames:
            cur_e = e
        else:
            shards.append((cur_s, cur_e))
            cur_s, cur_e = s, e
    if cur_s is not None:
        shards.append((cur_s, cur_e))
    return shards


def _frame_dtypes(dataset, bf16: bool):
    f0 = np.load(dataset.path_of(0, gt=False), mmap_mode="r")
    if f0.dtype == np.uint8:
        return jnp.uint8, np.uint8
    if bf16:
        import ml_dtypes
        return jnp.bfloat16, ml_dtypes.bfloat16
    return jnp.float32, np.float32


def _read_shard(dataset, s, e, np_dtype, shape_x, shape_y):
    """Host-side read of frames [s, e) into two contiguous arrays."""
    n = e - s
    hx = np.zeros((n,) + shape_x, np_dtype)
    hy = np.zeros((n,) + shape_y, np_dtype)
    f0 = np.load(dataset.path_of(s, gt=False), mmap_mode="r")
    for i in range(s, e):
        fx = np.load(dataset.path_of(i, gt=False), mmap_mode="r")
        fy = np.load(dataset.path_of(i, gt=True), mmap_mode="r")
        if fx.dtype != f0.dtype:
            raise ValueError(
                f"mixed-dtype corpus at {dataset.path_of(i)}: {fx.dtype} "
                f"vs {f0.dtype}; regenerate with one --quantize mode")
        hx[i - s] = fx
        hy[i - s] = fy
    return hx, hy


def fit_streamed(state: TrainState, dataset,
                 train_options: TrainOptions = TrainOptions(),
                 epochs: Optional[int] = None,
                 shard_frames: Optional[int] = None,
                 shard_gb: float = 6.0,
                 logger=None, checkpoint_fn=None, log_every: int = 5,
                 model_options: Optional[ModelOptions] = None,
                 start_epoch: int = 0) -> TrainState:
    """fit() with a host-streamed sharded corpus; device_data's contract.

    ``shard_frames``/``shard_gb``: shard capacity (frames win if given).
    """
    topt = train_options
    epochs = epochs if epochs is not None else topt.epochs
    dev_dtype, np_dtype = _frame_dtypes(dataset, topt.bf16_compute)
    f0 = np.load(dataset.path_of(0, gt=False), mmap_mode="r")
    h, w = f0.shape[:2]
    bytes_per_frame = h * w * 13 * np.dtype(np_dtype).itemsize
    if shard_frames is None:
        shard_frames = max(int(shard_gb * 2 ** 30 / bytes_per_frame), 64)
    shards = shard_plan(dataset, shard_frames)
    cap = max(e - s for s, e in shards)
    n = len(dataset)
    print(f"[stream] {n} frames -> {len(shards)} shards "
          f"(cap {cap} frames, {cap * bytes_per_frame / 2**30:.1f} GiB)")

    starts_tbl = np.asarray([dataset.window_start(i) for i in range(n)],
                            np.int32)

    # two persistent device buffers, refilled by donation
    X = jnp.zeros((cap, h, w, 10), dev_dtype)
    Y = jnp.zeros((cap, h, w, 3), dev_dtype)

    @partial(jax.jit, donate_argnums=(0,))
    def insert(buf, piece, start):
        return jax.lax.dynamic_update_slice(
            buf, piece, (start,) + (0,) * (buf.ndim - 1))

    def upload(X, Y, hx, hy, chunk=96):
        for s in range(0, hx.shape[0], chunk):
            e = min(hx.shape[0], s + chunk)
            X = insert(X, jnp.asarray(hx[s:e]), s)
            Y = insert(Y, jnp.asarray(hy[s:e]), s)
        return X, Y

    batch = topt.batch_size
    t_frames = topt.sequence_length
    crop_h = topt.crop_size if topt.crop_size else h
    crop_w = topt.crop_size if topt.crop_size else w
    in_dtype = jnp.bfloat16 if topt.bf16_compute else jnp.float32

    @jax.jit
    def jit_step(state, X, Y, starts, cys, cxs):
        x, y = _crop_batch(X, Y, starts, cys, cxs, t_frames, crop_h, crop_w)
        if X.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
            x = jnp.concatenate([x[..., 0:3], x[..., 3:6] * 2.0 - 1.0,
                                 x[..., 6:7] * 10.0, x[..., 7:10]], axis=-1)
            x = x.astype(in_dtype)
            y = (y.astype(jnp.float32) / 255.0).astype(in_dtype)
        return train_step(state, x, y, topt, model_options=model_options)

    # background host reader: always one shard ahead
    reader_out = {}
    reader_lock = threading.Lock()

    def read_job(tag, s, e):
        hx, hy = _read_shard(dataset, s, e, np_dtype,
                             (h, w, 10), (h, w, 3))
        with reader_lock:
            reader_out[tag] = (hx, hy)

    overall_step = int(state.step)
    for epoch in range(start_epoch, epochs):
        lr = step_lr(topt.lr, epoch, topt.lr_step_epochs, topt.lr_gamma)
        state = dataclasses.replace(state, lr=jnp.asarray(lr, jnp.float32))
        t0 = time.time()
        if len(shards) == 1:
            shard_order = [0]
        else:
            shard_order = list(np.random.default_rng(epoch)
                               .permutation(len(shards)))
        total, count, epoch_base = 0.0, 0, overall_step

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

        # kick off the first shard's host read
        first = shards[shard_order[0]]
        th = threading.Thread(target=read_job,
                              args=(shard_order[0], first[0], first[1]))
        th.start()
        pending = None
        step_i = 0
        for oi, si in enumerate(shard_order):
            s, e = shards[si]
            while True:          # wait for this shard's host read
                with reader_lock:
                    if si in reader_out:
                        hx, hy = reader_out.pop(si)
                        break
                time.sleep(0.05)
            X, Y = upload(X, Y, hx, hy)
            del hx, hy
            if oi + 1 < len(shard_order):   # prefetch the next shard
                nxt = shard_order[oi + 1]
                threading.Thread(target=read_job,
                                 args=(nxt, *shards[nxt])).start()

            if len(shards) == 1:
                # degenerate to the device-resident path's global shuffle
                order = np.random.default_rng(epoch).permutation(e - s)
            else:
                order = np.random.default_rng(
                    [epoch, si]).permutation(e - s)
            for b0 in range(0, (e - s) // batch * batch, batch):
                items = order[b0:b0 + batch] + s       # global item ids
                cy = np.empty(batch, np.int32)
                cx = np.empty(batch, np.int32)
                for j, item in enumerate(items):
                    rng = np.random.default_rng([epoch, int(item)])
                    cy[j] = int(rng.integers(h // crop_h)) * crop_h
                    cx[j] = int(rng.integers(w // crop_w)) * crop_w
                rel_starts = starts_tbl[items] - s     # shard-relative
                state, metrics = jit_step(
                    state, X, Y, jnp.asarray(rel_starts),
                    jnp.asarray(cy), jnp.asarray(cx))
                if step_i % log_every == 0:
                    if pending is not None:
                        _log(*pending)
                    pending = (step_i, metrics)
                step_i += 1
        if pending is not None:
            _log(*pending)
        overall_step += step_i
        dt = time.time() - t0
        if count:
            print(f"Epoch {epoch}: avg loss {total / count:.4f} ({dt:.1f}s)")
        if checkpoint_fn is not None and \
                epoch % topt.checkpoint_every_epochs == 0:
            checkpoint_fn(state, epoch)
    if checkpoint_fn is not None:
        checkpoint_fn(state, "final")
    return state
