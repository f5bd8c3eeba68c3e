"""Training dataset: 7-frame temporal windows of npy G-buffer/GT pairs.

Equivalent of dataloader.py:17-65.  Filenames follow the reference scheme
``{scene}_{mov}_{noise}_{frame}.npy``; ``find_max`` builds the per-(scene,
mov, noise) max-frame table used to clamp windows at sequence ends
(dataloader.py:48-49).  Crops are crop_size-aligned random 256x256 squares
(dataloader.py:53-57).  Batches come out time-major (T, N, H, W, C) — the
layout ``apply_sequence`` scans over.
"""
from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np


def find_max(directory: str, num_scenes: int, num_mov: int, num_noise: int
             ) -> np.ndarray:
    """Max frame index per (scene, mov, noise) (dataloader.py:17-23)."""
    files = sorted(os.listdir(directory))
    m = np.zeros((num_scenes + 1, num_mov + 1, num_noise + 1))
    for name in files:
        parts = name.split("_")
        s, mv, nz = int(parts[0]), int(parts[1]), int(parts[2])
        frame = int(parts[3].split(".")[0])
        m[s, mv, nz] = max(m[s, mv, nz], frame)
    return m


class SequenceDataset:
    """Yields {image: (T,H,W,10), output: (T,H,W,3)} numpy windows."""

    def __init__(self, input_dir: str, gt_dir: str, m: Optional[np.ndarray] = None,
                 sequence_length: int = 7, crop: bool = False,
                 crop_size: int = 256, seed: int = 0):
        self.input_dir = input_dir
        self.gt_dir = gt_dir
        self.inputs = sorted(os.listdir(input_dir))
        self.outputs = sorted(os.listdir(gt_dir))
        assert len(self.inputs) == len(self.outputs), "input/gt count mismatch"
        self.m = m     # kept for reference-API parity; superseded below
        self.T = sequence_length
        self.crop = crop
        self.crop_size = crop_size
        self.rng = np.random.default_rng(seed)
        import threading
        self._lock = threading.Lock()
        # Per-(scene, mov, noise) max frame, built from the filenames.  The
        # reference clamps windows with `start = m[...] - 6` (dataloader.py
        # :48-49) — a *frame number* used as a global file *position*, which
        # is only correct for a single-scene dataset; with many scenes its
        # windows silently straddle scene boundaries.  We keep its clamp
        # semantics but do the arithmetic in positions within the group.
        self._group_max = {}
        for fname in self.inputs:
            parts = fname.split("_")
            key = (int(parts[0]), int(parts[1]), int(parts[2]))
            frame = int(parts[3].split(".")[0])
            self._group_max[key] = max(self._group_max.get(key, -1), frame)

    def __len__(self):
        return len(self.inputs)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        name = self.inputs[index]
        parts = name.split("_")
        key = (int(parts[0]), int(parts[1]), int(parts[2]))
        frame = int(parts[3].split(".")[0])
        last = self._group_max[key]
        # clamp the window at the end of this (scene, mov, noise) sequence
        start_frame = min(frame, max(0, last - (self.T - 1)))
        start = index - (frame - start_frame)
        # Crop offsets are drawn BEFORE loading and the files are memory-
        # mapped, so only the cropped window is ever read/copied — a full
        # 512^2 10-channel frame is 10.5 MB but a 256^2 crop is 2.6 MB, and
        # the training loader was host-IO bound without this.
        sl = (slice(None), slice(None))
        if self.crop:
            probe = np.load(os.path.join(self.input_dir, self.inputs[start]),
                            mmap_mode="r")
            h, w = probe.shape[:2]
            with self._lock:     # Generator is not thread-safe (prefetch pool)
                cy = int(self.rng.integers(h // self.crop_size)) * self.crop_size
                cx = int(self.rng.integers(w // self.crop_size)) * self.crop_size
            sl = (slice(cy, cy + self.crop_size), slice(cx, cx + self.crop_size))
        xs, ys = [], []
        for i in range(start, start + self.T):
            mx = np.load(os.path.join(self.input_dir, self.inputs[i]),
                         mmap_mode="r")
            my = np.load(os.path.join(self.gt_dir, self.outputs[i]),
                         mmap_mode="r")
            xs.append(np.asarray(mx[sl], np.float32))
            ys.append(np.asarray(my[sl], np.float32))
        x = np.stack(xs)                      # (T, H, W, 10)
        y = np.stack(ys)                      # (T, H, W, 3)
        return x, y


def sequence_batches(dataset: SequenceDataset, batch_size: int = 1,
                     shuffle: bool = True, seed: int = 0,
                     drop_last: bool = True, prefetch: int = 2,
                     workers: int = 4) -> Iterator:
    """Batch iterator -> (inputs (T,N,H,W,10), targets (T,N,H,W,3)).

    Batches are assembled by a small thread pool and ``prefetch`` batches
    are kept in flight, overlapping host npy loads with device compute
    (np.load/memcpy release the GIL).  ``workers=0`` loads synchronously.
    """
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    n_batches = len(order) // batch_size if drop_last else \
        -(-len(order) // batch_size)
    chunks = [order[i * batch_size:(i + 1) * batch_size]
              for i in range(n_batches)]

    def assemble(idxs):
        pairs = [dataset[int(i)] for i in idxs]
        return (np.stack([p[0] for p in pairs], axis=1),
                np.stack([p[1] for p in pairs], axis=1))

    if workers <= 0:
        for idxs in chunks:
            yield assemble(idxs)
        return

    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=workers) as pool:
        pending = []
        it = iter(chunks)
        for idxs in it:
            pending.append(pool.submit(assemble, idxs))
            if len(pending) > prefetch:
                break
        while pending:
            fut = pending.pop(0)
            nxt = next(it, None)
            if nxt is not None:
                pending.append(pool.submit(assemble, nxt))
            yield fut.result()
