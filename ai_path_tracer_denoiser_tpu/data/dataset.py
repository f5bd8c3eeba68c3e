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
        xs, ys = [], []
        for i in range(start, start + self.T):
            xs.append(np.load(os.path.join(self.input_dir, self.inputs[i])))
            ys.append(np.load(os.path.join(self.gt_dir, self.outputs[i])))
        x = np.stack(xs).astype(np.float32)   # (T, H, W, 10)
        y = np.stack(ys).astype(np.float32)   # (T, H, W, 3)
        if self.crop:
            h, w = x.shape[1:3]
            cy = int(self.rng.integers(h // self.crop_size)) * self.crop_size
            cx = int(self.rng.integers(w // self.crop_size)) * self.crop_size
            x = x[:, cy:cy + self.crop_size, cx:cx + self.crop_size]
            y = y[:, cy:cy + self.crop_size, cx:cx + self.crop_size]
        return x, y


def sequence_batches(dataset: SequenceDataset, batch_size: int = 1,
                     shuffle: bool = True, seed: int = 0,
                     drop_last: bool = True) -> Iterator:
    """Batch iterator -> (inputs (T,N,H,W,10), targets (T,N,H,W,3))."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    batch_x, batch_y = [], []
    for idx in order:
        x, y = dataset[int(idx)]
        batch_x.append(x)
        batch_y.append(y)
        if len(batch_x) == batch_size:
            yield (np.stack(batch_x, axis=1), np.stack(batch_y, axis=1))
            batch_x, batch_y = [], []
    if batch_x and not drop_last:
        yield (np.stack(batch_x, axis=1), np.stack(batch_y, axis=1))
