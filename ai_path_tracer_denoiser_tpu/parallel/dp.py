"""Data-parallel training: shard sequences over the ``data`` mesh axis.

Absent in the reference (single GPU, batch=1 — train.py:50).  Design:
each device runs the full BPTT train step on its slice of the sequence
batch; gradients and metrics are ``pmean``-ed inside the step (so is every
BatchNorm statistic via ``axis_name`` — sharded training is numerically the
same model as large-batch single-device training).  The optimizer update
then happens redundantly-but-identically on every device, keeping parameters
replicated without a broadcast.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import ModelOptions, TrainOptions
from ..train.trainer import TrainState, train_step

try:  # jax >= 0.6 exposes shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_batch(inputs, targets, mesh: Mesh):
    """Place a (T, N, H, W, C) batch with N split over the data axis."""
    from jax.sharding import NamedSharding
    sharding = NamedSharding(mesh, P(None, "data"))
    return (jax.device_put(inputs, sharding), jax.device_put(targets, sharding))


def make_dp_train_step(mesh: Mesh,
                       train_options: TrainOptions = TrainOptions(),
                       model_options: "ModelOptions" = None):
    """Jitted data-parallel train step: (state, x, y) -> (state, metrics).

    x: (T, N, H, W, 10), y: (T, N, H, W, 3) with N divisible by the data
    axis size.  State is replicated; per-shard grads are pmean'd inside
    ``train_step`` so the returned state is identical on every device.
    """

    def local_step(state: TrainState, x, y):
        new_state, metrics = train_step(state, x, y, train_options,
                                        axis_name="data",
                                        model_options=model_options)
        return new_state, metrics

    smapped = _shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(None, "data"), P(None, "data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped)
