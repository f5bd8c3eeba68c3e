"""Spatially-sharded denoiser inference: image height over ``spatial``.

The context-parallel analogue for conv nets (SURVEY.md §2, SP row): the
frame's H axis is split across devices and every 3x3 conv exchanges 1-row
halos with its neighbors over ICI (ppermute, models/layers.py
``_halo_exchange_rows``) instead of zero-padding at shard edges, making the
sharded forward numerically identical to the single-device one.

Constraints: H/num_devices must be divisible by 32 (five local maxpools);
pooling and nearest-upsampling never cross shard edges because shard-local
heights stay even at every level.  Recurrent hidden states are per-shard —
they shard with the rows they correspond to.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.autoencoder import apply_frame, init_hidden

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def denoise_frame_spatial(params, bn_state, frame: jnp.ndarray, mesh: Mesh,
                          hidden=None, bf16: bool = False):
    """One frame, H sharded over the ``spatial`` mesh axis.

    frame: (N, H, W, 10); returns (out (N,H,W,3), new_hidden local-sharded).
    ``hidden=None`` starts a fresh sequence.
    """
    n_dev = mesh.shape["spatial"]
    n, h, w, c = frame.shape
    assert h % n_dev == 0 and (h // n_dev) % 32 == 0, (
        f"H={h} must split into {n_dev} shards divisible by 32")

    def local_apply(params_rep, state_rep, x_local, hidden_local):
        y, new_hidden, _ = apply_frame(params_rep, state_rep, x_local,
                                       hidden_local, train=False, bf16=bf16,
                                       spatial_axis="spatial")
        return y, new_hidden

    hidden_spec = jax.tree_util.tree_map(
        lambda _: P(None, "spatial"), _hidden_template(params, n, h, w),
        is_leaf=lambda x: isinstance(x, jnp.ndarray))
    smapped = _shard_map(
        local_apply, mesh=mesh,
        in_specs=(P(), P(), P(None, "spatial"), hidden_spec),
        out_specs=(P(None, "spatial"), hidden_spec),
        check_vma=False,
    )
    if hidden is None:
        hidden = _hidden_template(params, n, h, w)
    return jax.jit(smapped)(params, bn_state, frame, hidden)


def denoise_sequence_spatial(params, bn_state, frames: jnp.ndarray,
                             mesh: Mesh, bf16: bool = False):
    """(T, N, H, W, 10) -> (T, N, H, W, 3), H sharded, hidden carried."""
    outs = []
    hidden = None
    for t in range(frames.shape[0]):
        y, hidden = denoise_frame_spatial(params, bn_state, frames[t], mesh,
                                          hidden, bf16)
        outs.append(y)
    return jnp.stack(outs, axis=0)


def _hidden_template(params, n, h, w):
    from ..config import ModelOptions
    widths = tuple(params[f"enc{i}"]["conv1"]["w"].shape[-1] for i in range(1, 6))
    opts = ModelOptions(widths=widths)
    return init_hidden(n, h, w, opts)
