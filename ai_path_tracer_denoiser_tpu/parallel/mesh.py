"""Device mesh construction.

The reference is single-process single-GPU with no communication layer
(SURVEY.md §2 table); this module is the framework's scaling substrate:
a 2-axis ``jax.sharding.Mesh``:

  * ``data``    — sequences / pixel tiles (DP for training, tile-parallel
                  rendering).  Gradients ride ``psum`` over ICI.
  * ``spatial`` — image-height sharding for the denoiser with ppermute halo
                  exchange (the conv-net analogue of context/sequence
                  parallelism).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans hosts — ICI within a slice, DCN across (XLA chooses the
collective transport; nothing here changes).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh over ``data x spatial``; data defaults to all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        assert len(devices) % spatial == 0
        data = len(devices) // spatial
    assert data * spatial <= len(devices), (
        f"mesh {data}x{spatial} needs {data * spatial} devices, "
        f"have {len(devices)}")
    arr = np.array(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(arr, ("data", "spatial"))


def data_spec(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Sharding that splits array axis ``axis`` over the data mesh axis."""
    spec = [None] * (axis + 1)
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
