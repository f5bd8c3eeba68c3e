"""Tile-parallel rendering: pixel rows sharded over the ``data`` mesh axis.

The TPU replacement for the reference's single-GPU SIMT grid
(pathtrace.cu:428-434): each device traces its contiguous block of pixels
through the full bounce loop; the scene/mesh/materials are replicated.  The
RNG is keyed on *global* pixel ids, so an n-device render produces the
bitwise-identical image to the single-device one — verified in
tests/test_parallel.py.

No cross-device traffic during tracing (paths never migrate); the only
collective is the implicit all-gather when the caller assembles the image,
which XLA emits from the output sharding.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderOptions
from ..render.wavefront import (RenderLoopState, assemble_gbuffer,
                                current_image, init_render_state,
                                trace_iteration)
from ..scene.structs import Scene

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def render_sharded(scene: Scene, options: RenderOptions,
                   num_iterations: int, mesh: Mesh):
    """Render with pixels sharded over ``data``; returns (image, gbuffer).

    Requires pixel count divisible by the data-axis size.
    """
    w, h = scene.camera.resolution
    n = w * h
    n_dev = mesh.shape["data"]
    assert n % n_dev == 0, f"{n} pixels not divisible by {n_dev} devices"
    tile = n // n_dev

    def local_render(scene_rep: Scene, state: RenderLoopState):
        offset = jax.lax.axis_index("data").astype(jnp.uint32) * jnp.uint32(tile)

        def body(_, st):
            return trace_iteration(scene_rep, options, st,
                                   pixel_offset=offset)

        return jax.lax.fori_loop(0, num_iterations, body, state)

    smapped = _shard_map(
        local_render, mesh=mesh,
        in_specs=(P(), _state_spec()),
        out_specs=_state_spec(),
        check_vma=False,
    )
    state = init_render_state(scene)
    # shard the per-pixel buffers, replicate geoms/iteration
    sharded_state = jax.device_put(state, _state_sharding(mesh))
    final = jax.jit(smapped)(scene, sharded_state)
    image = current_image(final, scene.camera.resolution)
    gbuffer = assemble_gbuffer(final, scene.camera.resolution, options)
    return image, gbuffer, final


def _state_spec():
    """PartitionSpec pytree for RenderLoopState: pixel planes over 'data'."""
    from ..ops.vec3 import Vec3
    vspec = Vec3(P("data"), P("data"), P("data"))
    return RenderLoopState(
        accum=vspec, gbuf=tuple(P("data") for _ in range(7)), geoms=P(),
        iteration=P(), cache_t=P("data"), cache_point=vspec,
        cache_normal=vspec, cache_mat=P("data"))


def _state_sharding(mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), _state_spec(),
        is_leaf=lambda x: isinstance(x, P))
