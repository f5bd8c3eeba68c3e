"""Wavefront path tracer — one fused, jittable iteration pipeline.

TPU re-design of pathtrace() (pathtrace.cu:422-528).  The reference launches
a kernel per stage per bounce with thrust compaction in between; here a whole
1-spp iteration is a single XLA program:

  ray-gen -> [depth-0 intersect + shade + G-buffer emit] ->
  lax.while_loop over remaining bounces (masked "compaction") -> gather.

Key mapping decisions:
  * **SoA planes everywhere.** Ray state lives as ``Vec3`` planes ((N,)
    arrays, ops/vec3.py) so every stage is full-width f32 VPU elementwise
    arithmetic — no (N, 3) mis-tiling, no bf16 MXU passes on geometry
    transforms, no gathers in the hot loop (~50x a naive AoS formulation).
  * **Stream compaction** (thrust::partition, pathtrace.cu:505) becomes an
    alive *mask* plus an early loop exit once every lane is dead.  XLA needs
    static shapes, and the reference's own data shows partitioning cost more
    than it saved at 800x800 (metrics.xlsx row 3) — masking keeps lanes
    resident in VMEM with zero data movement.
  * **finalGather** (pathtrace.cu:393-402) is a scatter-add only when
    material sorting has permuted the lanes; in the default configuration
    lane i IS pixel i, so the gather is a plain vector add.
  * **Material sorting** (pathtrace.cu:508-510) is a real argsort
    permutation of the path state, carried through ``pixel_index``; off by
    default exactly as in the reference.
  * **First-bounce cache** (pathtrace.cu:466-476) caches the depth-0
    intersection of iteration 1 in the loop carry.  NOTE: under XLA's
    static shapes this is *parity-only* — every iteration still computes
    the fresh depth-0 intersection and a select picks the cached one, so
    no compute is saved (unlike the reference's skipped kernel launch);
    it exists so cached renders produce the reference's exact images.
  * The bounce loop is ``lax.while_loop`` for speed or ``lax.scan`` when a
    differentiable path is requested (reverse-mode AD can't cross
    while_loop).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import RenderOptions
from ..ops.bsdf import scatter_ray_v
from ..ops.intersect import (intersect_scene_v, octant_cell_key,
                             ray_aabb_intersect_v, resolve_mesh_impl)
from ..ops.rng import draw_uniforms
from ..ops.vec3 import Vec3, where as vwhere
from ..scene.structs import Camera, Geoms, Scene
from .motion_blur import advance_geoms


@dataclasses.dataclass
class RenderLoopState:
    """Device-resident state carried across 1-spp iterations.

    Mirrors the buffers pathtraceInit allocates (pathtrace.cu:96-129):
    ``accum`` = dev_image, ``gbuf`` = the static channels of dev_tensor
    (normal/depth/albedo; RGB is derived from accum at assembly time),
    ``cache_*`` = dev_intersections_cache, ``geoms`` the (possibly
    motion-advanced) geometry.

    Every per-pixel buffer is stored **planar** — ``Vec3`` of (N,) planes or
    a tuple of (N,) channel planes — never (N, 3)/(7, N) arrays.  A trailing
    dim of 3 wastes 125/128 lanes of every f32 tile and a leading dim of 7
    pads sublanes 7->8; keeping independent (N,) planes makes every state
    update a full-width fused elementwise op (measured ~2x whole-frame win).
    """

    accum: Vec3               # running radiance sum, 3 (N,) planes
    gbuf: Tuple[jnp.ndarray, ...]  # 7 (N,) planes: nx, ny, nz, depth, ax, ay, az
    geoms: Geoms
    iteration: jnp.ndarray    # () int32 — completed iterations
    rng_offset: jnp.ndarray   # () int32 — added to iteration for RNG seeding
                              # ONLY (datagen noise/mov variants); the
                              # accumulation average and the iteration-1
                              # G-buffer gate always use the true iteration
    cache_t: jnp.ndarray      # (N,)
    cache_point: Vec3         # 3 (N,) planes
    cache_normal: Vec3        # 3 (N,) planes
    cache_mat: jnp.ndarray    # (N,) int32


jax.tree_util.register_dataclass(
    RenderLoopState,
    ["accum", "gbuf", "geoms", "iteration", "rng_offset",
     "cache_t", "cache_point", "cache_normal", "cache_mat"], [])


def init_render_state(scene: Scene,
                      options: Optional[RenderOptions] = None) -> RenderLoopState:
    w, h = scene.camera.resolution
    n = w * h
    zero = jnp.zeros((n,), jnp.float32)
    acc_dtype = jnp.dtype(options.accum_dtype) if options is not None \
        else jnp.float32
    azero = jnp.zeros((n,), acc_dtype)
    return RenderLoopState(
        accum=Vec3(azero, azero, azero),
        gbuf=tuple(zero for _ in range(7)),
        geoms=scene.geoms,
        iteration=jnp.zeros((), jnp.int32),
        rng_offset=jnp.zeros((), jnp.int32),
        cache_t=zero,
        cache_point=Vec3(zero, zero, zero),
        cache_normal=Vec3(zero, zero, zero),
        cache_mat=jnp.zeros((n,), jnp.int32),
    )


def generate_camera_rays_v(camera: Camera, iteration, options: RenderOptions,
                           pixel_ids: Optional[jnp.ndarray] = None
                           ) -> Tuple[Vec3, Vec3]:
    """Per-pixel primary rays with optional AA jitter (SoA).

    Port of generateRayFromCamera (pathtrace.cu:155-182).  The reference
    seeds the jitter RNG with the *previous* iteration's leftover
    remainingBounces (pathtrace.cu:162).  That leftover is always 0 from
    iteration 2 on: termination writes 0 (pathtrace.cu:359, 377) and
    survivors decrement from traceDepth exactly traceDepth times
    (pathtrace.cu:369) — so depth=0 seeding here is *exact* parity.  At
    iteration 1 the reference reads a cudaMalloc'd buffer that is never
    memset (pathtrace.cu:104) — undefined memory, zero in practice on
    recycled allocations — so depth=0 is the documented stand-in there
    (pinned by tests/test_weak_fixes.py::test_raygen_seed_semantics...).
    """
    w, h = camera.resolution
    if pixel_ids is None:
        pixel_ids = jnp.arange(w * h, dtype=jnp.uint32)
    idx = pixel_ids.astype(jnp.uint32)
    n = idx.shape[0]
    x = (idx % jnp.uint32(w)).astype(jnp.float32)
    y = (idx // jnp.uint32(w)).astype(jnp.float32)

    if options.antialias:
        u = draw_uniforms(iteration, idx, 0, 2, options.rng)
        jx = u[0] - 0.5
        jy = u[1] - 0.5
    else:
        jx = jy = jnp.zeros((n,), jnp.float32)

    px = camera.pixel_length[0] * (x - w * 0.5 + jx)
    py = camera.pixel_length[1] * (y - h * 0.5 + jy)
    view = Vec3(camera.view[0], camera.view[1], camera.view[2])
    right = Vec3(camera.right[0], camera.right[1], camera.right[2])
    up = Vec3(camera.up[0], camera.up[1], camera.up[2])
    direction = Vec3(view.x - right.x * px - up.x * py,
                     view.y - right.y * px - up.y * py,
                     view.z - right.z * px - up.z * py).normalized()
    ones = jnp.ones((n,), jnp.float32)
    origin = Vec3(ones * camera.position[0], ones * camera.position[1],
                  ones * camera.position[2])
    return origin, direction


def generate_camera_rays(camera: Camera, iteration, options: RenderOptions,
                         pixel_ids: Optional[jnp.ndarray] = None):
    """AoS wrapper over :func:`generate_camera_rays_v` ((N, 3) outputs)."""
    o, d = generate_camera_rays_v(camera, iteration, options, pixel_ids)
    return o.stack(), d.stack()


def _gather_material(scene: Scene, mat_id: jnp.ndarray):
    """Gather per-ray material planes; mat_id==-1 gathers row 0 harmlessly.

    The material table is tiny (M rows) so these are M-entry lookups per
    plane — the one gather family left in the hot loop.
    """
    safe = jnp.maximum(mat_id, 0)
    m = scene.materials
    return dict(
        color=Vec3(m.color[:, 0][safe], m.color[:, 1][safe], m.color[:, 2][safe]),
        specular_color=Vec3(m.specular_color[:, 0][safe],
                            m.specular_color[:, 1][safe],
                            m.specular_color[:, 2][safe]),
        has_reflective=m.has_reflective[safe],
        has_refractive=m.has_refractive[safe],
        index_of_refraction=m.index_of_refraction[safe],
        emittance=m.emittance[safe],
    )


def _shade(scene: Scene, options: RenderOptions, iteration, isect,
           ray_d: Vec3, color: Vec3, remaining, pixel_offset=0,
           pixel_index=None):
    """Branch-free shadeMaterial (pathtrace.cu:333-390), SoA.

    Returns (new_ray_o, new_ray_d, new_color, new_remaining).  ``pixel_offset``
    globalizes the RNG path index under tile sharding so a sharded render
    draws the identical noise stream as a single-device one.

    ``pixel_index``: per-lane pixel ids when a carry sort has permuted the
    lanes.  RNG is keyed on the PIXEL, not the lane position, so every
    permutation mode (octant carry sort, material sort) draws the exact
    noise stream of the unsorted render — permutation-invariance the
    reference does not have (its engine reseeds on the post-sort thread
    index, pathtrace.cu:52-56, so sorting changes its images).
    """
    n = ray_d.x.shape[0]
    if pixel_index is None:
        idx = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(pixel_offset)
    else:
        idx = pixel_index.astype(jnp.uint32) + jnp.uint32(pixel_offset)
    u = draw_uniforms(iteration, idx, remaining, 2, options.rng)

    alive = remaining != 0
    hit = isect["t"] > 0.0
    mat = _gather_material(scene, isect["material_id"])
    emissive = mat["emittance"] > 0.0

    sc_dir, sc_origin, sc_mult = scatter_ray_v(
        ray_d, isect["point"], isect["normal"], mat, u[0], u[1],
        fresnels=options.fresnels, dielectric=options.dielectric,
        mesh_normal_view=options.mesh_normal_view)

    # light hit: color *= emittance * matColor, terminate (pathtrace.cu:358-361)
    emit_color = color * mat["color"] * mat["emittance"]
    scatter_color = color * sc_mult

    upd = alive & hit
    new_color = vwhere(upd & emissive, emit_color,
                       vwhere(upd, scatter_color, color))
    # miss: black + terminate (pathtrace.cu:375-377)
    new_color = vwhere(alive & ~hit, Vec3.full_like(new_color.x, 0.0), new_color)

    new_remaining = jnp.where(alive & hit & ~emissive, remaining - 1,
                              jnp.where(alive, 0, remaining))
    scatter_lanes = upd & ~emissive
    new_ray_d = vwhere(scatter_lanes, sc_dir, ray_d)
    new_ray_o = vwhere(scatter_lanes, sc_origin, Vec3.full_like(sc_origin.x, 0.0))
    return new_ray_o, new_ray_d, new_color, new_remaining


def _maybe_sort_by_material(options, isect_mat, alive, carry):
    """Material-coherence sort (pathtrace.cu:508-510): stable argsort keyed
    by material id, dead lanes pushed to the back.  Off by default; permutes
    every plane of the carry when enabled."""
    if not options.sort_material:
        return carry
    key = jnp.where(alive, isect_mat, jnp.int32(2 ** 30))
    perm = jnp.argsort(key, stable=True)
    return jax.tree_util.tree_map(lambda a: a[perm], carry)


def trace_iteration(scene: Scene, options: RenderOptions,
                    state: RenderLoopState,
                    differentiable: bool = False,
                    pixel_offset=0) -> RenderLoopState:
    """One full 1-spp path-trace iteration (pathtrace.cu:422-528).

    ``pixel_offset``: first global pixel id of this state's tile — 0 for a
    whole-frame state; ``axis_index * tile_size`` under tile sharding.
    """
    w, h = scene.camera.resolution
    n = state.accum.x.shape[0]
    depth_max = scene.trace_depth
    iteration = state.iteration + 1
    # RNG streams draw from iteration + rng_offset (noise/mov variant
    # axes); everything else — accumulation, motion blur cadence, the
    # iteration-1 G-buffer gate — uses the true iteration.
    rng_iter = iteration + state.rng_offset

    geoms = state.geoms
    if options.motion_blur:
        # moveGeom every 4th iteration while iter < 3000 (pathtrace.cu:441).
        do_move = (iteration % 4 == 0) & (iteration < 3000)
        geoms = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                do_move.reshape((1,) * new.ndim), new, old),
            advance_geoms(geoms), geoms)

    pixel_ids = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(pixel_offset)
    ray_o, ray_d = generate_camera_rays_v(scene.camera, rng_iter, options,
                                          pixel_ids)
    color = Vec3.full_like(ray_d.x, 1.0)
    remaining = jnp.full((n,), depth_max, jnp.int32)
    pixel_index = jnp.arange(n, dtype=jnp.int32)   # local gather index

    # BVH kernel routing: the Pallas kernel has no VJP, so differentiable
    # renders keep the dense (transparently differentiable) scan.
    use_bvh = options.mesh_bvh and not differentiable

    # ---- depth 0 (peeled: G-buffer emission + first-bounce cache) ----
    if options.cache_first_bounce:
        # Parity-only (see module docstring): the fresh intersection is
        # still computed every iteration; the select reproduces the
        # reference's cached *values*, not its skipped work.
        fresh = intersect_scene_v(geoms, scene.mesh, ray_o, ray_d,
                                  ray_culling=options.ray_culling,
                                  use_bvh=use_bvh,
                                  kernel_impl=options.mesh_kernel_impl)
        use_cache = iteration > 1
        isect0 = dict(
            t=jnp.where(use_cache, state.cache_t, fresh["t"]),
            point=vwhere(use_cache, state.cache_point, fresh["point"]),
            normal=vwhere(use_cache, state.cache_normal, fresh["normal"]),
            material_id=jnp.where(use_cache, state.cache_mat, fresh["material_id"]),
            is_inside=fresh["is_inside"],
        )
        cache = (isect0["t"], isect0["point"], isect0["normal"],
                 isect0["material_id"])
    else:
        isect0 = intersect_scene_v(geoms, scene.mesh, ray_o, ray_d,
                                   ray_culling=options.ray_culling,
                                   use_bvh=use_bvh,
                                   kernel_impl=options.mesh_kernel_impl)
        cache = (state.cache_t, state.cache_point, state.cache_normal, state.cache_mat)

    # G-buffer: normals + depth at depth 0, iteration 1 (pathtrace.cu:295-304).
    gbuf = state.gbuf
    if options.denoise:
        write = (iteration == 1) & (isect0["t"] >= 0.0)
        nrm = isect0["normal"]
        gbuf = (jnp.where(write, nrm.x, gbuf[0]),
                jnp.where(write, nrm.y, gbuf[1]),
                jnp.where(write, nrm.z, gbuf[2]),
                jnp.where(write, isect0["t"], gbuf[3])) + gbuf[4:]

    ray_o, ray_d, color, remaining = _shade(
        scene, options, rng_iter, isect0, ray_d, color, remaining,
        pixel_offset)

    # G-buffer: albedo = throughput after the first shade (pathtrace.cu:379-387).
    if options.denoise:
        gbuf = gbuf[:4] + (jnp.where(write, color.x, gbuf[4]),
                           jnp.where(write, color.y, gbuf[5]),
                           jnp.where(write, color.z, gbuf[6]))

    carry = _maybe_sort_by_material(options, isect0["material_id"],
                                    remaining > 0,
                                    (ray_o, ray_d, color, remaining, pixel_index))

    # ---- remaining bounces ----
    # Carry-level coherence sort: ONE multi-operand lax.sort moves the
    # whole path state (11 planes) for the cost of the bare argsort
    # (~2.3 ms at 640k — measured r5), where the old inside-intersect sort
    # paid argsort + 14 separate permute-gathers + an inverse argsort
    # (~55 ms/bounce).  Rays then stay in sorted order through shading;
    # pixel identity rides in ``pixel_index`` and the final gather
    # scatter-adds by it once per iteration.
    # (the binned kernel packs rays itself — bin-major pair sort — so the
    # outer coherence permutation would be pure overhead there)
    carry_sort = (options.mesh_octant_sort and use_bvh
                  and scene.mesh.num_faces > 0 and scene.mesh.bvh is not None
                  and resolve_mesh_impl(scene.mesh,
                                        options.mesh_kernel_impl)
                  != "binned")

    def _octant_carry_sort(carry):
        ray_o, ray_d, color, remaining, pixel_index = carry
        dead = remaining == 0
        if options.ray_culling:
            dead = dead | ~ray_aabb_intersect_v(
                ray_o, ray_d, scene.mesh.aabb_lb, scene.mesh.aabb_ub)
        key = octant_cell_key(ray_o, ray_d, dead, options.mesh_sort_cells)
        ops = jax.lax.sort(
            (key, ray_o.x, ray_o.y, ray_o.z, ray_d.x, ray_d.y, ray_d.z,
             color.x, color.y, color.z, remaining, pixel_index),
            num_keys=1)
        return (Vec3(ops[1], ops[2], ops[3]), Vec3(ops[4], ops[5], ops[6]),
                Vec3(ops[7], ops[8], ops[9]), ops[10], ops[11])

    def bounce(carry, _=None):
        # Octant coherence sorting applies to SECONDARY rays only —
        # primaries are already pixel-coherent and would pay the sort
        # for nothing.
        if carry_sort:
            carry = _octant_carry_sort(carry)
        ray_o, ray_d, color, remaining, pixel_index = carry
        isect = intersect_scene_v(geoms, scene.mesh, ray_o, ray_d,
                                  ray_culling=options.ray_culling,
                                  use_bvh=use_bvh, active=remaining != 0,
                                  octant_sort=False,
                                  kernel_lanes=options.mesh_kernel_lanes,
                                  kernel_impl=options.mesh_kernel_impl)
        ray_o, ray_d, color, remaining = _shade(
            scene, options, rng_iter, isect, ray_d, color, remaining,
            pixel_offset, pixel_index=pixel_index)
        carry = _maybe_sort_by_material(
            options, isect["material_id"], remaining > 0,
            (ray_o, ray_d, color, remaining, pixel_index))
        return carry, None

    if depth_max > 1:
        if differentiable:
            carry, _ = jax.lax.scan(bounce, carry, None, length=depth_max - 1)
        else:
            def cond(dc):
                d, c = dc
                any_alive = jnp.any(c[3] > 0)
                early = any_alive if options.stream_compaction else True
                return (d < depth_max - 1) & early

            def body(dc):
                d, c = dc
                c, _ = bounce(c)
                return d + 1, c

            _, carry = jax.lax.while_loop(cond, body, (jnp.int32(0), carry))
    _, _, color, _, pixel_index = carry

    # finalGather (pathtrace.cu:393-402).  Without any carry sort lane i is
    # pixel i — a plain add.  With sorting, scatter-add by the permuted index
    # (each pixel receives exactly one path per iteration, so the scatter is
    # unique-index and order-independent — bitwise equal to the plain add).
    color_acc = color.astype(state.accum.x.dtype)   # accum_dtype knob
    if options.sort_material or (carry_sort and depth_max > 1):
        accum = Vec3(state.accum.x.at[pixel_index].add(color_acc.x),
                     state.accum.y.at[pixel_index].add(color_acc.y),
                     state.accum.z.at[pixel_index].add(color_acc.z))
    else:
        accum = state.accum + color_acc

    return RenderLoopState(
        accum=accum, gbuf=gbuf, geoms=geoms, iteration=iteration,
        rng_offset=state.rng_offset,
        cache_t=cache[0], cache_point=cache[1], cache_normal=cache[2],
        cache_mat=cache[3])


def assemble_gbuffer(state: RenderLoopState, resolution: Tuple[int, int],
                     options: RenderOptions) -> jnp.ndarray:
    """Build the 10-channel CHW tensor (dev_tensor layout, pathtrace.cu:81-94).

    ch0-2 RGB = accum / iteration, ch3-5 normal, ch6 depth, ch7-9 albedo.
    ``flip_horizontal=True`` reproduces the reference's mirrored layout
    (pathtrace.cu:86, 299).
    """
    w, h = resolution
    it = jnp.maximum(state.iteration.astype(jnp.float32), 1.0)
    rgb = state.accum / it
    tensor = jnp.stack([rgb.x, rgb.y, rgb.z, *state.gbuf]).reshape(10, h, w)
    if options.flip_horizontal:
        tensor = tensor[:, :, ::-1]
    return tensor


def current_image(state: RenderLoopState, resolution: Tuple[int, int]) -> jnp.ndarray:
    """(H, W, 3) average radiance so far (sendImageToPBO sans 8-bit quantize)."""
    w, h = resolution
    it = jnp.maximum(state.iteration.astype(jnp.float32), 1.0)
    rgb = state.accum / it
    return rgb.stack().reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Top-level drivers
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("options", "differentiable"))
def _render_jit(scene: Scene, state: RenderLoopState, options: RenderOptions,
                num_iterations: jnp.ndarray, differentiable: bool = False):
    def body(_, st):
        return trace_iteration(scene, options, st, differentiable)
    # dynamic trip count: one compilation serves any spp budget
    return jax.lax.fori_loop(0, num_iterations, body, state)


def _resolve_backend(scene: Scene, options: RenderOptions,
                     differentiable: bool) -> str:
    from .pallas_backend import pallas_eligible
    if options.backend == "xla":
        return "xla"
    eligible = pallas_eligible(scene, options, differentiable)
    if options.backend == "pallas":
        if not eligible:
            raise ValueError("backend='pallas' but scene/options ineligible "
                             "(mesh, sort_material, cache_first_bounce, "
                             "motion_blur, or differentiable render)")
        return "pallas"
    # auto: the megakernel wins on TPU only — Mosaic doesn't lower on
    # GPU/CPU, and interpret mode is strictly slower than the XLA path.
    on_tpu = jax.default_backend() == "tpu"
    return "pallas" if (eligible and on_tpu) else "xla"


def render(scene: Scene, options: RenderOptions = RenderOptions(),
           num_iterations: Optional[int] = None,
           state: Optional[RenderLoopState] = None,
           differentiable: bool = False):
    """Render ``num_iterations`` spp (defaults to the scene's ITERATIONS).

    Returns (image (H,W,3), gbuffer (10,H,W), final state).  Iterations run
    on-device in chunks of ``options.iters_per_dispatch`` compiled-program
    dispatches — the XLA wavefront driver or, when eligible on TPU, the
    Pallas megakernel (pallas_backend.py).
    """
    if num_iterations is None:
        num_iterations = scene.iterations
    if state is None:
        state = init_render_state(scene, options)
    backend = _resolve_backend(scene, options, differentiable)
    # Cap iterations per device dispatch: a single XLA program running for
    # minutes (huge meshes x thousands of spp) can trip device watchdogs.
    # Dispatch overhead is ~0.3 ms, negligible against any real chunk.
    per_dispatch = options.iters_per_dispatch
    if per_dispatch is None:
        # BVH-accelerated meshes render at near-analytic speed; only huge
        # meshes on the brute scan need short dispatches (device watchdog).
        slow_mesh = scene.mesh.num_faces > 512 and not (
            options.mesh_bvh and scene.mesh.bvh is not None
            and not differentiable)
        per_dispatch = 4 if slow_mesh else 64
    remaining = int(num_iterations)
    while remaining > 0:
        k = min(per_dispatch, remaining)
        if backend == "pallas":
            from .pallas_backend import render_pallas
            # config.py's contract: 'pallas' is interpreted anywhere Mosaic
            # can't lower (CPU *and* GPU) — only real TPUs compile it.
            state = render_pallas(scene, options, k, state,
                                  interpret=jax.default_backend() != "tpu")
        else:
            state = _render_jit(scene, state, options, jnp.int32(k),
                                differentiable)
        remaining -= k
    image = current_image(state, scene.camera.resolution)
    gbuffer = assemble_gbuffer(state, scene.camera.resolution, options)
    return image, gbuffer, state


def render_gbuffer_frame(scene: Scene, options: RenderOptions = RenderOptions(),
                         state: Optional[RenderLoopState] = None):
    """One 1-spp frame + fresh G-buffer — the denoiser's input producer.

    Equivalent to the interactive loop's camchanged path (main.cpp:122-165):
    every frame restarts accumulation at iteration 0, so the G-buffer's
    normal/depth/albedo channels are refreshed each frame.
    """
    state = init_render_state(scene, options)
    return render(scene, options, num_iterations=1, state=state)
