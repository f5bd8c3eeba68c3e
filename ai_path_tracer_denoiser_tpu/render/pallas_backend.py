"""Whole-render Pallas TPU megakernel.

The XLA wavefront path (render/wavefront.py) runs each pipeline stage as
fused VPU ops but still round-trips the ~16-plane ray state through HBM at
every fusion boundary and loop carry.  This backend fuses the ENTIRE render
— every spp iteration, every bounce, ray-gen through final gather — into one
``pallas_call``: a tile of pixels is pinned in VMEM and traced start-to-
finish, so HBM traffic is exactly one read + one write of the accumulator
and G-buffer tiles per *render call*, not per bounce.

Mapping of the reference pipeline (pathtrace.cu:422-528):
  * grid = pixel tiles of (TILE_ROWS, 128) lanes — the SIMT "1 thread per
    path" grid (pathtrace.cu:428-434) becomes one VPU-wide tile per program;
  * the iteration loop (runCuda calling pathtrace per frame, main.cpp:154)
    is an in-kernel ``fori_loop`` whose trip count is a runtime SMEM scalar;
  * the bounce loop (pathtrace.cu:460-513) is unrolled ``trace_depth`` times
    with alive-masking as the compaction equivalent (see wavefront.py);
  * G-buffer normal/depth/albedo emission at depth 0 of iteration 1
    (pathtrace.cu:295-304, 379-387) writes the carried G-buffer planes.

Scene geometry and the material table are **baked into the kernel as
constants** (they are static per scene; XLA folds them into vector
immediates), while the camera basis and iteration window arrive as SMEM
scalars — so interactive camera orbits (main.cpp:122-140) re-use one
compiled kernel.  The intersection/BSDF/RNG math is the *same code* as the
XLA path (ops/intersect.py, ops/bsdf.py, ops/rng.py): those functions are
shape-agnostic SoA elementwise math, equally valid on (N,) arrays under jit
and (TILE_ROWS, 128) blocks inside a kernel, and the RNG is division-free
(ops/rng.py lcg_next) so it lowers in Mosaic.

Eligibility (render() falls back to the XLA path otherwise): meshes up to
MESH_BAKE_MAX_FACES triangles (baked like the geoms; bigger meshes need the
XLA path's chunked scan), no material sort / first-bounce cache / motion
blur, non-differentiable, < 2^23 pixels (pixel ids must be exact in f32
modulo the integer fix-up).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderOptions
from ..ops.bsdf import scatter_ray_v
from ..ops.intersect import box_intersect_v, sphere_intersect_v
from ..ops.rng import draw_uniforms
from ..ops.vec3 import Vec3, where as vwhere
from ..scene.structs import CUBE, Scene
from .wavefront import RenderLoopState, init_render_state

# (TILE_ROWS, 128) f32 lanes per grid program.  64 rows = 8K rays/tile keeps
# the unrolled bounce loop's live planes well under the 16 MB VMEM budget
# (256 rows overflows it) and measured slightly faster than 128.
TILE_ROWS = 64
_LANES = 128


# Meshes up to this many faces are baked into the kernel as an unrolled
# per-face running min (the reference's mesh scenes are 12-60 triangles);
# larger meshes fall back to the XLA path's chunked scan.
MESH_BAKE_MAX_FACES = 64


def pallas_eligible(scene: Scene, options: RenderOptions,
                    differentiable: bool = False) -> bool:
    w, h = scene.camera.resolution
    # 2^23 pixel cap: the kernel's pid -> (x, y) split needs pid_f exact
    # (pid < 2^24) with headroom for tile padding.
    return (not differentiable
            and scene.mesh.num_faces <= MESH_BAKE_MAX_FACES
            and not options.sort_material
            and not options.cache_first_bounce
            and not options.motion_blur
            and options.accum_dtype == "float32"   # kernel carries f32 tiles
            and w * h < 2 ** 23)


class _Mat4Ref:
    """Adapter presenting 16 consecutive SMEM scalars as ``m[i, j]``.

    xform_point/xform_dir (ops/vec3.py) consume matrices through plain
    ``m[i, j]`` indexing, so the same intersection code runs on numpy
    constants (baked mode) and on SMEM scalar reads (operand mode) — the
    only difference is whether the coefficients are vector immediates or
    runtime sregs.
    """

    __slots__ = ("ref", "base")

    def __init__(self, ref, base: int):
        self.ref = ref
        self.base = base

    def __getitem__(self, ij):
        i, j = ij
        return self.ref[0, self.base + 4 * i + j]


# f32 scalars per geom in the operand row: 3 packed mat4s.
_GEOM_ROW = 48
# f32 scalars per material in the operand row (same field order as
# _gather_material_baked): color, specular_color, has_reflective,
# has_refractive, index_of_refraction, emittance.
_MAT_ROW = 10


def _intersect_geoms_operand(geo_ref, gid_ref, types, o: Vec3, d: Vec3):
    """_intersect_geoms_baked with runtime geometry from SMEM.

    The geom *layout* (count and type sequence) stays static — the loop
    unrolls per geom and specializes box vs sphere exactly like the baked
    kernel — but transforms and material ids are SMEM scalars, so every
    scene sharing the layout reuses one compiled kernel (scene streaming:
    datagen over randomizer variants, interactive material/transform
    edits).  Semantics identical to computeIntersections
    (pathtrace.cu:230-254): running min, first-geom-wins ties.
    """
    t_best = jnp.full_like(o.x, jnp.inf)
    p_best = Vec3.full_like(o.x, 0.0)
    n_best = Vec3.full_like(o.x, 0.0)
    mat_best = jnp.full(o.x.shape, -1, jnp.int32)
    for g, ty in enumerate(types):
        base = g * _GEOM_ROW
        tr = _Mat4Ref(geo_ref, base)
        inv = _Mat4Ref(geo_ref, base + 16)
        if ty == CUBE:
            t, p, n, _ = box_intersect_v(tr, inv, o, d)
        else:
            invt = _Mat4Ref(geo_ref, base + 32)
            t, p, n, _ = sphere_intersect_v(tr, inv, invt, o, d)
        t = jnp.where(t > 0.0, t, jnp.inf)
        better = t < t_best
        t_best = jnp.where(better, t, t_best)
        p_best = vwhere(better, p, p_best)
        n_best = vwhere(better, n, n_best)
        mat_best = jnp.where(better, gid_ref[0, g], mat_best)
    return t_best, p_best, n_best, mat_best


def _gather_material_operand(mat_ref, n_mats, mat_id):
    """_gather_material_baked with the material table in SMEM scalars."""
    def mat_planes(m):
        b = m * _MAT_ROW
        return dict(
            color=(mat_ref[0, b + 0], mat_ref[0, b + 1], mat_ref[0, b + 2]),
            specular_color=(mat_ref[0, b + 3], mat_ref[0, b + 4],
                            mat_ref[0, b + 5]),
            has_reflective=mat_ref[0, b + 6],
            has_refractive=mat_ref[0, b + 7],
            index_of_refraction=mat_ref[0, b + 8],
            emittance=mat_ref[0, b + 9],
        )

    like = mat_id
    acc = mat_planes(0)
    ones = jnp.ones(like.shape, jnp.float32)
    out = dict(
        color=Vec3(ones * acc["color"][0], ones * acc["color"][1],
                   ones * acc["color"][2]),
        specular_color=Vec3(ones * acc["specular_color"][0],
                            ones * acc["specular_color"][1],
                            ones * acc["specular_color"][2]),
        has_reflective=ones * acc["has_reflective"],
        has_refractive=ones * acc["has_refractive"],
        index_of_refraction=ones * acc["index_of_refraction"],
        emittance=ones * acc["emittance"],
    )
    for m in range(1, n_mats):
        pm = mat_planes(m)
        sel = mat_id == m
        out["color"] = vwhere(sel, Vec3(*pm["color"]), out["color"])
        out["specular_color"] = vwhere(sel, Vec3(*pm["specular_color"]),
                                       out["specular_color"])
        for key in ("has_reflective", "has_refractive",
                    "index_of_refraction", "emittance"):
            out[key] = jnp.where(sel, pm[key], out[key])
    return out


def _intersect_geoms_baked(transforms, inverses, inv_transposes, types,
                           material_ids, o: Vec3, d: Vec3):
    """intersect_geoms_v (ops/intersect.py) with numpy-constant matrices.

    The per-geom 4x4s are host numpy arrays, so every coefficient in
    xform_point/xform_dir folds to a vector immediate.  Same running-min /
    first-geom-wins-ties semantics as computeIntersections
    (pathtrace.cu:230-254).
    """
    t_best = jnp.full_like(o.x, jnp.inf)
    p_best = Vec3.full_like(o.x, 0.0)
    n_best = Vec3.full_like(o.x, 0.0)
    mat_best = jnp.full(o.x.shape, -1, jnp.int32)
    for g in range(len(types)):
        if types[g] == CUBE:
            t, p, n, _ = box_intersect_v(transforms[g], inverses[g], o, d)
        else:
            t, p, n, _ = sphere_intersect_v(transforms[g], inverses[g],
                                            inv_transposes[g], o, d)
        t = jnp.where(t > 0.0, t, jnp.inf)
        better = t < t_best
        t_best = jnp.where(better, t, t_best)
        p_best = vwhere(better, p, p_best)
        n_best = vwhere(better, n, n_best)
        mat_best = jnp.where(better, jnp.int32(int(material_ids[g])), mat_best)
    return t_best, p_best, n_best, mat_best


def _intersect_mesh_baked(mesh_np, options, o: Vec3, d: Vec3,
                          t_best, p_best, n_best, mat_best):
    """Baked-constant triangle loop, fused into the geom running min.

    mesh_intersect_v's sublane-chunk scan doesn't fit a kernel (scan carries
    + reductions); at reference scale (<= MESH_BAKE_MAX_FACES) an unrolled
    per-face Moller-Trumbore with running-min selects is pure full-width VPU
    math, like the geom loop.  Semantics match intersect_scene_v: AABB cull
    gate (pathtrace.cu:258), mesh wins only on strictly smaller t, rotated
    barycentrics for the point / standard for the normal
    (intersections.h:166-168).
    """
    from ..ops.intersect import _triangle_t, ray_aabb_intersect_v

    verts, norms, mat_ids, lb, ub = mesh_np
    cull = (ray_aabb_intersect_v(o, d, lb, ub) if options.ray_culling
            else jnp.ones(o.x.shape, bool))
    for f in range(verts.shape[0]):
        v0, v1, v2 = (Vec3(*(np.float32(verts[f, c, k]) for k in range(3)))
                      for c in range(3))
        t, u, w_, hit = _triangle_t(v0, v1, v2, o, d)
        t = jnp.where(hit & cull & (t > 0.0), t, jnp.inf)
        better = t < t_best
        v = 1.0 - u - w_
        point = v0 * u + v1 * w_ + v2 * v
        n0, n1, n2 = (Vec3(*(np.float32(norms[f, c, k]) for k in range(3)))
                      for c in range(3))
        # mesh_intersect_v safe-normalizes the winner once; per-face
        # normalize-then-select picks the same values
        normal = (n0 * v + n1 * u + n2 * w_).normalized_safe()
        t_best = jnp.where(better, t, t_best)
        p_best = vwhere(better, point, p_best)
        n_best = vwhere(better, normal, n_best)
        mat_best = jnp.where(better, jnp.int32(int(mat_ids[f])), mat_best)
    return t_best, p_best, n_best, mat_best


def _gather_material_baked(mats, mat_id):
    """Unrolled select over the (tiny, static) material table.

    Replaces the _gather_material row gathers (wavefront.py) — arbitrary
    gathers don't vectorize inside TPU kernels, M-way selects do.
    """
    def mat_planes(m):
        return dict(
            color=(float(mats.color[m, 0]), float(mats.color[m, 1]),
                   float(mats.color[m, 2])),
            specular_color=(float(mats.specular_color[m, 0]),
                            float(mats.specular_color[m, 1]),
                            float(mats.specular_color[m, 2])),
            has_reflective=float(mats.has_reflective[m]),
            has_refractive=float(mats.has_refractive[m]),
            index_of_refraction=float(mats.index_of_refraction[m]),
            emittance=float(mats.emittance[m]),
        )

    n_mats = mats.color.shape[0]
    acc = mat_planes(0)
    # broadcast material 0 to planes
    like = mat_id
    out = dict(
        color=Vec3(jnp.full_like(like, acc["color"][0], jnp.float32),
                   jnp.full_like(like, acc["color"][1], jnp.float32),
                   jnp.full_like(like, acc["color"][2], jnp.float32)),
        specular_color=Vec3(
            jnp.full_like(like, acc["specular_color"][0], jnp.float32),
            jnp.full_like(like, acc["specular_color"][1], jnp.float32),
            jnp.full_like(like, acc["specular_color"][2], jnp.float32)),
        has_reflective=jnp.full_like(like, acc["has_reflective"], jnp.float32),
        has_refractive=jnp.full_like(like, acc["has_refractive"], jnp.float32),
        index_of_refraction=jnp.full_like(like, acc["index_of_refraction"],
                                          jnp.float32),
        emittance=jnp.full_like(like, acc["emittance"], jnp.float32),
    )
    for m in range(1, n_mats):
        pm = mat_planes(m)
        sel = mat_id == m
        out["color"] = vwhere(sel, Vec3(*pm["color"]), out["color"])
        out["specular_color"] = vwhere(sel, Vec3(*pm["specular_color"]),
                                       out["specular_color"])
        for key in ("has_reflective", "has_refractive",
                    "index_of_refraction", "emittance"):
            out[key] = jnp.where(sel, pm[key], out[key])
    return out


def _build_kernel(scene: Scene, options: RenderOptions, n_pixels: int,
                  bake_geometry: bool = True):
    """Close the kernel body over the scene + static options.

    ``bake_geometry=True`` folds transforms/materials into the kernel as
    numpy constants (fastest single-scene path; recompiles per scene).
    ``False`` keeps only the geom *layout* static (count + type sequence +
    material count) and reads transforms/material values from SMEM rows at
    runtime — one compiled kernel serves every scene with that layout.
    """
    w, h = scene.camera.resolution
    depth_max = int(scene.trace_depth)
    geoms = scene.geoms
    transforms = np.asarray(geoms.transform, np.float32)
    inverses = np.asarray(geoms.inverse_transform, np.float32)
    inv_transposes = np.asarray(geoms.inv_transpose, np.float32)
    types = tuple(int(t) for t in np.asarray(geoms.type))
    material_ids = tuple(int(m) for m in np.asarray(geoms.material_id))
    n_mats = int(scene.materials.count)
    mats = jax.tree_util.tree_map(lambda a: np.asarray(a), scene.materials)
    if scene.mesh.num_faces > 0:
        nf = scene.mesh.num_faces
        mesh_np = (np.asarray(scene.mesh.vertices, np.float32)[:nf],
                   np.asarray(scene.mesh.normals, np.float32)[:nf],
                   np.asarray(scene.mesh.material_id, np.int32)[:nf],
                   np.asarray(scene.mesh.aabb_lb, np.float32),
                   np.asarray(scene.mesh.aabb_ub, np.float32))
    else:
        mesh_np = None

    def make_intersect(geo_ref, gid_ref):
        def intersect(o, d):
            if bake_geometry:
                t, p, n, mid = _intersect_geoms_baked(
                    transforms, inverses, inv_transposes, types,
                    material_ids, o, d)
            else:
                t, p, n, mid = _intersect_geoms_operand(
                    geo_ref, gid_ref, types, o, d)
            if mesh_np is not None:
                t, p, n, mid = _intersect_mesh_baked(mesh_np, options, o, d,
                                                     t, p, n, mid)
            miss = ~jnp.isfinite(t)
            return (jnp.where(miss, -1.0, t), p, n.normalized_safe(),
                    jnp.where(miss, -1, mid))
        return intersect

    inv_w = np.float32(1.0 / w)
    half_w = np.float32(w * 0.5)
    half_h = np.float32(h * 0.5)

    def make_shade(mat_ref):
        def shade(iteration, pid, t, point, normal, mat_id, ray_d, color,
                  remaining):
            """shadeMaterial (pathtrace.cu:333-390) on kernel tiles —
            mirrors wavefront._shade with the baked/SMEM material table."""
            u = draw_uniforms(iteration, pid, remaining, 2, options.rng)
            alive = remaining != 0
            hit = t > 0.0
            if bake_geometry:
                mat = _gather_material_baked(mats, mat_id)
            else:
                mat = _gather_material_operand(mat_ref, n_mats, mat_id)
            emissive = mat["emittance"] > 0.0

            sc_dir, sc_origin, sc_mult = scatter_ray_v(
                ray_d, point, normal, mat, u[0], u[1],
                fresnels=options.fresnels, dielectric=options.dielectric,
                mesh_normal_view=options.mesh_normal_view)

            emit_color = color * mat["color"] * mat["emittance"]
            scatter_color = color * sc_mult
            upd = alive & hit
            new_color = vwhere(upd & emissive, emit_color,
                               vwhere(upd, scatter_color, color))
            new_color = vwhere(alive & ~hit, Vec3.full_like(new_color.x, 0.0),
                               new_color)
            new_remaining = jnp.where(alive & hit & ~emissive, remaining - 1,
                                      jnp.where(alive, 0, remaining))
            scatter_lanes = upd & ~emissive
            new_ray_d = vwhere(scatter_lanes, sc_dir, ray_d)
            new_ray_o = vwhere(scatter_lanes, sc_origin,
                               Vec3.full_like(sc_origin.x, 0.0))
            return new_ray_o, new_ray_d, new_color, new_remaining
        return shade

    def kernel(cam_ref, it_ref, acc_in, gb_in, acc_out, gb_out,
               geo_ref=None, gid_ref=None, mat_ref=None):
        intersect = make_intersect(geo_ref, gid_ref)
        shade = make_shade(mat_ref)
        tile = pl.program_id(0)
        row = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, _LANES), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, _LANES), 1)
        # pixel_offset (SMEM scalar): first global pixel id of this call's
        # tile — 0 for a whole-frame render, axis_index * tile_size when the
        # megakernel runs per-shard under shard_map (parallel/render_shard).
        # Globalizing pid here keeps the RNG stream and the pid->(x,y) split
        # identical to the single-chip kernel, so a sharded render is
        # bitwise-equal to an unsharded one.
        pid_i32 = it_ref[0, 2] + (tile * TILE_ROWS + row) * _LANES + col
        pid = pid_i32.astype(jnp.uint32)
        pid_f = pid_i32.astype(jnp.float32)
        # Integer div/mod don't lower in Mosaic, so split pid into (y, x)
        # with a float-reciprocal estimate plus an exact integer fix-up:
        # the f32 product is within +-1 row of truth for pid < 2^24 (pid_f
        # exact), and the fix-up corrects the off-by-one rows exactly.
        y_est = jnp.floor((pid_f + 0.5) * inv_w).astype(jnp.int32)
        x_int = pid_i32 - y_est * np.int32(w)
        y_est = jnp.where(x_int < 0, y_est - 1, y_est)
        x_int = jnp.where(x_int < 0, x_int + np.int32(w), x_int)
        y_est = jnp.where(x_int >= w, y_est + 1, y_est)
        x_int = jnp.where(x_int >= w, x_int - np.int32(w), x_int)
        y = y_est.astype(jnp.float32)
        x = x_int.astype(jnp.float32)

        cpos = (cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2])
        cview = Vec3(cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5])
        cup = Vec3(cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8])
        cright = Vec3(cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11])
        plx = cam_ref[0, 12]
        ply = cam_ref[0, 13]
        start = it_ref[0, 0]
        niter = it_ref[0, 1]
        rng_off = it_ref[0, 3]

        ones = jnp.ones((TILE_ROWS, _LANES), jnp.float32)

        def one_iteration(k, carry):
            ax, ay, az, g0, g1, g2, g3, g4, g5, g6 = carry
            iteration = start + 1 + k
            # RNG streams draw from iteration + rng_offset (the datagen
            # noise/mov axes); accumulation and the iteration-1 G-buffer
            # gate use the TRUE iteration.  (Bumping `iteration` itself
            # for noise variants zeroed the G-buffer AND the RGB average
            # of every variant frame — the r3 corpus bug.)
            riter = iteration + rng_off

            # --- ray-gen (generateRayFromCamera, pathtrace.cu:155-182) ---
            if options.antialias:
                uj = draw_uniforms(riter, pid, 0, 2, options.rng)
                jx = uj[0] - 0.5
                jy = uj[1] - 0.5
            else:
                jx = jy = jnp.zeros_like(x)
            px = plx * (x - half_w + jx)
            py = ply * (y - half_h + jy)
            ray_d = Vec3(cview.x - cright.x * px - cup.x * py,
                         cview.y - cright.y * px - cup.y * py,
                         cview.z - cright.z * px - cup.z * py).normalized()
            ray_o = Vec3(ones * cpos[0], ones * cpos[1], ones * cpos[2])
            color = Vec3(ones, ones, ones)
            remaining = jnp.full((TILE_ROWS, _LANES), depth_max, jnp.int32)

            # --- bounce loop, unrolled (pathtrace.cu:460-513) ---
            for d_i in range(depth_max):
                t, point, normal, mat_id = intersect(ray_o, ray_d)
                if d_i == 0 and options.denoise:
                    write = (iteration == 1) & (t >= 0.0)
                    g0 = jnp.where(write, normal.x, g0)
                    g1 = jnp.where(write, normal.y, g1)
                    g2 = jnp.where(write, normal.z, g2)
                    g3 = jnp.where(write, t, g3)
                ray_o, ray_d, color, remaining = shade(
                    riter, pid, t, point, normal, mat_id, ray_d, color,
                    remaining)
                if d_i == 0 and options.denoise:
                    g4 = jnp.where(write, color.x, g4)
                    g5 = jnp.where(write, color.y, g5)
                    g6 = jnp.where(write, color.z, g6)

            # finalGather (pathtrace.cu:393-402)
            return (ax + color.x, ay + color.y, az + color.z,
                    g0, g1, g2, g3, g4, g5, g6)

        carry0 = (acc_in[0], acc_in[1], acc_in[2],
                  gb_in[0], gb_in[1], gb_in[2], gb_in[3], gb_in[4],
                  gb_in[5], gb_in[6])
        carry = jax.lax.fori_loop(0, niter, one_iteration, carry0)
        acc_out[0], acc_out[1], acc_out[2] = carry[0], carry[1], carry[2]
        for c in range(7):
            gb_out[c] = carry[3 + c]

    if bake_geometry:
        return kernel

    def kernel_operand(cam_ref, it_ref, geo_ref, gid_ref, mat_ref,
                       acc_in, gb_in, acc_out, gb_out):
        return kernel(cam_ref, it_ref, acc_in, gb_in, acc_out, gb_out,
                      geo_ref=geo_ref, gid_ref=gid_ref, mat_ref=mat_ref)

    return kernel_operand


def _pack(planes, n_rows_padded: int):
    """k x (N,) planes -> (k, R, 128) padded planar tensor."""
    stacked = jnp.stack(list(planes))
    k, n = stacked.shape
    pad = n_rows_padded * _LANES - n
    if pad:
        stacked = jnp.pad(stacked, ((0, 0), (0, pad)))
    return stacked.reshape(k, n_rows_padded, _LANES)


def _unpack(tensor, n: int):
    """(k, R, 128) -> list of k (N,) planes."""
    k = tensor.shape[0]
    flat = tensor.reshape(k, -1)[:, :n]
    return [flat[i] for i in range(k)]


_KERNEL_CACHE: dict = {}


def _scene_fingerprint(scene: Scene) -> bytes:
    """Content hash of everything the kernel bakes in (geometry, materials,
    resolution, depth) — NOT the camera/iteration window, which are runtime
    SMEM inputs.  Keying the kernel cache on content (not object identity)
    is what lets interactive orbits — a fresh Scene per frame via
    dataclasses.replace(camera=...) — reuse one compiled kernel."""
    import hashlib
    h = hashlib.sha1()
    g = scene.geoms
    for arr in (g.type, g.material_id, g.transform, g.inverse_transform,
                g.inv_transpose):
        h.update(np.asarray(arr).tobytes())
    m = scene.materials
    for arr in (m.color, m.specular_color, m.has_reflective,
                m.has_refractive, m.index_of_refraction, m.emittance):
        h.update(np.asarray(arr).tobytes())
    # The mesh is baked into the kernel too (_build_kernel slices the first
    # num_faces rows as constants): hash exactly what gets baked, or two
    # scenes differing only in mesh would share a kernel.
    mm = scene.mesh
    h.update(np.int64(mm.num_faces).tobytes())
    if mm.num_faces > 0:
        nf = mm.num_faces
        for arr in (np.asarray(mm.vertices)[:nf], np.asarray(mm.normals)[:nf],
                    np.asarray(mm.material_id)[:nf], np.asarray(mm.aabb_lb),
                    np.asarray(mm.aabb_ub)):
            h.update(np.ascontiguousarray(arr).tobytes())
    h.update(repr((scene.camera.resolution, scene.trace_depth)).encode())
    return h.digest()


def _scene_layout_fingerprint(scene: Scene) -> bytes:
    """Hash of only what the *operand-mode* kernel specializes on: the geom
    type sequence, material count, resolution/depth — and the mesh, which
    stays baked in both modes.  Scenes that differ only in transforms or
    material values (randomizer variants, interactive edits) collide here
    on purpose: they share one compiled kernel."""
    import hashlib
    h = hashlib.sha1()
    h.update(np.asarray(scene.geoms.type, np.int64).tobytes())
    h.update(np.int64(scene.materials.count).tobytes())
    mm = scene.mesh
    h.update(np.int64(mm.num_faces).tobytes())
    if mm.num_faces > 0:
        nf = mm.num_faces
        for arr in (np.asarray(mm.vertices)[:nf], np.asarray(mm.normals)[:nf],
                    np.asarray(mm.material_id)[:nf], np.asarray(mm.aabb_lb),
                    np.asarray(mm.aabb_ub)):
            h.update(np.ascontiguousarray(arr).tobytes())
    h.update(repr((scene.camera.resolution, scene.trace_depth)).encode())
    return h.digest()


def _compiled_call(scene: Scene, options: RenderOptions, n_pixels: int,
                   n_rows: int, interpret: bool, bake_geometry: bool = True):
    """Build + wrap the pallas_call, cached by scene-content fingerprint
    (baked mode) or scene-layout fingerprint (operand mode)."""
    fp = (_scene_fingerprint(scene) if bake_geometry
          else _scene_layout_fingerprint(scene))
    key = (fp, bake_geometry, options, n_pixels, n_rows, interpret)
    cached = _KERNEL_CACHE.get(key)
    if cached is not None:
        return cached
    kernel = _build_kernel(scene, options, n_pixels,
                           bake_geometry=bake_geometry)
    grid = (n_rows // TILE_ROWS,)

    n_geoms = int(np.asarray(scene.geoms.type).shape[0])
    n_mats = int(scene.materials.count)
    scene_specs = [] if bake_geometry else [
        pl.BlockSpec((1, n_geoms * _GEOM_ROW), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, n_geoms), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, n_mats * _MAT_ROW), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            *scene_specs,
            pl.BlockSpec((3, TILE_ROWS, _LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, TILE_ROWS, _LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, TILE_ROWS, _LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, TILE_ROWS, _LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, n_rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((7, n_rows, _LANES), jnp.float32),
        ],
        input_output_aliases=({2: 0, 3: 1} if bake_geometry
                              else {5: 0, 6: 1}),
        interpret=interpret,
    )
    jitted = jax.jit(call)
    if len(_KERNEL_CACHE) >= 32:
        _KERNEL_CACHE.pop(next(iter(_KERNEL_CACHE)))
    _KERNEL_CACHE[key] = jitted
    return jitted


def render_pallas(scene: Scene, options: RenderOptions,
                  num_iterations: int,
                  state: Optional[RenderLoopState] = None,
                  interpret: bool = False,
                  pixel_offset=0) -> RenderLoopState:
    """Run ``num_iterations`` 1-spp iterations through the megakernel.

    Same contract as the XLA driver: accumulates into ``state`` and returns
    the advanced state.  ``interpret=True`` runs the kernel in the Pallas
    interpreter (CPU) — used by the equivalence tests.

    ``pixel_offset`` (int or traced scalar) globalizes pixel ids when the
    state holds only a tile of the frame (shard_map tile parallelism); the
    state's plane length is then the local tile size, not w*h.
    """
    if not pallas_eligible(scene, options):
        raise ValueError("scene/options not eligible for the pallas backend")
    w, h = scene.camera.resolution
    if state is None:
        state = init_render_state(scene)
    n = state.accum.x.shape[0]                   # w*h, or the local tile
    rows = -(-n // _LANES)                       # ceil(n / 128)
    n_rows = -(-rows // TILE_ROWS) * TILE_ROWS   # pad to tile multiple

    cam = scene.camera
    cam_row = jnp.concatenate([
        jnp.asarray(cam.position, jnp.float32),
        jnp.asarray(cam.view, jnp.float32),
        jnp.asarray(cam.up, jnp.float32),
        jnp.asarray(cam.right, jnp.float32),
        jnp.asarray(cam.pixel_length, jnp.float32),
        jnp.zeros((2,), jnp.float32),
    ]).reshape(1, 16)
    iters = jnp.stack([state.iteration.astype(jnp.int32),
                       jnp.int32(num_iterations),
                       jnp.asarray(pixel_offset, jnp.int32),
                       state.rng_offset.astype(jnp.int32)]).reshape(1, 4)

    accum = _pack(tuple(state.accum), n_rows)
    gbuf = _pack(state.gbuf, n_rows)

    bake = options.pallas_geometry != "operand"
    call = _compiled_call(scene, options, n, n_rows, interpret,
                          bake_geometry=bake)
    if bake:
        acc_out, gb_out = call(cam_row, iters, accum, gbuf)
    else:
        g = scene.geoms
        n_geoms = g.transform.shape[0]
        geo_row = jnp.concatenate([
            jnp.asarray(g.transform, jnp.float32).reshape(n_geoms, 16),
            jnp.asarray(g.inverse_transform, jnp.float32).reshape(n_geoms, 16),
            jnp.asarray(g.inv_transpose, jnp.float32).reshape(n_geoms, 16),
        ], axis=1).reshape(1, n_geoms * _GEOM_ROW)
        gid_row = jnp.asarray(g.material_id, jnp.int32).reshape(1, n_geoms)
        m = scene.materials
        mat_row = jnp.concatenate([
            jnp.asarray(m.color, jnp.float32),
            jnp.asarray(m.specular_color, jnp.float32),
            jnp.asarray(m.has_reflective, jnp.float32)[:, None],
            jnp.asarray(m.has_refractive, jnp.float32)[:, None],
            jnp.asarray(m.index_of_refraction, jnp.float32)[:, None],
            jnp.asarray(m.emittance, jnp.float32)[:, None],
        ], axis=1).reshape(1, int(m.count) * _MAT_ROW)
        acc_out, gb_out = call(cam_row, iters, geo_row, gid_row, mat_row,
                               accum, gbuf)

    ax, ay, az = _unpack(acc_out, n)
    g = _unpack(gb_out, n)
    return RenderLoopState(
        accum=Vec3(ax, ay, az), gbuf=tuple(g), geoms=state.geoms,
        iteration=state.iteration + jnp.int32(num_iterations),
        rng_offset=state.rng_offset,
        cache_t=state.cache_t, cache_point=state.cache_point,
        cache_normal=state.cache_normal, cache_mat=state.cache_mat)
