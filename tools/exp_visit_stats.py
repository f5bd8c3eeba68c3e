"""Measure the statue/blob kernels' ACTUAL visit statistics (r5).

Replays the wavefront bounce structure for a 1-spp frame, capturing each
bounce's sorted ray batch exactly as intersect_scene_v hands it to the
BVH kernel (same octant+cell sort, same t_cull seeding), then computes
on-device:

  - live-ray count per bounce
  - cluster visits per 1024-lane tile (the kernel's actual visit count:
    ANY-lane liveness per cluster)
  - same at 128-lane subtile granularity
  - per-RAY live-cluster counts (the floor any binning scheme chases)

This decides where the remaining statue time goes and what per-ray
binning could actually buy (VERDICT r4 #1, docs/MESH_TUNING.md §4).

Run: python tools/exp_visit_stats.py [scene] [depth]
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from ai_path_tracer_denoiser_tpu.config import RenderOptions
from ai_path_tracer_denoiser_tpu.ops.intersect import (
    intersect_geoms_v, intersect_scene_v, ray_aabb_intersect_v)
from ai_path_tracer_denoiser_tpu.ops.vec3 import Vec3
from ai_path_tracer_denoiser_tpu.render import wavefront as wf
from ai_path_tracer_denoiser_tpu.scene.parser import load_scene

_INF = np.float32(np.inf)


def sort_perm(o, d, t_cull, sort_cells=8):
    """Reproduce intersect_scene_v's octant+cell sort key (cell-major)."""
    key = ((d.x < 0).astype(jnp.int32) * 4
           + (d.y < 0).astype(jnp.int32) * 2
           + (d.z < 0).astype(jnp.int32))
    n_bits = max(1, int(np.ceil(np.log2(sort_cells))))
    cell = jnp.zeros_like(key)
    for shift, c in ((2, o.x), (1, o.y), (0, o.z)):
        lo_ = jnp.min(c)
        ext = jnp.maximum(jnp.max(c) - lo_, 1e-12)
        q = jnp.clip(((c - lo_) / ext * sort_cells).astype(jnp.int32),
                     0, sort_cells - 1)
        m = jnp.zeros_like(q)
        for b in range(n_bits):
            m = m | (((q >> b) & 1) << (3 * b))
        cell = cell | (m << shift)
    key = (cell << 3) | key
    key = jnp.where(t_cull == -_INF, jnp.int32(1 << 30), key)
    return jnp.argsort(key, stable=True)


@jax.jit
def cluster_live_stats(o_x, o_y, o_z, d_x, d_y, d_z, t_cull, cb):
    """(N,) sorted rays vs (K, 8) cluster bounds -> per-ray counts and
    per-tile / per-subtile visit counts."""
    n = o_x.shape[0]
    k = cb.shape[0]
    o = Vec3(o_x[:, None], o_y[:, None], o_z[:, None])       # (N, 1)
    inv = Vec3(1.0 / d_x[:, None], 1.0 / d_y[:, None], 1.0 / d_z[:, None])
    tmin = jnp.full((n, k), -_INF)
    tmax = jnp.full((n, k), _INF)
    for axis, (oc, ic) in enumerate(((o.x, inv.x), (o.y, inv.y),
                                     (o.z, inv.z))):
        t1 = (cb[None, :, axis] - oc) * ic
        t2 = (cb[None, :, axis + 3] - oc) * ic
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        lo = jnp.where(jnp.isnan(lo), -_INF, lo)
        hi = jnp.where(jnp.isnan(hi), _INF, hi)
        tmin = jnp.maximum(tmin, lo)
        tmax = jnp.minimum(tmax, hi)
    live = ((tmax >= tmin) & (tmax >= 0.0)
            & (jnp.maximum(tmin, 0.0) < t_cull[:, None]))    # (N, K)
    per_ray = jnp.sum(live, axis=1)                          # (N,)
    tiles = live.reshape(n // 1024, 1024, k)
    per_tile = jnp.sum(jnp.any(tiles, axis=1), axis=1)       # (T,)
    sub = live.reshape(n // 128, 128, k)
    per_sub = jnp.sum(jnp.any(sub, axis=1), axis=1)          # (S,)
    return per_ray, per_tile, per_sub


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else \
        "scenes/cornell_mesh_statue.txt"
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    scene = load_scene(scene_path)
    import dataclasses
    scene = dataclasses.replace(scene, trace_depth=depth)
    options = RenderOptions()
    state = wf.init_render_state(scene)
    bvh = scene.mesh.bvh
    kr = bvh.n_clusters_real
    cb = bvh.cluster_bounds[:kr]
    print(f"scene={scene_path} faces={scene.mesh.num_faces} "
          f"clusters={kr} depth={depth}")

    n = scene.camera.resolution[0] * scene.camera.resolution[1]
    iteration = 1
    pixel_ids = jnp.arange(n, dtype=jnp.uint32)
    ray_o, ray_d = wf.generate_camera_rays_v(scene.camera, iteration,
                                             options, pixel_ids)
    color = Vec3.full_like(ray_d.x, 1.0)
    remaining = jnp.full((n,), depth, jnp.int32)

    total_visits_tile = 0
    total_visits_sub = 0
    total_pairs = 0
    for b in range(depth):
        t_g, _, _, _, _ = intersect_geoms_v(scene.geoms, ray_o, ray_d)
        t_cull = t_g
        cull = ray_aabb_intersect_v(ray_o, ray_d, scene.mesh.aabb_lb,
                                    scene.mesh.aabb_ub)
        t_cull = jnp.where(cull, t_cull, -_INF)
        t_cull = jnp.where(remaining != 0, t_cull, -_INF)
        if b > 0:
            perm = sort_perm(ray_o, ray_d, t_cull)
            os_ = Vec3(ray_o.x[perm], ray_o.y[perm], ray_o.z[perm])
            ds_ = Vec3(ray_d.x[perm], ray_d.y[perm], ray_d.z[perm])
            tc = t_cull[perm]
        else:
            os_, ds_, tc = ray_o, ray_d, t_cull
        per_ray, per_tile, per_sub = cluster_live_stats(
            os_.x, os_.y, os_.z, ds_.x, ds_.y, ds_.z, tc, cb)
        per_ray = np.asarray(per_ray)
        per_tile = np.asarray(per_tile)
        per_sub = np.asarray(per_sub)
        alive = np.asarray(tc) != -np.float32(np.inf)
        pr_live = per_ray[alive] if alive.any() else np.zeros(1)
        print(f"bounce {b}: live={alive.sum():7d}  "
              f"per-ray live clusters: mean={pr_live.mean():7.1f} "
              f"p50={np.percentile(pr_live, 50):6.0f} "
              f"p90={np.percentile(pr_live, 90):6.0f} "
              f"max={pr_live.max():6.0f} | "
              f"visits/tile mean={per_tile.mean():7.1f} "
              f"sum={per_tile.sum():8d} | "
              f"visits/sub128 mean={per_sub.mean():6.1f} "
              f"sum={per_sub.sum():9d}")
        total_visits_tile += int(per_tile.sum())
        total_visits_sub += int(per_sub.sum())
        total_pairs += int(pr_live.sum())

        # advance one real bounce
        isect = intersect_scene_v(scene.geoms, scene.mesh, ray_o, ray_d,
                                  ray_culling=True, use_bvh=True,
                                  active=remaining != 0,
                                  octant_sort=b > 0, sort_cells=8,
                                  kernel_impl="v2p")
        ray_o, ray_d, color, remaining = wf._shade(
            scene, options, iteration, isect, ray_d, color, remaining, 0)

    print(f"\nTOTALS: tile-visits={total_visits_tile} "
          f"sub128-visits={total_visits_sub} ray-cluster pairs={total_pairs}")
    cw = scene.mesh.bvh.cluster if scene.mesh.bvh else 32
    print(f"tile-visit MT pairs = {total_visits_tile * 1024 * cw:.3e}")
    print(f"sub-visit  MT pairs = {total_visits_sub * 128 * cw:.3e}")
    print(f"per-ray    MT pairs = {total_pairs * cw:.3e} "
          f"(binning floor; ratio vs tile = "
          f"{total_visits_tile * 1024 / max(total_pairs, 1):.1f}x)")


if __name__ == "__main__":
    main()
