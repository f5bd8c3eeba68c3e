"""Pallas TPU mesh-intersection kernel over the cluster BVH (ops/bvh.py).

The reference's hottest loop is the per-ray brute-force triangle scan
(pathtrace.cu:258-281): O(faces) per ray, gated by one whole-mesh AABB.
The XLA re-design (ops/intersect.py:mesh_intersect_v) is the same O(F*N)
work as dense VPU math — fine at the reference's 12-60 faces, ~3 s/frame
at 5K faces, hopeless at bunny scale.

This kernel keeps the *arithmetic* of that scan (identical Moller-Trumbore
blocks, identical one-hot winner extraction, identical running-min merge —
so results are bitwise equal) but adds what XLA cannot express cheaply:
**data-dependent skipping**.  Mosaic's scalar core runs real branches in
nanoseconds, so traversal is three nested ``fori_loop``s over the dense
AABB levels (hyper -> super -> cluster) where each node is tested against
the whole ray tile at full VPU width and descended only when
``jax.lax.cond`` sees any live lane:

  grid      = tiles of LANES (1024) rays; ray planes are (1, LANES) rows
  node test = 6 scalar reads + a (1, LANES) slab test + any-reduce
  leaf      = one (32, LANES) MT block vs the cluster's faces (faces on
              sublanes, rays on lanes — the mesh_intersect_v layout)

Two per-ray culls make secondary bounces cheap: a node is only descended
for lanes whose AABB *entry* distance beats the running best t, and the
running t is seeded with the analytic-geom hit (``t_cull``) — a diffuse
bounce that hits a wall before the mesh skips the whole tree.

Face data stays in HBM ((F, 128) packed rows) and each visited cluster is
DMA'd to a VMEM scratch slab; only the bounds tables are VMEM-resident
(~16 B/face), so mesh size is HBM-bound, not VMEM-bound.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.bvh import CLUSTER, FANOUT, MeshBVH
from ..ops.intersect import _triangle_t
from ..ops.vec3 import Vec3

LANES = 1024            # default rays per grid program (8 native f32 rows)
_INF = np.float32(np.inf)

# VMEM holds only the bounds tables (~16 B/face); faces stream from HBM.
# The cap is a sanity bound on the cluster table (2 MB at 1M faces).
MAX_KERNEL_FACES = 1_000_000


def _slab_live(row, o: Vec3, inv: Vec3, t_run):
    """Ray tile vs one AABB: live = hit & entry-closer-than-current-best.

    Same slab formulation as ops/intersect.py:ray_aabb_intersect_v (which
    mirrors intersections.h:175-200), plus the entry-distance cull.
    ``row`` is a (1, 8) bounds row [lbx lby lbz ubx uby ubz _ _].
    """
    tmin = jnp.full_like(t_run, -_INF)
    tmax = jnp.full_like(t_run, _INF)
    for axis, (oc, ic) in enumerate(((o.x, inv.x), (o.y, inv.y), (o.z, inv.z))):
        t1 = (row[0, axis] - oc) * ic
        t2 = (row[0, axis + 3] - oc) * ic
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        # 0 * inf = NaN (origin exactly on a node bound with a zero
        # direction component): treat the axis as unbounded rather than
        # culling.  The dense scan this kernel must match bitwise has no
        # per-cluster gates, so the gate may only ever be conservative.
        lo = jnp.where(jnp.isnan(lo), -_INF, lo)
        hi = jnp.where(jnp.isnan(hi), _INF, hi)
        tmin = jnp.maximum(tmin, lo)
        tmax = jnp.minimum(tmax, hi)
    return (tmax >= tmin) & (tmax >= 0.0) & (jnp.maximum(tmin, 0.0) < t_run)


def _build_kernel(n_hypers: int):
    def kernel(rays_ref, faces_ref, cb_ref, sb_ref, hb_ref, out_ref,
               state, fscratch, fsem):
        # rays_ref block: (1, 8, LANES) — rows 0-6 are ox oy oz dx dy dz
        # t_cull (row 7 pad).  Row slices give (1, LANES) planes.
        o = Vec3(rays_ref[0, 0:1, :], rays_ref[0, 1:2, :], rays_ref[0, 2:3, :])
        d = Vec3(rays_ref[0, 3:4, :], rays_ref[0, 4:5, :], rays_ref[0, 5:6, :])
        t_ub = rays_ref[0, 6:7, :]
        inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)

        # Running state lives in a VMEM scratch (rows: t_run, p.xyz, n.xyz,
        # mat-as-f32) so the descent is pure `pl.when` predication — no
        # value-carrying conds, the native Mosaic idiom.
        zero = jnp.zeros_like(t_ub)
        state[0:1, :] = t_ub
        for r in range(1, 7):
            state[r:r + 1, :] = zero
        state[7:8, :] = zero - 1.0

        def mt_cluster(k):
            """One (CLUSTER, LANES) Moller-Trumbore block + one-hot winner.

            Identical math to mesh_intersect_v's scan_body (faces on
            sublanes, first-minimal face wins, point via rotated
            barycentrics / normal via standard, intersections.h:166-168).
            """
            t_run = state[0:1, :]
            f0 = k * CLUSTER
            # faces live in HBM (a resident VMEM copy caps mesh size);
            # DMA the visited cluster's contiguous (32, 128) slab.
            dma = pltpu.make_async_copy(
                faces_ref.at[pl.ds(f0, CLUSTER), :], fscratch, fsem)
            dma.start()
            dma.wait()
            vb = fscratch[:]                                 # (32, 128)
            v0 = Vec3(vb[:, 0:1], vb[:, 1:2], vb[:, 2:3])    # (32, 1)
            v1 = Vec3(vb[:, 3:4], vb[:, 4:5], vb[:, 5:6])
            v2 = Vec3(vb[:, 6:7], vb[:, 7:8], vb[:, 8:9])
            t, u, w_, hit = _triangle_t(v0, v1, v2, o, d)    # (32, LANES)
            t = jnp.where(hit & (t > 0.0), t, _INF)
            tmin = jnp.min(t, axis=0, keepdims=True)         # (1, LANES)
            ismin = t == tmin
            # first-occurrence-of-min one-hot (scan_body's argmin semantics)
            # via a second min over row ids — Mosaic has no cumsum/argmin
            rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
            cand = jnp.where(ismin, rows, jnp.int32(CLUSTER))
            first = rows == jnp.min(cand, axis=0, keepdims=True)
            better = tmin < t_run                            # strict: earlier face keeps ties

            n0 = Vec3(vb[:, 9:10], vb[:, 10:11], vb[:, 11:12])
            n1 = Vec3(vb[:, 12:13], vb[:, 13:14], vb[:, 14:15])
            n2 = Vec3(vb[:, 15:16], vb[:, 16:17], vb[:, 17:18])
            v = 1.0 - u - w_
            p_full = v0 * u + v1 * w_ + v2 * v
            n_full = n0 * v + n1 * u + n2 * w_

            def sel(a):
                return jnp.sum(jnp.where(first, a, 0.0), axis=0, keepdims=True)

            mb = vb[:, 18:19]                    # (32, 1) material id as f32
            m_c = jnp.sum(jnp.where(first, mb, 0.0), axis=0, keepdims=True)
            news = (tmin, sel(p_full.x), sel(p_full.y), sel(p_full.z),
                    sel(n_full.x), sel(n_full.y), sel(n_full.z), m_c)
            for r, val in enumerate(news):
                state[r:r + 1, :] = jnp.where(better, val, state[r:r + 1, :])

        def clusters_of(s, c):
            k = s * FANOUT + c
            live = _slab_live(cb_ref[pl.ds(k, 1), :], o, inv, state[0:1, :])

            @pl.when(jnp.any(live))
            def _():
                mt_cluster(k)
            return 0

        def supers_of(h, j):
            s = h * FANOUT + j
            live = _slab_live(sb_ref[pl.ds(s, 1), :], o, inv, state[0:1, :])

            @pl.when(jnp.any(live))
            def _():
                jax.lax.fori_loop(0, FANOUT,
                                  lambda c, _: clusters_of(s, c), 0)
            return 0

        def hyper_body(h, _):
            live = _slab_live(hb_ref[pl.ds(h, 1), :], o, inv, state[0:1, :])

            @pl.when(jnp.any(live))
            def _():
                jax.lax.fori_loop(0, FANOUT,
                                  lambda j, _: supers_of(h, j), 0)
            return 0

        jax.lax.fori_loop(0, n_hypers, hyper_body, 0)

        mid = state[7:8, :]
        # winner normal normalized once (mesh_intersect_v:308-309)
        nrm = Vec3(state[4:5, :], state[5:6, :], state[6:7, :]).normalized_safe()
        found = mid >= 0.0
        out_ref[0, 0:1, :] = jnp.where(found, state[0:1, :], _INF)
        out_ref[0, 1:2, :] = state[1:2, :]
        out_ref[0, 2:3, :] = state[2:3, :]
        out_ref[0, 3:4, :] = state[3:4, :]
        out_ref[0, 4:5, :] = nrm.x
        out_ref[0, 5:6, :] = nrm.y
        out_ref[0, 6:7, :] = nrm.z
        # material id rides as f32 (exact for small ints); wrapper decodes
        out_ref[0, 7:8, :] = mid

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mesh_bvh_call(bvh: MeshBVH, rays: jnp.ndarray, interpret: bool):
    """rays: (nT, 8, lanes) rows [ox oy oz dx dy dz t_cull pad] -> out."""
    n_tiles, _, lanes = rays.shape
    kernel = _build_kernel(bvh.n_hypers)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # Faces explicitly in HBM: mesh size stays HBM-bound, and the
            # manual async-copy below has an unambiguous source space.
            # (The r3/r4 "small-mesh" runtime faults were NOT a placement
            # issue: they were out-of-bounds face DMAs caused by always-
            # live padding bounds rows — fixed in ops/bvh.py _DEAD_ROW.)
            pl.BlockSpec(memory_space=pltpu.ANY if not hasattr(pltpu, "HBM")
                         else pltpu.HBM),
            vmem(), vmem(), vmem(),                 # bounds tables
        ],
        out_specs=pl.BlockSpec((1, 8, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, lanes), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, lanes), jnp.float32),      # running state rows
            pltpu.VMEM((CLUSTER, 128), jnp.float32),  # DMA'd face slab
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(rays, bvh.faces_packed,
      bvh.cluster_bounds, bvh.super_bounds, bvh.hyper_bounds)
    return out


def mesh_intersect_bvh(bvh: MeshBVH, o: Vec3, d: Vec3,
                       t_cull: Optional[jnp.ndarray] = None,
                       interpret: bool = False,
                       lanes: Optional[int] = None,
                       ) -> Tuple[jnp.ndarray, Vec3, Vec3, jnp.ndarray]:
    """Closest mesh hit for a ray batch via the BVH kernel.

    Same contract as ops/intersect.py:mesh_intersect_v: returns
    (t, point, normal, material_id) planes with t=+inf / mat=-1 on miss.

    ``t_cull``: per-ray upper bound on useful hits (the analytic-geom best
    t; the merge in intersect_scene_v requires the mesh to win *strictly*,
    so pruning hits >= t_cull is exact).  Use -inf to skip a ray entirely
    (dead lanes), +inf (default) for an unbounded query.

    ``lanes``: rays per grid program — the descent-gating granule.  A node
    is descended when ANY of the program's rays wants it, so smaller
    tiles skip more of the tree for incoherent secondary bounces (128 =
    one native f32 lane row, the finest useful granule; combine with
    ``octant_sort`` so each small tile holds direction-coherent rays),
    while larger tiles amortize each cluster DMA over more rays for
    coherent primaries (1024 = the proven default).  Pure work
    partitioning: results are bitwise identical for any value.
    """
    if getattr(bvh, "cluster", CLUSTER) != CLUSTER:
        raise ValueError(
            f"bvh built with cluster={bvh.cluster} but kernel compiled "
            f"for CLUSTER={CLUSTER} (APTD_BVH_CLUSTER mismatch)")
    if bvh.num_faces > MAX_KERNEL_FACES:
        raise ValueError(
            f"mesh has {bvh.num_faces} faces > MAX_KERNEL_FACES="
            f"{MAX_KERNEL_FACES}: the VMEM-resident bounds tables would "
            "blow the budget (raise the cap only with a deeper hierarchy)")
    lanes = LANES if lanes is None else lanes
    assert lanes % 128 == 0, lanes
    n = o.x.shape[0]
    n_tiles = -(-n // lanes)
    pad = n_tiles * lanes - n

    def padded(x, fill):
        x = x.astype(jnp.float32)
        return jnp.pad(x, (0, pad), constant_values=fill) if pad else x

    tc = t_cull if t_cull is not None else jnp.full((n,), _INF)
    zrow = jnp.zeros((n_tiles * lanes,), jnp.float32)
    rays = jnp.stack([
        padded(o.x, 0.0), padded(o.y, 0.0), padded(o.z, 0.0),
        padded(d.x, 1.0), padded(d.y, 1.0), padded(d.z, 1.0),
        padded(tc, -_INF),                      # padding lanes: cull all
        zrow,
    ]).reshape(8, n_tiles, lanes).swapaxes(0, 1)

    out = _mesh_bvh_call(bvh, rays, interpret)
    flat = out.swapaxes(0, 1).reshape(8, -1)[:, :n]
    mat = flat[7].astype(jnp.int32)
    return (flat[0], Vec3(flat[1], flat[2], flat[3]),
            Vec3(flat[4], flat[5], flat[6]), mat)
