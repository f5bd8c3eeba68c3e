"""Pallas TPU mesh-intersection kernel v3: front-to-back subtile traversal.

The v2 kernel (render/mesh_kernel.py) descends the tree in index order
and gates each node on ``any(live)`` across its whole ray tile; once a
diffuse bounce decoheres the rays it degenerates toward a serial walk of
every cluster (statue @800^2 depth 8: 6.6 s/frame; octant-sorted 3.4 s).
This redesign changes the traversal, not the arithmetic:

  grid      = subtiles of LANES (128) rays; ray planes are (1, 128) rows.
    A small granule is the whole game for incoherent secondary rays: a
    node is skipped unless one of *128* rays wants it, not one of 1024.
  node test = 8 sibling AABBs per batch as one (8, 128) slab test; per-
    sibling liveness and minimum entry distance come out as 8 scalars.
  ordering  = siblings are visited FRONT-TO-BACK: an 8-element sorting
    network (19 compare-exchanges on the scalar core) orders them by
    their subtile-minimum entry distance.  This is what makes the
    per-lane ``entry < t_run`` cull effective: the nearest cluster's hit
    tightens t_run before its occluded siblings are even re-tested, so
    the far tail of every batch dies unvisited.  Order affects which
    *work* happens, never the result (tie-break note below).
  leaf      = per live cluster, in sorted order: async DMA of its
    (32, 128) face slab from HBM into one of 8 VMEM slots with a depth-
    PIPELINE lookahead (fetch latency overlaps the previous siblings'
    arithmetic), a re-test against the now-tighter t_run (skips both the
    MT block and, at start time, the tail DMAs), then one (32, LANES)
    Moller-Trumbore block.

Exactness: every cull is conservative (widened boxes, NaN-proof slab
test, strict-< running-t comparisons), and the winner merge breaks exact
f32 t-ties by cluster index — the dense scan's iteration order — so
results are bitwise equal to ``mesh_intersect_v`` *regardless of visit
order* (tests/test_bvh.py, tests/test_bvh_hw.py on hardware).

History: this kernel faulted on every small mesh in round 3 and was
reverted; the root cause (r4, hardware-bisected) was the padding bounds
rows — "inverted" boxes pass the orderless slab test, so padded levels
descended out-of-bounds children and issued out-of-bounds face DMAs.
Fixed for all kernels by ops/bvh.py's _DEAD_ROW padding encoding — not
anything in this traversal.  The r3 hardening is kept: separate 2D DMA
buffers + scalar semaphores per slot, every DMA-guarding predicate
staged through SMEM, bounds tables padded to >= 2*FANOUT rows
(ops/bvh.py).

Reference anchor: replaces the per-ray brute-force triangle loop,
/root/reference/Inference/src/pathtrace.cu:258-281.
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

import os as _os

LANES = 128             # rays per grid program (one f32 lane row)
# cluster-DMA lookahead depth (env override is a hardware-debug lever:
# PIPELINE=0 degenerates to v2-style serial start->wait per cluster)
PIPELINE = int(_os.environ.get("APTD_MK3_PIPELINE", "3"))
_INF = np.float32(np.inf)

from .mesh_kernel import MAX_KERNEL_FACES  # shared cap

# Batcher odd-even merge sort network for 8 elements (19 comparators).
_NET8 = ((0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
         (1, 2), (5, 6), (0, 4), (3, 7), (1, 5), (2, 6), (1, 4), (3, 6),
         (2, 4), (3, 5), (3, 4))


def _sort8(vals):
    """Sort 8 traced scalars ascending; returns (vals, original indices).

    Pure scalar-core compare-exchanges — no vector ops, no memory.
    """
    vals = list(vals)
    idx = [jnp.int32(i) for i in range(FANOUT)]
    for a, b in _NET8:
        swap = vals[a] > vals[b]
        va = jnp.where(swap, vals[b], vals[a])
        vb = jnp.where(swap, vals[a], vals[b])
        ia = jnp.where(swap, idx[b], idx[a])
        ib = jnp.where(swap, idx[a], idx[b])
        vals[a], vals[b], idx[a], idx[b] = va, vb, ia, ib
    return vals, idx


def _slab_entry(rows, o: Vec3, inv: Vec3):
    """(R, 8) AABB rows vs a (1, LANES) ray tile -> (tmin, tmax) (R, LANES).

    Same slab formulation as ops/intersect.py:ray_aabb_intersect_v (which
    mirrors intersections.h:175-200).  Rows are [lbx lby lbz ubx uby ubz _ _].
    """
    shape = (rows.shape[0], o.x.shape[-1])
    tmin = jnp.full(shape, -_INF)
    tmax = jnp.full(shape, _INF)
    for axis, (oc, ic) in enumerate(((o.x, inv.x), (o.y, inv.y), (o.z, inv.z))):
        t1 = (rows[:, axis:axis + 1] - oc) * ic
        t2 = (rows[:, axis + 3:axis + 4] - oc) * ic
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
    return tmin, tmax


def _slab_live(rows, o: Vec3, inv: Vec3, t_run):
    """(R, 8) rows -> (R, LANES) liveness: hit & entry beats running t."""
    tmin, tmax = _slab_entry(rows, o, inv)
    return (tmax >= tmin) & (tmax >= 0.0) & (jnp.maximum(tmin, 0.0) < t_run)


def _build_kernel(n_hyper_batches: int):
    def kernel(rays_ref, faces_ref, cb_ref, sb_ref, hb_ref, root_ref,
               out_ref, state, *scr):
        # 8 SEPARATE 2D face slabs + 8 SCALAR DMA semaphores: a single 3D
        # slot scratch with a semaphore array faulted at runtime on real
        # hardware in round 3 (kept from that bisect).
        fbufs, fsems = scr[0:FANOUT], scr[FANOUT:2 * FANOUT]
        sm_h, sm_s, sm_c = (scr[2 * FANOUT], scr[2 * FANOUT + 1],
                            scr[2 * FANOUT + 2])
        # rays_ref block: (1, 8, LANES) — rows 0-6 are ox oy oz dx dy dz
        # t_cull (row 7 pad).  Row slices give (1, LANES) planes.
        o = Vec3(rays_ref[0, 0:1, :], rays_ref[0, 1:2, :], rays_ref[0, 2:3, :])
        d = Vec3(rays_ref[0, 3:4, :], rays_ref[0, 4:5, :], rays_ref[0, 5:6, :])
        t_ub = rays_ref[0, 6:7, :]
        inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)

        # Running state in VMEM scratch (rows: t_run, p.xyz, n.xyz,
        # mat-as-f32, winner-cluster-as-f32) so the descent is pure
        # `pl.when` predication — no value-carrying conds.
        zero = jnp.zeros_like(t_ub)
        state[0:1, :] = t_ub
        for r in range(1, 7):
            state[r:r + 1, :] = zero
        state[7:8, :] = zero - 1.0
        state[8:9, :] = zero - _INF     # winner cluster; -inf = "none yet"

        def batch_entries(b_ref, base):
            """Liveness + per-sibling min entry for rows [base, base+8).

            Returns 8 scalar entry distances (+inf where no lane is live):
            one (8, LANES) vectorized slab test, then one (1, LANES)->
            scalar reduce per sibling (Mosaic lowers whole-row reduces to
            scalars; element extraction from a computed vector does not
            lower).
            """
            rows = b_ref[pl.ds(base, FANOUT), :]
            tmin, tmax = _slab_entry(rows, o, inv)
            entry = jnp.maximum(tmin, 0.0)
            live = (tmax >= tmin) & (tmax >= 0.0) & (entry < state[0:1, :])
            masked = jnp.where(live, entry, _INF)        # (8, LANES)
            return [jnp.min(masked[c:c + 1, :]) for c in range(FANOUT)]

        def cluster_dma(k, slot):
            return pltpu.make_async_copy(
                faces_ref.at[pl.ds(k * CLUSTER, CLUSTER), :],
                fbufs[slot], fsems[slot])

        def mt_cluster(slot, k):
            """One (CLUSTER, LANES) Moller-Trumbore block + one-hot winner.

            Identical math to mesh_intersect_v's scan_body (faces on
            sublanes, first-minimal face wins, point via rotated
            barycentrics / normal via standard, intersections.h:166-168).
            The cross-cluster merge replicates the scan's ascending-k
            iteration: strictly smaller t wins; an exact f32 t-tie goes to
            the smaller cluster index.  (-inf "none yet" sentinel makes a
            tie against the t_cull seed lose, as it must: the scene merge
            takes the mesh only on strict <, ops/intersect.py.)
            """
            t_run = state[0:1, :]
            k_run = state[8:9, :]
            vb = fbufs[slot][:]                              # (32, 128)
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
            k_f = jnp.full_like(t_run, 0.0) + k.astype(jnp.float32)
            better = (tmin < t_run) | ((tmin == t_run) & (k_f < k_run)
                                       & (tmin < _INF))

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
                    sel(n_full.x), sel(n_full.y), sel(n_full.z), m_c, k_f)
            for r, val in enumerate(news):
                state[r:r + 1, :] = jnp.where(better, val, state[r:r + 1, :])

        def sorted_to_smem(sm, b_ref, base):
            """Sort the 8 children at ``base`` front-to-back into SMEM.

            sm[i] = child index (0-7) of the i-th nearest sibling,
            sm[8+i] = 1 if that sibling has any live lane.  Writing the
            order to SMEM lets every level's visit loop be a DYNAMIC
            ``fori_loop`` — each level's body is inlined exactly once
            (a statically-unrolled pl.when chain would inline the whole
            subtree 8x per level: 512 MT blocks, unbuildable).
            """
            ents = batch_entries(b_ref, base)
            vals, idx = _sort8(ents)
            for i in range(FANOUT):
                sm[i] = idx[i]
                sm[FANOUT + i] = (vals[i] < _INF).astype(jnp.int32)

        def clusters_of(s):
            """Visit the live clusters of super ``s`` front-to-back.

            The visit sequence is statically unrolled (the only such level:
            the MT block appears 8x in the program, once per sorted
            position, because supers/hypers above iterate DYNAMICALLY) so
            every DMA uses a *static* slot index.  DMAs start ``PIPELINE``
            siblings ahead of the MT consuming them; both the start and
            the MT re-test liveness against the then-current t_run, so a
            near cluster's hit culls its occluded siblings' arithmetic
            (always) and their fetches (beyond the lookahead).  A start's
            predicate is captured so its wait matches exactly.
            """
            base = s * FANOUT
            ents = batch_entries(cb_ref, base)
            vals, idx = _sort8(ents)

            def start(i):
                k = base + idx[i]
                pred = vals[i] < _INF
                live = _slab_live(cb_ref[pl.ds(k, 1), :], o, inv,
                                  state[0:1, :])
                pred = pred & jnp.any(live)
                # Predicates that GUARD A DMA go through an SMEM round
                # trip (r3 bisect: every on-hardware failure predicated a
                # DMA directly on a vector-reduce result; every passing
                # variant staged the predicate through scalar memory
                # first).  Also gives the wait the exact start predicate.
                sm_c[i] = pred.astype(jnp.int32)

                @pl.when(sm_c[i] != 0)
                def _():
                    cluster_dma(k, i).start()

            for i in range(min(PIPELINE, FANOUT)):
                start(i)
            for i in range(FANOUT):
                if i + PIPELINE < FANOUT:
                    start(i + PIPELINE)

                @pl.when(sm_c[i] != 0)
                def _(i=i):
                    k = base + idx[i]
                    cluster_dma(k, i).wait()
                    live2 = _slab_live(cb_ref[pl.ds(k, 1), :], o, inv,
                                       state[0:1, :])
                    sm_c[FANOUT + i] = jnp.any(live2).astype(jnp.int32)

                    @pl.when(sm_c[FANOUT + i] != 0)
                    def _():
                        mt_cluster(i, k)

        def supers_of(h):
            """Descend the live supers of hyper ``h`` front-to-back."""
            base = h * FANOUT
            sorted_to_smem(sm_s, sb_ref, base)

            def visit(i, _):
                @pl.when(sm_s[FANOUT + i] != 0)
                def _():
                    clusters_of(base + sm_s[i])
                return 0
            jax.lax.fori_loop(0, FANOUT, visit, 0)

        def hyper_batch(bi, _):
            sorted_to_smem(sm_h, hb_ref, bi * FANOUT)

            def visit(i, _):
                @pl.when(sm_h[FANOUT + i] != 0)
                def _():
                    supers_of(bi * FANOUT + sm_h[i])
                return 0
            jax.lax.fori_loop(0, FANOUT, visit, 0)
            return 0

        # Whole-mesh root gate: dead subtiles (every lane culled by t_cull
        # or aimed away) pay one (1, LANES) slab test and exit.  The gate
        # predicate transitively guards DMAs -> SMEM round trip (above).
        root_live = _slab_live(root_ref[0:1, :], o, inv, state[0:1, :])
        sm_c[2 * FANOUT] = jnp.any(root_live).astype(jnp.int32)

        @pl.when(sm_c[2 * FANOUT] != 0)
        def _():
            jax.lax.fori_loop(0, n_hyper_batches, hyper_batch, 0)

        mid = state[7:8, :]
        # winner normal normalized once (mesh_intersect_v)
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
def _mesh_bvh_call_v3(bvh: MeshBVH, rays: jnp.ndarray, interpret: bool):
    """rays: (nT, 8, LANES) rows [ox oy oz dx dy dz t_cull pad] -> out."""
    n_tiles = rays.shape[0]
    assert bvh.n_hypers % FANOUT == 0, bvh.n_hypers
    kernel = _build_kernel(bvh.n_hypers // FANOUT)
    # Root box = union of the REAL (widened) hyper boxes; padding rows are
    # dead-box encoded (ops/bvh.py _DEAD_ROW) and must be excluded from the
    # union or they'd blow it up to the whole universe.  Stored as 8
    # identical rows — a full (8, 8) f32 sublane tile; the kernel reads
    # row 0.
    hr = bvh.hyper_bounds[:bvh.n_hypers_real]
    root = jnp.tile(jnp.concatenate([
        jnp.min(hr[:, 0:3], axis=0),
        jnp.max(hr[:, 3:6], axis=0),
        jnp.zeros((2,), jnp.float32)]).reshape(1, 8), (8, 1))
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # Faces explicitly in HBM (mesh size stays HBM-bound).
            pl.BlockSpec(memory_space=pltpu.ANY if not hasattr(pltpu, "HBM")
                         else pltpu.HBM),
            vmem(), vmem(), vmem(), vmem(),         # bounds tables + root
        ],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, LANES), jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((16, LANES), jnp.float32)]           # running state
            + [pltpu.VMEM((CLUSTER, 128), jnp.float32)       # 8 face slabs
               for _ in range(FANOUT)]
            + [pltpu.SemaphoreType.DMA(()) for _ in range(FANOUT)]
            + [pltpu.SMEM((2 * FANOUT,), jnp.int32),  # hyper visit order
               pltpu.SMEM((2 * FANOUT,), jnp.int32),  # super visit order
               pltpu.SMEM((2 * FANOUT + 1,), jnp.int32)]  # DMA predicates
        ),
        interpret=interpret,
    )(rays, bvh.faces_packed,
      bvh.cluster_bounds, bvh.super_bounds, bvh.hyper_bounds, root)
    return out


def mesh_intersect_bvh_v3(bvh: MeshBVH, o: Vec3, d: Vec3,
                          t_cull: Optional[jnp.ndarray] = None,
                          interpret: bool = False
                          ) -> Tuple[jnp.ndarray, Vec3, Vec3, jnp.ndarray]:
    """Closest mesh hit via the v3 front-to-back kernel.

    Same contract as ops/intersect.py:mesh_intersect_v: returns
    (t, point, normal, material_id) planes with t=+inf / mat=-1 on miss.

    ``t_cull``: per-ray upper bound on useful hits (the analytic-geom best
    t; the merge in intersect_scene_v requires the mesh to win *strictly*,
    so pruning hits >= t_cull is exact).  Use -inf to skip a ray entirely
    (dead lanes), +inf (default) for an unbounded query.
    """
    if bvh.num_faces > MAX_KERNEL_FACES:
        raise ValueError(
            f"mesh has {bvh.num_faces} faces > MAX_KERNEL_FACES="
            f"{MAX_KERNEL_FACES}: the VMEM-resident bounds tables would "
            "blow the budget (raise the cap only with a deeper hierarchy)")
    n = o.x.shape[0]
    n_tiles = -(-n // LANES)
    pad = n_tiles * LANES - n

    def padded(x, fill):
        x = x.astype(jnp.float32)
        return jnp.pad(x, (0, pad), constant_values=fill) if pad else x

    tc = t_cull if t_cull is not None else jnp.full((n,), _INF)
    zrow = jnp.zeros((n_tiles * LANES,), jnp.float32)
    rays = jnp.stack([
        padded(o.x, 0.0), padded(o.y, 0.0), padded(o.z, 0.0),
        padded(d.x, 1.0), padded(d.y, 1.0), padded(d.z, 1.0),
        padded(tc, -_INF),                      # padding lanes: cull all
        zrow,
    ]).reshape(8, n_tiles, LANES).swapaxes(0, 1)

    out = _mesh_bvh_call_v3(bvh, rays, interpret)
    flat = out.swapaxes(0, 1).reshape(8, -1)[:, :n]
    mat = flat[7].astype(jnp.int32)
    return (flat[0], Vec3(flat[1], flat[2], flat[3]),
            Vec3(flat[4], flat[5], flat[6]), mat)
