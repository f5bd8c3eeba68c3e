"""Pallas TPU mesh kernel v2p: v2's traversal + pipelined cluster DMA.

Exactly the proven v2 descent (index-order, tile-wide any-gating,
render/mesh_kernel.py) with ONE change: when a super's 8 child clusters
are visited, their liveness is tested as a single (8, LANES) batched slab
test and every live cluster's (32, 128) face slab is DMA-started into its
own VMEM slot BEFORE the first Moller-Trumbore block runs — the fetch
latency of clusters c+1..7 overlaps cluster c's arithmetic, where v2
serializes start->wait->MT per cluster.  The statue's primary-ray cost is
dominated by exactly that serial DMA latency (86.8 ms at depth 1, r4
measurements).

Each cluster is RE-tested against the running t just before its MT block
(the earlier siblings' hits tighten t_run), skipping the arithmetic —
conservative only, so results remain bitwise-equal to the dense scan:
visits stay in ascending cluster order and the merge keeps v2's strict-<
rule (first-minimal cluster wins ties, the scan's semantics).

``subtile=True`` ("v2s") additionally gates each cluster's MT block per
128-lane column on that column's own slab liveness.  Measured on
hardware (r4): SLOWER than plain v2p on the sorted statue workload
(3.5 s vs 2.5-2.6 s/frame) — the octant/cell sort packs live rays
densely, so whole tiles are live and the extra per-column slab tests
and predicates buy nothing.  Kept as a verified experiment point (it
would win on UNSORTED sparse workloads) and exercised by tests.

Reference anchor: the per-ray brute-force loop it replaces,
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
from .mesh_kernel import LANES, MAX_KERNEL_FACES, _slab_live

_INF = np.float32(np.inf)


def _slab_live_batch(rows, o: Vec3, inv: Vec3, t_run):
    """(8, 8) AABB rows vs the ray tile -> (8, LANES) liveness."""
    shape = (rows.shape[0], o.x.shape[-1])
    tmin = jnp.full(shape, -_INF)
    tmax = jnp.full(shape, _INF)
    for axis, (oc, ic) in enumerate(((o.x, inv.x), (o.y, inv.y), (o.z, inv.z))):
        t1 = (rows[:, axis:axis + 1] - oc) * ic
        t2 = (rows[:, axis + 3:axis + 4] - oc) * ic
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        lo = jnp.where(jnp.isnan(lo), -_INF, lo)   # conservative (v2 note)
        hi = jnp.where(jnp.isnan(hi), _INF, hi)
        tmin = jnp.maximum(tmin, lo)
        tmax = jnp.minimum(tmax, hi)
    return (tmax >= tmin) & (tmax >= 0.0) & (jnp.maximum(tmin, 0.0) < t_run)


def _build_kernel(n_hypers: int, lanes: int, subtile: bool):
    n_sub = lanes // 128 if subtile else 1
    sub_w = lanes // n_sub

    def kernel(rays_ref, faces_ref, cb_ref, sb_ref, hb_ref, out_ref,
               state, *scr):
        fbufs, fsems = scr[0:FANOUT], scr[FANOUT:2 * FANOUT]
        smp = scr[2 * FANOUT]                    # SMEM DMA predicates
        o = Vec3(rays_ref[0, 0:1, :], rays_ref[0, 1:2, :], rays_ref[0, 2:3, :])
        d = Vec3(rays_ref[0, 3:4, :], rays_ref[0, 4:5, :], rays_ref[0, 5:6, :])
        t_ub = rays_ref[0, 6:7, :]
        inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)

        zero = jnp.zeros_like(t_ub)
        state[0:1, :] = t_ub
        for r in range(1, 7):
            state[r:r + 1, :] = zero
        state[7:8, :] = zero - 1.0

        def mt_cluster(slot, k, sub):
            """(CLUSTER, sub_w) MT block on lane slice ``sub`` — v2's math.

            ``sub`` picks a static 128-lane column slice; with subtile
            gating only the slices that actually want cluster ``k`` pay
            the arithmetic.  The math per lane is identical to the full-
            width block (elementwise in the lane axis), so gating
            granularity never changes results.
            """
            a, b = sub * sub_w, (sub + 1) * sub_w
            # Lane-offset slices of COMPUTED vectors don't lower (Mosaic
            # 'invalid input layout'); slice the refs instead — static
            # ref offsets lower fine.
            o_s = Vec3(rays_ref[0, 0:1, a:b], rays_ref[0, 1:2, a:b],
                       rays_ref[0, 2:3, a:b])
            d_s = Vec3(rays_ref[0, 3:4, a:b], rays_ref[0, 4:5, a:b],
                       rays_ref[0, 5:6, a:b])
            t_run = state[0:1, a:b]
            vb = fbufs[slot][:]                              # (32, 128)
            v0 = Vec3(vb[:, 0:1], vb[:, 1:2], vb[:, 2:3])
            v1 = Vec3(vb[:, 3:4], vb[:, 4:5], vb[:, 5:6])
            v2_ = Vec3(vb[:, 6:7], vb[:, 7:8], vb[:, 8:9])
            t, u, w_, hit = _triangle_t(v0, v1, v2_, o_s, d_s)
            t = jnp.where(hit & (t > 0.0), t, _INF)
            tmin = jnp.min(t, axis=0, keepdims=True)
            ismin = t == tmin
            rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
            cand = jnp.where(ismin, rows, jnp.int32(CLUSTER))
            first = rows == jnp.min(cand, axis=0, keepdims=True)
            better = tmin < t_run        # strict: earlier cluster keeps ties

            n0 = Vec3(vb[:, 9:10], vb[:, 10:11], vb[:, 11:12])
            n1 = Vec3(vb[:, 12:13], vb[:, 13:14], vb[:, 14:15])
            n2 = Vec3(vb[:, 15:16], vb[:, 16:17], vb[:, 17:18])
            v = 1.0 - u - w_
            p_full = v0 * u + v1 * w_ + v2_ * v
            n_full = n0 * v + n1 * u + n2 * w_

            def sel(a_):
                return jnp.sum(jnp.where(first, a_, 0.0), axis=0,
                               keepdims=True)

            mb = vb[:, 18:19]
            m_c = jnp.sum(jnp.where(first, mb, 0.0), axis=0, keepdims=True)
            news = (tmin, sel(p_full.x), sel(p_full.y), sel(p_full.z),
                    sel(n_full.x), sel(n_full.y), sel(n_full.z), m_c)
            for r, val in enumerate(news):
                state[r:r + 1, a:b] = jnp.where(better, val,
                                                state[r:r + 1, a:b])

        def clusters_of(s):
            """Visit super ``s``'s live clusters, DMAs all started first.

            Static unroll (8 start + 8 wait/MT sites) so every DMA slot
            index is static; predicates staged through SMEM (the r3
            hardening: DMAs guarded directly on vector-reduce results
            faulted on hardware).  With ``subtile``, each 128-lane column
            gates its own MT block on its own liveness — the kernel is
            MT-flop-bound (cluster-size sweeps are flat), so skipping
            dead columns cuts the dominant cost directly.
            """
            base = s * FANOUT
            live8 = _slab_live_batch(cb_ref[pl.ds(base, FANOUT), :], o, inv,
                                     state[0:1, :])          # (8, LANES)
            for c in range(FANOUT):
                smp[c] = jnp.any(live8[c:c + 1, :]).astype(jnp.int32)

                @pl.when(smp[c] != 0)
                def _(c=c):
                    pltpu.make_async_copy(
                        faces_ref.at[pl.ds((base + c) * CLUSTER, CLUSTER), :],
                        fbufs[c], fsems[c]).start()
            for c in range(FANOUT):
                @pl.when(smp[c] != 0)
                def _(c=c):
                    pltpu.make_async_copy(
                        faces_ref.at[pl.ds((base + c) * CLUSTER, CLUSTER), :],
                        fbufs[c], fsems[c]).wait()
                    # re-test: earlier siblings may have tightened t_run.
                    # In subtile mode each 128-lane column runs its OWN
                    # slab test on ref slices (lane-offset slices of
                    # computed vectors and (1,L)->(n,128) reshapes both
                    # fail to lower in Mosaic) — same total flops as one
                    # full-width test.
                    for sub in range(n_sub):
                        a, b = sub * sub_w, (sub + 1) * sub_w
                        o_s = Vec3(rays_ref[0, 0:1, a:b],
                                   rays_ref[0, 1:2, a:b],
                                   rays_ref[0, 2:3, a:b])
                        d_s = Vec3(rays_ref[0, 3:4, a:b],
                                   rays_ref[0, 4:5, a:b],
                                   rays_ref[0, 5:6, a:b])
                        inv_s = Vec3(1.0 / d_s.x, 1.0 / d_s.y, 1.0 / d_s.z)
                        live2 = _slab_live(cb_ref[pl.ds(base + c, 1), :],
                                           o_s, inv_s, state[0:1, a:b])
                        smp[FANOUT + c * n_sub + sub] = jnp.any(
                            live2).astype(jnp.int32)

                        @pl.when(smp[FANOUT + c * n_sub + sub] != 0)
                        def _(c=c, sub=sub):
                            mt_cluster(c, base + c, sub)

        def supers_of(h, j):
            s = h * FANOUT + j
            live = _slab_live(sb_ref[pl.ds(s, 1), :], o, inv, state[0:1, :])

            @pl.when(jnp.any(live))
            def _():
                clusters_of(s)
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
        nrm = Vec3(state[4:5, :], state[5:6, :], state[6:7, :]).normalized_safe()
        found = mid >= 0.0
        out_ref[0, 0:1, :] = jnp.where(found, state[0:1, :], _INF)
        out_ref[0, 1:2, :] = state[1:2, :]
        out_ref[0, 2:3, :] = state[2:3, :]
        out_ref[0, 3:4, :] = state[3:4, :]
        out_ref[0, 4:5, :] = nrm.x
        out_ref[0, 5:6, :] = nrm.y
        out_ref[0, 6:7, :] = nrm.z
        out_ref[0, 7:8, :] = mid

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "subtile"))
def _mesh_bvh_call_v2p(bvh: MeshBVH, rays: jnp.ndarray, interpret: bool,
                       subtile: bool = False):
    n_tiles, _, lanes = rays.shape
    kernel = _build_kernel(bvh.n_hypers, lanes, subtile)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY if not hasattr(pltpu, "HBM")
                         else pltpu.HBM),
            vmem(), vmem(), vmem(),
        ],
        out_specs=pl.BlockSpec((1, 8, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, lanes), jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((8, lanes), jnp.float32)]
            + [pltpu.VMEM((CLUSTER, 128), jnp.float32)
               for _ in range(FANOUT)]
            + [pltpu.SemaphoreType.DMA(()) for _ in range(FANOUT)]
            + [pltpu.SMEM((FANOUT + FANOUT * max(1, lanes // 128),),
                          jnp.int32)]
        ),
        interpret=interpret,
    )(rays, bvh.faces_packed,
      bvh.cluster_bounds, bvh.super_bounds, bvh.hyper_bounds)
    return out


def mesh_intersect_bvh_v2p(bvh: MeshBVH, o: Vec3, d: Vec3,
                           t_cull: Optional[jnp.ndarray] = None,
                           interpret: bool = False,
                           lanes: Optional[int] = None,
                           subtile: bool = False,
                           ) -> Tuple[jnp.ndarray, Vec3, Vec3, jnp.ndarray]:
    """v2p closest-hit query; contract identical to mesh_intersect_bvh.

    ``subtile``: gate each cluster's MT block per 128-lane column on that
    column's own liveness (bitwise-identical; cuts MT flops on
    incoherent, sorted ray batches)."""
    if getattr(bvh, "cluster", CLUSTER) != CLUSTER:
        raise ValueError(
            f"bvh built with cluster={bvh.cluster} but kernel compiled "
            f"for CLUSTER={CLUSTER} (APTD_BVH_CLUSTER mismatch)")
    if bvh.num_faces > MAX_KERNEL_FACES:
        raise ValueError(f"mesh has {bvh.num_faces} faces > "
                         f"{MAX_KERNEL_FACES}")
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
        padded(tc, -_INF),
        zrow,
    ]).reshape(8, n_tiles, lanes).swapaxes(0, 1)

    out = _mesh_bvh_call_v2p(bvh, rays, interpret, subtile)
    flat = out.swapaxes(0, 1).reshape(8, -1)[:, :n]
    mat = flat[7].astype(jnp.int32)
    return (flat[0], Vec3(flat[1], flat[2], flat[3]),
            Vec3(flat[4], flat[5], flat[6]), mat)
