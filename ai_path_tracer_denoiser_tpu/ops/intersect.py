"""Ray/primitive intersection ops — fully vectorized, branch-free JAX.

Behavioral ports of intersections.h (box slab test :52-94, sphere quadratic
:106-148, glm one-sided Moller-Trumbore triangle :159-172, ray/AABB slab
:175-200), reshaped for the TPU.  Instead of one thread per ray looping over
primitives, every function evaluates a whole ray batch against primitives as
dense array math, and running minima pick the winner.

The compute core is **structure-of-arrays** (``Vec3`` of ``(N,)`` planes,
see ops/vec3.py): every transform, slab divide, dot and cross is full-width
f32 VPU elementwise arithmetic.  This is both ~100x faster on TPU than the
AoS ``(N, 3)`` formulation (which XLA mis-tiles and routes through bf16 MXU
passes, breaking thin-slab hit tests) and exactly matches the reference's
scalar f32 semantics.  The original AoS entry points are kept as thin
wrappers for tests and external callers.

The scene-level ``intersect_scene`` mirrors computeIntersections
(pathtrace.cu:200-306): analytic geoms first (first minimal t wins), then the
mesh gated by a per-ray AABB test, with the mesh winning only on strictly
smaller t.

Reference quirks preserved on purpose (see SURVEY.md §7):
  * the triangle test returns barycentric z as t with no epsilon backoff
    (intersections.h:170),
  * the triangle intersection point uses the reference's rotated barycentric
    convention x*v0 + y*v1 + (1-x-y)*v2 (intersections.h:166) while the
    normal uses the standard one (intersections.h:168).
One quirk is fixed: the reference's ``is_inside`` comes from whichever geom
was tested *last*, not the winner (pathtrace.cu:239-243 overwrite `outside`
unconditionally); it is also never consumed.  We record the winner's.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..scene.structs import CUBE, SPHERE, Geoms, MeshData
from .vec3 import Vec3, reflect, where as vwhere, xform_dir, xform_point

import numpy as np

_EPS_POINT = 1e-4       # getPointOnRay backoff (intersections.h:27-29)
# numpy scalars (not jnp) so they inline as literals inside Pallas kernels
_FLT_EPS = np.float32(1.1920929e-07)
_BIG = np.float32(1e38)


# ---------------------------------------------------------------------------
# Unit-cube slab test (intersections.h:52-94) — SoA core
# ---------------------------------------------------------------------------

def box_intersect_v(transform, inverse_transform, o: Vec3, d: Vec3):
    """Ray planes vs one transformed unit cube.

    Returns (t, point, normal, outside): t is the *world-space* distance
    (length(origin - hit)), -1 on miss.  All outputs are planes/Vec3.
    """
    qo = xform_point(inverse_transform, o)
    qd = xform_dir(inverse_transform, d).normalized()

    # Per-axis slab intervals; IEEE inf on axis-parallel rays, exactly like
    # the reference's unguarded divides (intersections.h:64-66).
    axes = []
    for q_o, q_d in ((qo.x, qd.x), (qo.y, qd.y), (qo.z, qd.z)):
        t1 = (-0.5 - q_o) / q_d
        t2 = (0.5 - q_o) / q_d
        ta = jnp.minimum(t1, t2)
        tb = jnp.maximum(t1, t2)
        sign = jnp.where(t2 < t1, 1.0, -1.0)
        axes.append((jnp.where(ta > 0, ta, -_BIG), tb, sign))
    (ta0, tb0, s0), (ta1, tb1, s1), (ta2, tb2, s2) = axes
    tmin = jnp.maximum(jnp.maximum(ta0, ta1), ta2)
    tmax = jnp.minimum(jnp.minimum(tb0, tb1), tb2)

    # First-wins argmax/argmin over the 3 axes as elementwise selects
    # (replaces one_hot + take_along_axis — gathers are the TPU killer).
    a0 = ta0 >= tmin
    a1 = (~a0) & (ta1 >= tmin)
    a2 = ~(a0 | a1)
    n_min = Vec3(jnp.where(a0, s0, 0.0), jnp.where(a1, s1, 0.0),
                 jnp.where(a2, s2, 0.0))
    b0 = tb0 <= tmax
    b1 = (~b0) & (tb1 <= tmax)
    b2 = ~(b0 | b1)
    n_max = Vec3(jnp.where(b0, s0, 0.0), jnp.where(b1, s1, 0.0),
                 jnp.where(b2, s2, 0.0))

    hit = (tmax >= tmin) & (tmax > 0)
    inside = tmin <= 0
    t_obj = jnp.where(inside, tmax, tmin)
    n_obj = vwhere(inside, n_max, n_min)

    obj_point = qo + qd * (t_obj - _EPS_POINT)
    point = xform_point(transform, obj_point)
    normal = xform_dir(transform, n_obj).normalized()
    t = jnp.where(hit, (o - point).norm(), -1.0)
    return t, point, normal, ~inside


# ---------------------------------------------------------------------------
# Unit-sphere quadratic (intersections.h:106-148) — SoA core
# ---------------------------------------------------------------------------

def sphere_intersect_v(transform, inverse_transform, inv_transpose,
                       o: Vec3, d: Vec3):
    """Ray planes vs one transformed radius-0.5 sphere (world-distance t)."""
    ro = xform_point(inverse_transform, o)
    rd = xform_dir(inverse_transform, d).normalized()

    v_dot_d = ro.dot(rd)
    radicand = v_dot_d * v_dot_d - (ro.dot(ro) - 0.25)
    sq = jnp.sqrt(jnp.maximum(radicand, 0.0))
    t1 = -v_dot_d + sq
    t2 = -v_dot_d - sq

    both_neg = (t1 < 0) & (t2 < 0)
    both_pos = (t1 > 0) & (t2 > 0)
    t_obj = jnp.where(both_pos, jnp.minimum(t1, t2), jnp.maximum(t1, t2))
    outside = both_pos
    hit = (radicand >= 0) & ~both_neg

    obj_point = ro + rd * (t_obj - _EPS_POINT)
    point = xform_point(transform, obj_point)
    normal = xform_dir(inv_transpose, obj_point).normalized()
    normal = vwhere(outside, normal, -normal)
    t = jnp.where(hit, (o - point).norm(), -1.0)
    return t, point, normal, outside


# ---------------------------------------------------------------------------
# Scene-level analytic intersection — unrolled running-min over geoms
# ---------------------------------------------------------------------------

def intersect_geoms_v(geoms: Geoms, o: Vec3, d: Vec3,
                      types: Optional[Tuple[int, ...]] = None):
    """All rays vs all analytic geoms; min-t with first-geom tie-break.

    The per-thread ``t_min > t`` loop of computeIntersections
    (pathtrace.cu:230-254) becomes a python-unrolled running minimum — G
    where-selects over full planes, no argmin/gather.  ``types`` (static
    SPHERE/CUBE per geom) defaults to ``geoms.type_tuple``; if unavailable,
    both tests run per geom and a traced select picks one.
    """
    if types is None:
        types = geoms.type_tuple or None
    g_count = geoms.transform.shape[0]

    t_best = jnp.full_like(o.x, jnp.inf)
    p_best = Vec3.full_like(o.x, 0.0)
    n_best = Vec3.full_like(o.x, 0.0)
    out_best = jnp.zeros(o.x.shape, bool)
    mat_best = jnp.full(o.x.shape, -1, jnp.int32)

    for i in range(g_count):
        m = geoms.transform[i]
        inv = geoms.inverse_transform[i]
        if types is not None:
            if types[i] == CUBE:
                t, p, n, out = box_intersect_v(m, inv, o, d)
            else:
                t, p, n, out = sphere_intersect_v(
                    m, inv, geoms.inv_transpose[i], o, d)
        else:
            tb_, pb_, nb_, ob_ = box_intersect_v(m, inv, o, d)
            ts_, ps_, ns_, os_ = sphere_intersect_v(
                m, inv, geoms.inv_transpose[i], o, d)
            is_cube = geoms.type[i] == CUBE
            t = jnp.where(is_cube, tb_, ts_)
            p = vwhere(is_cube, pb_, ps_)
            n = vwhere(is_cube, nb_, ns_)
            out = jnp.where(is_cube, ob_, os_)
        t = jnp.where(t > 0.0, t, jnp.inf)
        better = t < t_best            # strict: first geom wins ties
        t_best = jnp.where(better, t, t_best)
        p_best = vwhere(better, p, p_best)
        n_best = vwhere(better, n, n_best)
        out_best = jnp.where(better, out, out_best)
        mat_best = jnp.where(better, geoms.material_id[i], mat_best)
    return t_best, p_best, n_best, out_best, mat_best


# ---------------------------------------------------------------------------
# Triangle mesh: chunked Moller-Trumbore + winner re-intersection
# ---------------------------------------------------------------------------

def _triangle_t(v0: Vec3, v1: Vec3, v2: Vec3, o: Vec3, d: Vec3):
    """(N,) rays x (F,) faces -> (N, F) Moller-Trumbore (glm convention).

    Ray planes enter with shape (N, 1), face planes with (1, F); every
    product below broadcasts to a dense (N, F) tile.  Returns (t, u, w, hit)
    with t = ray parameter (== distance for unit d), matching
    triangleIntersectionTest's epsilon-free result (intersections.h:159-172).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    p = d.cross(e2)
    a = e1.dot(p)
    front = a >= _FLT_EPS                      # glm: a < eps -> miss
    f = 1.0 / a
    s = o - v0
    u = f * s.dot(p)
    q = s.cross(e1)
    w = f * d.dot(q)
    t = f * e2.dot(q)
    hit = front & (u >= 0) & (u <= 1) & (w >= 0) & (u + w <= 1) & (t >= 0)
    return t, u, w, hit


def mesh_intersect_v(mesh: MeshData, o: Vec3, d: Vec3, chunk: int = 16):
    """Closest mesh hit for a ray batch: single-phase, zero-gather scan.

    Two TPU decisions drive the structure:

    1. **Faces on sublanes, rays on lanes.**  Each scan step broadcasts a
       (chunk, 1) face block against (1, N) ray planes into (chunk, N)
       tiles, then sublane-reduces.  With ``chunk`` small (16) the live
       intermediates stay a few MB regardless of mesh size; the transposed
       ((N, chunk), lanes=faces) layout materializes N x chunk tiles per
       attribute — gigabytes in flight at 800x800, measured ~10^4x slower
       and faulting the device.
    2. **No gathers.**  A per-ray "fetch the winning face's attributes"
       gather costs ~4.5 ms per plane on TPU (scalar path) — 18 of them per
       bounce dwarfed everything else.  Instead the winner's barycentric
       point/normal/material are computed *inside* each scan step via a
       (chunk, N) one-hot masked reduction and carried as finished (N,)
       planes; cross-chunk winners resolve with the same running-min select
       as the per-geom loop.

    This is the reference's per-thread running ``t_min`` loop
    (pathtrace.cu:259-268) turned inside out.  Point/normal conventions
    follow intersections.h:166-168 (rotated barycentrics for the point,
    standard for the normal).
    """
    n_rays = o.x.shape[0]
    # Scan only real faces (sliced/padded to a chunk multiple) — the storage
    # padding (128-multiple) would otherwise cost up to 6x wasted steps on
    # small meshes.
    f_real = max(mesh.num_faces, 1)
    chunk = min(chunk, -(-f_real // 8) * 8)
    n_chunks = (f_real + chunk - 1) // chunk
    pad_to = n_chunks * chunk

    def pad0(x):
        if x.shape[0] >= pad_to:
            return x[:pad_to]
        cfg = [(0, pad_to - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg)

    verts = pad0(mesh.vertices)                # (Fp, 3, 3)
    norms = pad0(mesh.normals)
    valid = pad0(mesh.valid)
    mat_ids = pad0(mesh.material_id)
    o2 = Vec3(o.x[None, :], o.y[None, :], o.z[None, :])   # (1, N)
    d2 = Vec3(d.x[None, :], d.y[None, :], d.z[None, :])
    rows = jnp.arange(chunk, dtype=jnp.int32)[:, None]    # (chunk, 1)

    def face_planes(arr, corner):
        # (chunk,) attribute planes -> (chunk, 1) for broadcasting vs (1, N)
        return Vec3(arr[:, corner, 0][:, None], arr[:, corner, 1][:, None],
                    arr[:, corner, 2][:, None])

    def scan_body(carry, xs):
        t_min, p_min, n_min, m_min = carry
        vs, ns, ok, mid = xs
        v0, v1, v2 = (face_planes(vs, c) for c in range(3))
        t, u, w, hit = _triangle_t(v0, v1, v2, o2, d2)     # (chunk, N)
        t = jnp.where(hit & ok[:, None] & (t > 0.0), t, jnp.inf)
        j = jnp.argmin(t, axis=0)                 # sublane reduce -> (N,)
        t_c = jnp.min(t, axis=0)
        onehot = rows == j[None, :]               # (chunk, N)

        def sel(a):                               # (chunk, N) -> (N,)
            return jnp.sum(jnp.where(onehot, a, 0.0), axis=0)

        # Point/normal evaluated at full (chunk, N) width, then ONE masked
        # reduction per component — fewer ops than selecting u/w + 18 face
        # attributes and recombining at (N,) width.
        # intersections.h:166: rotated barycentrics for the point;
        # intersections.h:168: standard barycentrics for the normal.
        n0, n1, n2 = (face_planes(ns, c) for c in range(3))
        v = 1.0 - u - w
        p_full = v0 * u + v1 * w + v2 * v
        n_full = n0 * v + n1 * u + n2 * w
        p_c = Vec3(sel(p_full.x), sel(p_full.y), sel(p_full.z))
        n_c = Vec3(sel(n_full.x), sel(n_full.y), sel(n_full.z))
        m_c = jnp.sum(jnp.where(onehot, mid[:, None], 0), axis=0,
                      dtype=jnp.int32)

        better = t_c < t_min
        return (jnp.where(better, t_c, t_min),
                vwhere(better, p_c, p_min),
                vwhere(better, n_c, n_min),
                jnp.where(better, m_c, m_min)), None

    init = (jnp.full((n_rays,), jnp.inf),
            Vec3.full_like(o.x, 0.0), Vec3.full_like(o.x, 0.0),
            jnp.full((n_rays,), -1, jnp.int32))
    if n_chunks == 1:
        carry, _ = scan_body(init, (verts, norms, valid, mat_ids))
    else:
        xs = (verts.reshape(n_chunks, chunk, 3, 3),
              norms.reshape(n_chunks, chunk, 3, 3),
              valid.reshape(n_chunks, chunk),
              mat_ids.reshape(n_chunks, chunk))
        carry, _ = jax.lax.scan(scan_body, init, xs)
    t_min, point, normal, mat = carry
    normal = normal.normalized_safe()
    mat = jnp.where(jnp.isfinite(t_min), mat, -1)
    return t_min, point, normal, mat


def ray_aabb_intersect_v(o: Vec3, d: Vec3, lb, ub) -> jnp.ndarray:
    """Slab AABB test (intersections.h:175-200) over ray planes -> bool.

    NaN note (0 * inf when the origin sits exactly on a bound with a zero
    direction component): jnp's NaN-propagating min/max makes the result
    False.  The reference's fminf/fmaxf *drop* NaN instead, but in every
    NaN-producing case its accumulators still end at +-inf and the ray is
    culled too — outcomes are identical, so plain jnp min/max is kept.
    The BVH traversal gate (render/mesh_kernel.py:_slab_live) must be
    *more* careful: it cannot cull on NaN at all, because the dense scan
    it must match bitwise has no per-cluster gates.
    """
    tmin = jnp.full_like(o.x, -jnp.inf)
    tmax = jnp.full_like(o.x, jnp.inf)
    for oc, dc, lo, hi in ((o.x, d.x, lb[0], ub[0]),
                           (o.y, d.y, lb[1], ub[1]),
                           (o.z, d.z, lb[2], ub[2])):
        inv = 1.0 / dc
        t1 = (lo - oc) * inv
        t2 = (hi - oc) * inv
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
    return (tmax >= 0) & (tmin <= tmax)


# ---------------------------------------------------------------------------
# Scene-level intersection (computeIntersections, pathtrace.cu:200-306)
# ---------------------------------------------------------------------------

def octant_cell_key(o: Vec3, d: Vec3, dead: jnp.ndarray,
                    sort_cells: int = 8) -> jnp.ndarray:
    """Coherence sort key: direction octant + origin-cell Morton index.

    ``sort_cells`` > 1: cell is the MAJOR key (cells quantized over the
    batch's own origin bounds); < -1: octant-major.  Dead lanes get 2^30 so
    a stable sort packs live rays densely at the front.  Shared by
    intersect_scene_v's internal sort and the wavefront's carry-level sort
    (render/wavefront.py) so both produce identical ray groupings.
    """
    key = ((d.x < 0).astype(jnp.int32) * 4
           + (d.y < 0).astype(jnp.int32) * 2
           + (d.z < 0).astype(jnp.int32))
    if sort_cells > 1 or sort_cells < -1:
        octant_major = sort_cells < 0
        # clamp: past 64 cells/axis the shifted key would overflow int32
        # beyond the 1<<30 dead-lane sentinel (r4 advisor; perf-only,
        # results are a pure permutation either way)
        sort_cells = min(abs(sort_cells), 64)
        n_bits = max(1, int(np.ceil(np.log2(sort_cells))))
        cell = jnp.zeros_like(key)
        for shift, c in ((2, o.x), (1, o.y), (0, o.z)):
            lo_ = jnp.min(c)
            ext = jnp.maximum(jnp.max(c) - lo_, 1e-12)
            q = jnp.clip(((c - lo_) / ext
                          * sort_cells).astype(jnp.int32),
                         0, sort_cells - 1)
            # spread bits to stride 3 (Morton interleave)
            m = jnp.zeros_like(q)
            for b in range(n_bits):
                m = m | (((q >> b) & 1) << (3 * b))
            cell = cell | (m << shift)
        if octant_major:
            key = (key << (3 * n_bits)) | cell
        else:
            key = (cell << 3) | key
    return jnp.where(dead, jnp.int32(1 << 30), key)


def resolve_mesh_impl(mesh: MeshData, impl: str = "auto") -> str:
    """Resolve the BVH kernel implementation for a mesh.

    "auto" routes by the measured r5 crossover (tools/hw_mesh_sweep.py,
    docs/MESH_TUNING.md): the binned pair pipeline wins once the mesh has
    enough bins for cross-tile packing to beat its fixed sort/glue cost
    (statue, 320 bins: 2.7x over v2p); below that the per-tile v2p kernel
    wins (icosphere, 2 bins: 4x over binned).  Threshold env-tunable via
    APTD_BINNED_MIN_BINS.
    """
    if impl != "auto":
        return impl
    if mesh is None or mesh.bvh is None:
        return "v2p"
    import os as _os
    thresh = int(_os.environ.get("APTD_BINNED_MIN_BINS", "64"))
    return "binned" if mesh.bvh.n_supers_real >= thresh else "v2p"


def intersect_scene_v(geoms: Geoms, mesh: MeshData, o: Vec3, d: Vec3,
                      ray_culling: bool = True, face_chunk: int = 16,
                      types: Optional[Tuple[int, ...]] = None,
                      use_bvh: Optional[bool] = None,
                      active: Optional[jnp.ndarray] = None,
                      octant_sort: bool = False,
                      sort_cells: int = 0,
                      kernel_lanes: Optional[int] = None,
                      kernel_impl: str = "v2"):
    """Closest-hit query (SoA): dict with planes/Vec3 values; t==-1 on miss.

    ``use_bvh``: route the mesh through the Pallas cluster-BVH kernel
    (render/mesh_kernel.py) instead of the dense scan.  Default: whenever
    the mesh carries a hierarchy.  The kernel is not differentiable —
    callers taking gradients must pass False.
    ``active``: optional per-ray liveness; dead lanes skip all BVH work
    (the scan path computes them regardless, masked later by shading).
    ``octant_sort``: permute rays by direction octant before the BVH
    kernel (and invert after) so each 128-lane subtile sees
    direction-coherent rays — incoherent secondary bounces then descend a
    much smaller union of tree nodes per subtile.  Costs two argsorts +
    gathers per query; a pure permutation round-trip, so results are
    unchanged bit-for-bit.
    ``sort_cells``: with octant_sort, additionally sort by an origin-cell
    Morton index (|sort_cells|^3 cells over the batch's own origin
    bounds) — subtiles then share position and direction.  Positive:
    cell is the MAJOR key; negative: octant is the major key, cells
    ordered within it.  0/1 disables (octant-only).
    ``kernel_lanes``: rays per BVH-kernel program (the descent-gating
    granule; see mesh_intersect_bvh).  None = the kernel default (1024).
    """
    t_g, p_g, n_g, out_g, mat_g = intersect_geoms_v(geoms, o, d, types)

    if mesh.num_faces > 0:
        if use_bvh is None:
            use_bvh = mesh.bvh is not None
        if use_bvh and mesh.bvh is not None:
            kernel_impl = resolve_mesh_impl(mesh, kernel_impl)
            if kernel_impl == "binned":
                from ..render.mesh_binned import mesh_intersect_binned
                mesh_intersect_bvh = mesh_intersect_binned
                # the binned pipeline packs rays itself (bin-major pair
                # sort); an outer coherence permutation buys nothing
                octant_sort = False
            elif kernel_impl == "v3":
                from ..render.mesh_kernel_v3 import mesh_intersect_bvh_v3

                def mesh_intersect_bvh(bvh, o_, d_, tc_, interpret,
                                       lanes=None):
                    return mesh_intersect_bvh_v3(bvh, o_, d_, tc_,
                                                 interpret=interpret)
            elif kernel_impl in ("v2p", "v2s"):
                import functools as _ft

                from ..render.mesh_kernel_v2p import mesh_intersect_bvh_v2p
                mesh_intersect_bvh = _ft.partial(
                    mesh_intersect_bvh_v2p, subtile=kernel_impl == "v2s")
            else:
                from ..render.mesh_kernel import mesh_intersect_bvh
            # Seed the kernel's running t with the analytic-geom hit: the
            # merge below takes the mesh only on *strictly* smaller t, so
            # pruning candidates >= t_g is exact and skips whole subtrees
            # for rays that already hit a wall.
            t_cull = t_g
            if ray_culling:
                # Whole-mesh gate kept bit-compatible with the scan path
                # (the reference's unwidened AABB quirk, pathtrace.cu:258).
                cull = ray_aabb_intersect_v(o, d, mesh.aabb_lb, mesh.aabb_ub)
                t_cull = jnp.where(cull, t_cull, -jnp.inf)
            if active is not None:
                t_cull = jnp.where(active, t_cull, -jnp.inf)
            if octant_sort:
                # ORIGIN-cell + octant key: each kernel subtile holds rays
                # that share position AND direction, so the node set a
                # subtile descends is bounded by one cone, not the whole
                # scene's.  Pure permutation; bitwise-identical.  Dead
                # lanes to the back so live subtiles stay dense.
                key = octant_cell_key(o, d, t_cull == -jnp.inf, sort_cells)
                perm = jnp.argsort(key, stable=True)
                os_ = Vec3(o.x[perm], o.y[perm], o.z[perm])
                ds_ = Vec3(d.x[perm], d.y[perm], d.z[perm])
                t_m, p_m, n_m, mat_m = mesh_intersect_bvh(
                    mesh.bvh, os_, ds_, t_cull[perm],
                    interpret=jax.default_backend() != "tpu",
                    lanes=kernel_lanes)
                inv = jnp.argsort(perm)
                t_m = t_m[inv]
                p_m = Vec3(p_m.x[inv], p_m.y[inv], p_m.z[inv])
                n_m = Vec3(n_m.x[inv], n_m.y[inv], n_m.z[inv])
                mat_m = mat_m[inv]
            else:
                t_m, p_m, n_m, mat_m = mesh_intersect_bvh(
                    mesh.bvh, o, d, t_cull,
                    interpret=jax.default_backend() != "tpu",
                    lanes=kernel_lanes)
        else:
            t_m, p_m, n_m, mat_m = mesh_intersect_v(mesh, o, d, face_chunk)
            if ray_culling:
                # Per-ray AABB gate (pathtrace.cu:258).  Masking replaces
                # the thread-level early-out.
                cull = ray_aabb_intersect_v(o, d, mesh.aabb_lb, mesh.aabb_ub)
                t_m = jnp.where(cull, t_m, jnp.inf)
        mesh_wins = t_m < t_g
        t = jnp.where(mesh_wins, t_m, t_g)
        point = vwhere(mesh_wins, p_m, p_g)
        normal = vwhere(mesh_wins, n_m, n_g)
        mat = jnp.where(mesh_wins, mat_m, mat_g)
        # triangle test leaves `outside` untouched in the reference; treat
        # mesh hits as outside=True.
        outside = jnp.where(mesh_wins, True, out_g)
    else:
        t, point, normal, mat, outside = t_g, p_g, n_g, mat_g, out_g

    miss = ~jnp.isfinite(t)
    t = jnp.where(miss, -1.0, t)
    mat = jnp.where(miss, -1, mat)
    return dict(t=t, point=point, normal=normal.normalized_safe(),
                material_id=mat, is_inside=~outside & ~miss)


# ---------------------------------------------------------------------------
# AoS wrappers — original (N, 3) API for tests and external callers
# ---------------------------------------------------------------------------

def box_intersect(transform, inverse_transform, ray_o, ray_d):
    """AoS wrapper over :func:`box_intersect_v`."""
    t, p, n, outside = box_intersect_v(
        transform, inverse_transform, Vec3.from_rows(ray_o), Vec3.from_rows(ray_d))
    return t, p.stack(), n.stack(), outside


def sphere_intersect(transform, inverse_transform, inv_transpose, ray_o, ray_d):
    """AoS wrapper over :func:`sphere_intersect_v`."""
    t, p, n, outside = sphere_intersect_v(
        transform, inverse_transform, inv_transpose,
        Vec3.from_rows(ray_o), Vec3.from_rows(ray_d))
    return t, p.stack(), n.stack(), outside


def triangle_intersect(v, n, ray_o, ray_d):
    """Ray batch (N,3) vs face batch (F,3,3) -> (N,F) results (AoS API)."""
    o2 = Vec3(ray_o[:, 0:1], ray_o[:, 1:2], ray_o[:, 2:3])
    d2 = Vec3(ray_d[:, 0:1], ray_d[:, 1:2], ray_d[:, 2:3])
    v0 = Vec3(v[None, :, 0, 0], v[None, :, 0, 1], v[None, :, 0, 2])
    v1 = Vec3(v[None, :, 1, 0], v[None, :, 1, 1], v[None, :, 1, 2])
    v2 = Vec3(v[None, :, 2, 0], v[None, :, 2, 1], v[None, :, 2, 2])
    t, u, w, hit = _triangle_t(v0, v1, v2, o2, d2)
    point = u[..., None] * v[None, :, 0] + w[..., None] * v[None, :, 1] \
        + (1 - u - w)[..., None] * v[None, :, 2]
    nrm = (1 - u - w)[..., None] * n[None, :, 0] + u[..., None] * n[None, :, 1] \
        + w[..., None] * n[None, :, 2]
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    t = jnp.where(hit, t, -1.0)
    return t, point, nrm


def ray_aabb_intersect(ray_o, ray_d, lb, ub):
    """AoS wrapper over :func:`ray_aabb_intersect_v`."""
    return ray_aabb_intersect_v(Vec3.from_rows(ray_o), Vec3.from_rows(ray_d),
                                lb, ub)


def _intersect_geoms(geoms: Geoms, ray_o, ray_d):
    """AoS wrapper over :func:`intersect_geoms_v` (legacy test entry)."""
    t, p, n, outside, mat = intersect_geoms_v(
        geoms, Vec3.from_rows(ray_o), Vec3.from_rows(ray_d))
    return t, p.stack(), n.stack(), outside, mat


def _intersect_mesh_chunked(mesh: MeshData, ray_o, ray_d, chunk: int = 16):
    """AoS wrapper over :func:`mesh_intersect_v` (legacy test entry)."""
    t, p, n, mat = mesh_intersect_v(mesh, Vec3.from_rows(ray_o),
                                    Vec3.from_rows(ray_d), chunk)
    return t, p.stack(), n.stack(), mat


def intersect_scene(geoms: Geoms, mesh: MeshData, ray_o, ray_d,
                    ray_culling: bool = True, face_chunk: int = 16,
                    use_pallas: bool = False):
    """AoS wrapper over :func:`intersect_scene_v`.

    Returns dict(t, point, normal, material_id, is_inside) with (N, 3)
    vectors — matching ShadeableIntersection semantics (pathtrace.cu:282-294).
    """
    del use_pallas  # the SoA core IS the TPU fast path
    r = intersect_scene_v(geoms, mesh, Vec3.from_rows(ray_o),
                          Vec3.from_rows(ray_d), ray_culling, face_chunk)
    return dict(t=r["t"], point=r["point"].stack(), normal=r["normal"].stack(),
                material_id=r["material_id"], is_inside=r["is_inside"])
