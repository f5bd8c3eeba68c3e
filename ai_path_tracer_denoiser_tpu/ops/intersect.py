"""Ray/primitive intersection ops — fully vectorized, branch-free JAX.

Behavioral ports of intersections.h (box slab test :52-94, sphere quadratic
:106-148, glm one-sided Moller-Trumbore triangle :159-172, ray/AABB slab
:175-200), reshaped for the TPU: instead of one thread per ray looping over
primitives, every function evaluates a whole ray batch against a primitive
batch as dense array math, and reductions pick the winner.  Division by zero
follows IEEE (inf), exactly like the reference's unguarded slab divides
(intersections.h:64-66).

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

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..scene.structs import CUBE, SPHERE, Geoms, MeshData

_EPS_POINT = 1e-4       # getPointOnRay backoff (intersections.h:27-29)
_FLT_EPS = jnp.float32(1.1920929e-07)
_BIG = jnp.float32(1e38)


def _xform_point(m: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """(4,4) @ [p, 1] -> first 3 components. Batched over leading dims of p."""
    return p @ m[:3, :3].T + m[:3, 3]


def _xform_dir(m: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    return d @ m[:3, :3].T


def _normalize(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return v / jnp.linalg.norm(v, axis=axis, keepdims=True)


# ---------------------------------------------------------------------------
# Unit-cube slab test (intersections.h:52-94)
# ---------------------------------------------------------------------------

def box_intersect(transform: jnp.ndarray, inverse_transform: jnp.ndarray,
                  ray_o: jnp.ndarray, ray_d: jnp.ndarray):
    """Ray batch vs one transformed unit cube.

    Returns (t, point, normal, outside): t is the *world-space* distance
    (length(origin - hit)), -1 on miss.
    """
    q_o = _xform_point(inverse_transform, ray_o)            # (..., 3)
    q_d = _normalize(_xform_dir(inverse_transform, ray_d))  # (..., 3)

    t1 = (-0.5 - q_o) / q_d                                  # (..., 3)
    t2 = (0.5 - q_o) / q_d
    ta = jnp.minimum(t1, t2)
    tb = jnp.maximum(t1, t2)
    axis_sign = jnp.where(t2 < t1, 1.0, -1.0)                # n[xyz] per axis

    ta_pos = jnp.where(ta > 0, ta, -_BIG)
    tmin = jnp.max(ta_pos, axis=-1)                          # (...,)
    tmin_axis = jnp.argmax(ta_pos, axis=-1)
    tmax = jnp.min(tb, axis=-1)
    tmax_axis = jnp.argmin(tb, axis=-1)

    def onehot_normal(axis_idx):
        return jax.nn.one_hot(axis_idx, 3, dtype=ray_o.dtype) * jnp.take_along_axis(
            axis_sign, axis_idx[..., None], axis=-1)

    tmin_n = onehot_normal(tmin_axis)
    tmax_n = onehot_normal(tmax_axis)

    hit = (tmax >= tmin) & (tmax > 0)
    inside = tmin <= 0
    t_obj = jnp.where(inside, tmax, tmin)
    n_obj = jnp.where(inside[..., None], tmax_n, tmin_n)
    outside = ~inside

    obj_point = q_o + (t_obj[..., None] - _EPS_POINT) * q_d
    point = _xform_point(transform, obj_point)
    normal = _normalize(_xform_dir(transform, n_obj))
    t_world = jnp.linalg.norm(ray_o - point, axis=-1)
    t = jnp.where(hit, t_world, -1.0)
    return t, point, normal, outside


# ---------------------------------------------------------------------------
# Unit-sphere quadratic (intersections.h:106-148)
# ---------------------------------------------------------------------------

def sphere_intersect(transform: jnp.ndarray, inverse_transform: jnp.ndarray,
                     inv_transpose: jnp.ndarray,
                     ray_o: jnp.ndarray, ray_d: jnp.ndarray):
    """Ray batch vs one transformed radius-0.5 sphere (world-distance t)."""
    ro = _xform_point(inverse_transform, ray_o)
    rd = _normalize(_xform_dir(inverse_transform, ray_d))

    v_dot_d = jnp.sum(ro * rd, axis=-1)
    radicand = v_dot_d * v_dot_d - (jnp.sum(ro * ro, axis=-1) - 0.25)
    sq = jnp.sqrt(jnp.maximum(radicand, 0.0))
    t1 = -v_dot_d + sq
    t2 = -v_dot_d - sq

    both_neg = (t1 < 0) & (t2 < 0)
    both_pos = (t1 > 0) & (t2 > 0)
    t_obj = jnp.where(both_pos, jnp.minimum(t1, t2), jnp.maximum(t1, t2))
    outside = both_pos
    hit = (radicand >= 0) & ~both_neg

    obj_point = ro + (t_obj[..., None] - _EPS_POINT) * rd
    point = _xform_point(transform, obj_point)
    normal = _normalize(_xform_dir(inv_transpose, obj_point))
    normal = jnp.where(outside[..., None], normal, -normal)
    t_world = jnp.linalg.norm(ray_o - point, axis=-1)
    t = jnp.where(hit, t_world, -1.0)
    return t, point, normal, outside


# ---------------------------------------------------------------------------
# Triangle: one-sided Moller-Trumbore, glm convention (intersect.inl:37-73)
# ---------------------------------------------------------------------------

def triangle_intersect(v: jnp.ndarray, n: jnp.ndarray,
                       ray_o: jnp.ndarray, ray_d: jnp.ndarray):
    """Ray batch (N,3) vs face batch (F,3,3) -> (N,F) results.

    Returns (t, point (N,F,3), normal (N,F,3)); t=-1 on miss.  t is the ray
    parameter (== distance when ray_d is unit), with no epsilon backoff —
    matching triangleIntersectionTest (intersections.h:159-172).
    """
    v0, v1, v2 = v[:, 0], v[:, 1], v[:, 2]                   # (F, 3)
    e1 = v1 - v0
    e2 = v2 - v0
    # p = cross(dir, e2): (N, F, 3)
    p = jnp.cross(ray_d[:, None, :], e2[None, :, :])
    a = jnp.sum(e1[None] * p, axis=-1)                       # (N, F)
    front = a >= _FLT_EPS                                    # glm: a < eps -> miss
    f = 1.0 / a
    s = ray_o[:, None, :] - v0[None]                         # (N, F, 3)
    u = f * jnp.sum(s * p, axis=-1)
    q = jnp.cross(s, e1[None, :, :])
    w = f * jnp.sum(ray_d[:, None, :] * q, axis=-1)
    t = f * jnp.sum(e2[None] * q, axis=-1)
    hit = front & (u >= 0) & (u <= 1) & (w >= 0) & (u + w <= 1) & (t >= 0)

    # Reference's rotated barycentric convention for the point
    # (intersections.h:166): x*v0 + y*v1 + (1-x-y)*v2.
    uw = u[..., None]
    wv = w[..., None]
    point = uw * v0[None] + wv * v1[None] + (1 - uw - wv) * v2[None]
    n0, n1, n2 = n[:, 0], n[:, 1], n[:, 2]
    normal = _normalize((1 - uw - wv) * n0[None] + uw * n1[None] + wv * n2[None])
    t = jnp.where(hit, t, -1.0)
    return t, point, normal


def ray_aabb_intersect(ray_o: jnp.ndarray, ray_d: jnp.ndarray,
                       lb: jnp.ndarray, ub: jnp.ndarray) -> jnp.ndarray:
    """Slab AABB test (intersections.h:175-200) over a ray batch -> bool."""
    inv_d = 1.0 / ray_d
    t_lb = (lb - ray_o) * inv_d
    t_ub = (ub - ray_o) * inv_d
    tmin = jnp.max(jnp.minimum(t_lb, t_ub), axis=-1)
    tmax = jnp.min(jnp.maximum(t_lb, t_ub), axis=-1)
    return (tmax >= 0) & (tmin <= tmax)


# ---------------------------------------------------------------------------
# Scene-level intersection (computeIntersections, pathtrace.cu:200-306)
# ---------------------------------------------------------------------------

def _intersect_geoms(geoms: Geoms, ray_o: jnp.ndarray, ray_d: jnp.ndarray):
    """All rays vs all analytic geoms; min-t with first-geom tie-break."""

    def per_geom(gtype, m, inv, inv_t):
        tb, pb, nb, ob = box_intersect(m, inv, ray_o, ray_d)
        ts, ps, ns, os_ = sphere_intersect(m, inv, inv_t, ray_o, ray_d)
        is_cube = gtype == CUBE
        t = jnp.where(is_cube, tb, ts)
        point = jnp.where(is_cube, pb, ps)
        normal = jnp.where(is_cube, nb, ns)
        outside = jnp.where(is_cube, ob, os_)
        return t, point, normal, outside

    t, point, normal, outside = jax.vmap(per_geom)(
        geoms.type, geoms.transform, geoms.inverse_transform, geoms.inv_transpose)
    # t: (G, N). Replace misses by +inf, take first argmin over geoms
    # (matches the strict `t_min > t` loop at pathtrace.cu:249).
    t_valid = jnp.where(t > 0.0, t, jnp.inf)
    best = jnp.argmin(t_valid, axis=0)                      # (N,)
    take = functools.partial(jnp.take_along_axis, indices=best[None], axis=0)
    t_best = jnp.squeeze(take(t_valid), 0)
    point_b = jnp.squeeze(jnp.take_along_axis(point, best[None, :, None], axis=0), 0)
    normal_b = jnp.squeeze(jnp.take_along_axis(normal, best[None, :, None], axis=0), 0)
    outside_b = jnp.squeeze(take(outside), 0)
    mat_b = geoms.material_id[best]
    return t_best, point_b, normal_b, outside_b, mat_b


def _intersect_mesh_chunked(mesh: MeshData, ray_o: jnp.ndarray, ray_d: jnp.ndarray,
                            chunk: int = 512):
    """Min-t over all faces, scanning face chunks to bound memory.

    The (N, F) brute-force product is the reference's inner loop
    (pathtrace.cu:259-268); here each chunk is a dense (N, chunk) VPU tile
    and a running minimum is carried — the TPU analogue of the per-thread
    running ``t_min``.
    """
    n_rays = ray_o.shape[0]
    f_pad = mesh.padded_count
    chunk = min(chunk, f_pad)
    n_chunks = (f_pad + chunk - 1) // chunk
    # Pad the face axis to a multiple of chunk (already lane-padded).
    pad_to = n_chunks * chunk

    def pad0(x):
        cfg = [(0, pad_to - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg)

    verts = pad0(mesh.vertices).reshape(n_chunks, chunk, 3, 3)
    norms = pad0(mesh.normals).reshape(n_chunks, chunk, 3, 3)
    mats = pad0(mesh.material_id).reshape(n_chunks, chunk)
    valid = pad0(mesh.valid).reshape(n_chunks, chunk)

    init = (jnp.full((n_rays,), jnp.inf),
            jnp.zeros((n_rays, 3)),
            jnp.zeros((n_rays, 3)),
            jnp.full((n_rays,), -1, jnp.int32))

    def body(carry, xs):
        t_min, pt, nrm, mat = carry
        v, n, m, ok = xs
        t, point, normal = triangle_intersect(v, n, ray_o, ray_d)
        t = jnp.where(ok[None, :], t, -1.0)
        t = jnp.where(t > 0.0, t, jnp.inf)
        j = jnp.argmin(t, axis=1)                            # (N,)
        t_c = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
        better = t_c < t_min
        pt_c = jnp.take_along_axis(point, j[:, None, None], axis=1)[:, 0]
        nrm_c = jnp.take_along_axis(normal, j[:, None, None], axis=1)[:, 0]
        mat_c = m[j]
        return ((jnp.where(better, t_c, t_min),
                 jnp.where(better[:, None], pt_c, pt),
                 jnp.where(better[:, None], nrm_c, nrm),
                 jnp.where(better, mat_c, mat)), None)

    if n_chunks == 1:
        (t_min, pt, nrm, mat), _ = body(init, (verts[0], norms[0], mats[0], valid[0]))
    else:
        (t_min, pt, nrm, mat), _ = jax.lax.scan(body, init, (verts, norms, mats, valid))
    return t_min, pt, nrm, mat


def intersect_scene(geoms: Geoms, mesh: MeshData,
                    ray_o: jnp.ndarray, ray_d: jnp.ndarray,
                    ray_culling: bool = True, face_chunk: int = 512,
                    use_pallas: bool = False):
    """Closest-hit query for a ray batch against the whole scene.

    Returns dict(t, point, normal, material_id, is_inside); t == -1 for miss
    (matching ShadeableIntersection semantics, pathtrace.cu:282-294).
    """
    t_g, p_g, n_g, outside_g, mat_g = _intersect_geoms(geoms, ray_o, ray_d)

    if mesh.num_faces > 0:
        if use_pallas:
            from .pallas.intersect_kernel import mesh_intersect_pallas
            t_m, p_m, n_m, mat_m = mesh_intersect_pallas(mesh, ray_o, ray_d)
        else:
            t_m, p_m, n_m, mat_m = _intersect_mesh_chunked(mesh, ray_o, ray_d, face_chunk)
        if ray_culling:
            # Per-ray AABB gate (pathtrace.cu:258). Masking replaces the
            # thread-level early-out; on TPU the win comes from whole-batch
            # culling ahead of the scan, handled by the renderer.
            cull = ray_aabb_intersect(ray_o, ray_d, mesh.aabb_lb, mesh.aabb_ub)
            t_m = jnp.where(cull, t_m, jnp.inf)
        mesh_wins = t_m < t_g
        t = jnp.where(mesh_wins, t_m, t_g)
        point = jnp.where(mesh_wins[:, None], p_m, p_g)
        normal = jnp.where(mesh_wins[:, None], n_m, n_g)
        mat = jnp.where(mesh_wins, mat_m, mat_g)
        # triangle test leaves `outside` untouched in the reference; treat
        # mesh hits as outside=True.
        outside = jnp.where(mesh_wins, True, outside_g)
    else:
        t, point, normal, mat, outside = t_g, p_g, n_g, mat_g, outside_g

    miss = ~jnp.isfinite(t)
    t = jnp.where(miss, -1.0, t)
    mat = jnp.where(miss, -1, mat)
    return dict(t=t, point=point, normal=_normalize_safe(normal),
                material_id=mat, is_inside=~outside & ~miss)


def _normalize_safe(v):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.where(n > 0, n, 1.0)
