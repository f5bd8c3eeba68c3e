"""Geometry gradients via silhouette edge sampling (SURVEY.md §7 item 8).

The renderer's radiance estimator is piecewise CONSTANT in geometry and
camera parameters: a path's contribution is a product of albedos times a
terminal emittance (wavefront._shade), so the only geometric dependence is
*which* surfaces the path hits — a discrete event.  Automatic
differentiation therefore returns zero a.e. for d(image)/d(translation);
the true derivative of the *expected* image lives entirely on visibility
boundaries.  This module estimates that boundary term by sampling the
object's silhouette curve explicitly (the edge-sampling estimator of
differentiable rasterization/path tracing, applied to primary visibility):

    dJ/dtheta = interior AD term (zero here, kept for generality)
              + (1/N_px) * oint_C (L_in - L_out) (v . n_out) ds

where C is the silhouette in image space, v = du/dtheta the image-space
velocity of the edge point, n_out the curve normal pointing out of the
object's image, and L_in/L_out the radiance just inside/outside the edge.

Scope (documented): analytic *sphere* geoms with uniform scale — their
silhouette from a pinhole camera is an exact circle in 3D, sampled in
closed form — and *cube* geoms under arbitrary TRS — their silhouette is
the closed polygon of edges whose adjacent faces differ in front-facing-
ness (exact for the unit cube; 4 or 6 edges).  The silhouette must not be
occluded by other geometry (a fully occluded arc self-cancels: L_in ==
L_out).  Secondary (indirect) visibility boundaries are not estimated.
The reference has no differentiable rendering at all; this completes the
framework's "pixel-grad" deliverable for translations, FD-validated in
tests/test_edge_grad.py.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import RenderOptions
from ..ops.vec3 import Vec3
from ..scene.structs import Camera, Geoms, Scene
from .wavefront import _shade, init_render_state, trace_iteration
from ..ops.intersect import intersect_scene_v


# ---------------------------------------------------------------------------
# Ray-batch radiance (public API: render arbitrary rays, not just pixels)
# ---------------------------------------------------------------------------

def trace_radiance(scene: Scene, options: RenderOptions,
                   ray_o: Vec3, ray_d: Vec3, iteration,
                   lane_offset: int = 0) -> Vec3:
    """Radiance along arbitrary rays — the bounce core of trace_iteration
    without camera/G-buffer/accumulator.  One 1-spp estimate per ray;
    ``iteration`` selects the RNG stream exactly like a frame iteration."""
    n = ray_d.x.shape[0]
    color = Vec3.full_like(ray_d.x, 1.0)
    remaining = jnp.full((n,), scene.trace_depth, jnp.int32)

    def bounce(carry, _):
        o, d, c, rem = carry
        isect = intersect_scene_v(scene.geoms, scene.mesh, o, d,
                                  ray_culling=options.ray_culling,
                                  use_bvh=False)
        o, d, c, rem = _shade(scene, options, iteration, isect, d, c, rem,
                              lane_offset)
        return (o, d, c, rem), None

    carry = (ray_o, ray_d, color, remaining)
    carry, _ = jax.lax.scan(bounce, carry, None, length=scene.trace_depth)
    return carry[2]


def mean_radiance(scene: Scene, options: RenderOptions,
                  ray_o: Vec3, ray_d: Vec3, spp: int,
                  lane_offset: int = 0) -> Vec3:
    """Monte-Carlo mean of ``trace_radiance`` over ``spp`` RNG iterations."""
    def body(acc, it):
        c = trace_radiance(scene, options, ray_o, ray_d, it, lane_offset)
        return acc + c, None

    zero = Vec3.full_like(ray_d.x, 0.0)
    acc, _ = jax.lax.scan(body, zero, jnp.arange(1, spp + 1, dtype=jnp.int32))
    return acc / float(spp)


# ---------------------------------------------------------------------------
# Differentiable translation of one geom
# ---------------------------------------------------------------------------

def translate_geom(geoms: Geoms, index: int, delta: jnp.ndarray) -> Geoms:
    """Shift geom ``index`` by world-space ``delta`` (3,), differentiably.

    T' = Translate(delta) @ T, so transform[:3,3] += delta and the inverse
    picks up  T'^{-1} = T^{-1} @ Translate(-delta).
    """
    t = geoms.transform.at[index, :3, 3].add(delta)
    shift = -geoms.inverse_transform[index, :, :3] @ delta       # (4,)
    inv = geoms.inverse_transform.at[index, :, 3].add(shift)
    invt = geoms.inv_transpose.at[index, 3, :].add(shift)
    return dataclasses.replace(
        geoms, translation=geoms.translation.at[index].add(delta),
        transform=t, inverse_transform=inv, inv_transpose=invt)


# ---------------------------------------------------------------------------
# Sphere silhouette geometry
# ---------------------------------------------------------------------------

def _orthobasis(dn):
    """Two unit vectors orthogonal to unit dn (smooth away from the flip)."""
    a = jnp.where(jnp.abs(dn[0]) < 0.9,
                  jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    e1 = jnp.cross(dn, a)
    e1 = e1 / jnp.linalg.norm(e1)
    return e1, jnp.cross(dn, e1)


def silhouette_points_sphere(center: jnp.ndarray, radius, cam_pos: jnp.ndarray,
                             phis: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) points on the sphere's silhouette circle as seen from cam_pos.

    The set {x : (x-c).(x-o) = 0, |x-c| = r} is a circle of radius
    r*sqrt(1-(r/D)^2) centered at c - dn*r^2/D, D = |c-o|.
    """
    d = center - cam_pos
    dist = jnp.linalg.norm(d)
    dn = d / dist
    e1, e2 = _orthobasis(dn)
    cc = center - dn * (radius ** 2 / dist)
    rs = radius * jnp.sqrt(1.0 - (radius / dist) ** 2)
    circ = (e1[None, :] * jnp.cos(phis)[:, None]
            + e2[None, :] * jnp.sin(phis)[:, None])
    return cc[None, :] + rs * circ


def project_to_pixels(x: jnp.ndarray, camera: Camera,
                      position: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """World points (N,3) -> continuous pixel coords (N,2), inverting the
    ray-gen mapping dir = view - right*plx*(px - w/2) - up*ply*(py - h/2)
    (generate_camera_rays_v; pathtrace.cu:168-173).

    Solves q = k*view - kX*right - kY*up exactly, so the scene-file quirk
    of an ``up`` that is not orthogonalized against ``view``
    (derive_camera / scene.cpp:143-152) is handled correctly.
    ``position`` overrides the camera origin (differentiable camera moves).
    """
    w, h = camera.resolution
    pos = jnp.asarray(camera.position) if position is None else position
    basis = jnp.stack([jnp.asarray(camera.view), jnp.asarray(camera.right),
                       jnp.asarray(camera.up)], axis=1)        # columns
    q = x - pos[None, :]
    a = jnp.linalg.solve(basis, q.T).T                          # (N, 3)
    px = w * 0.5 - a[:, 1] / (a[:, 0] * camera.pixel_length[0])
    py = h * 0.5 - a[:, 2] / (a[:, 0] * camera.pixel_length[1])
    return jnp.stack([px, py], axis=-1)


def rays_through_pixels(camera: Camera, uv: jnp.ndarray) -> Tuple[Vec3, Vec3]:
    """Camera rays through continuous pixel coords (N,2), no AA jitter."""
    pos = jnp.asarray(camera.position)
    view = jnp.asarray(camera.view)
    right = jnp.asarray(camera.right)
    up = jnp.asarray(camera.up)
    w, h = camera.resolution
    X = camera.pixel_length[0] * (uv[:, 0] - w * 0.5)
    Y = camera.pixel_length[1] * (uv[:, 1] - h * 0.5)
    d = (view[None, :] - right[None, :] * X[:, None]
         - up[None, :] * Y[:, None])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    n = uv.shape[0]
    o = Vec3(jnp.full((n,), pos[0]), jnp.full((n,), pos[1]),
             jnp.full((n,), pos[2]))
    return o, Vec3(d[:, 0], d[:, 1], d[:, 2])


# ---------------------------------------------------------------------------
# Box silhouette geometry
# ---------------------------------------------------------------------------

def box_silhouette_loop(geoms: Geoms, index: int,
                        cam_pos, object_space: bool = False) -> "np.ndarray":
    """Ordered world-space vertices (m, 3) of a unit-cube geom's silhouette
    polygon as seen from ``cam_pos`` (object-space vertices when
    ``object_space`` — the TRS-differentiable path re-applies the
    transform itself).

    A cube face (axis a, sign s) is front-facing iff the object-space
    camera satisfies s*oc[a] > 0.5; an edge of the cube lies on the
    silhouette iff its two adjacent faces differ in front-facing-ness.
    For any viewpoint outside the cube those edges form one closed loop of
    4 or 6 edges (the projection of a convex body is convex).  The loop is
    built host-side in numpy — it is static topology for a fixed scene —
    and returned as ordered, non-repeating vertices.
    """
    import numpy as np
    inv = np.asarray(geoms.inverse_transform[index], np.float64)
    m = np.asarray(geoms.transform[index], np.float64)
    oc = (inv @ np.append(np.asarray(cam_pos, np.float64), 1.0))[:3]
    front = {(a, s): s * oc[a] > 0.5 for a in range(3) for s in (1, -1)}
    if not any(front.values()):
        raise ValueError("camera is inside the box; no silhouette")

    edges = []                   # [(p_obj, q_obj)] silhouette edges
    for a1 in range(3):
        for a2 in range(a1 + 1, 3):
            free = 3 - a1 - a2
            for s1 in (1, -1):
                for s2 in (1, -1):
                    if front[(a1, s1)] == front[(a2, s2)]:
                        continue
                    p = np.zeros(3)
                    p[a1], p[a2] = s1 * 0.5, s2 * 0.5
                    q = p.copy()
                    p[free], q[free] = -0.5, 0.5
                    edges.append((p, q))

    # Chain edges into the loop by matching endpoints.
    def key(v):
        return tuple(np.round(v * 2).astype(int))

    adj: dict = {}
    for i, (p, q) in enumerate(edges):
        adj.setdefault(key(p), []).append(i)
        adj.setdefault(key(q), []).append(i)
    loop = [edges[0][0], edges[0][1]]
    used = {0}
    while len(used) < len(edges):
        k = key(loop[-1])
        nxt = [i for i in adj[k] if i not in used]
        if not nxt:
            raise ValueError("silhouette edges do not form a closed loop")
        i = nxt[0]
        used.add(i)
        p, q = edges[i]
        loop.append(q if key(p) == k else p)
    verts_obj = np.stack(loop[:-1])            # closed: drop repeated start
    if object_space:
        return verts_obj.astype(np.float32)
    h = np.concatenate([verts_obj, np.ones((len(verts_obj), 1))], axis=1)
    return (h @ m.T)[:, :3].astype(np.float32)


def polygon_points(verts: jnp.ndarray, phis: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-linear closed-polygon points for curve params phi in
    [0, 2pi) — the box analogue of ``silhouette_points_sphere``.  Any
    piecewise-smooth parameterization integrates exactly (ds uses
    |du/dphi|); corners are measure-zero and never sampled (phis use
    half-offset midpoints)."""
    m = verts.shape[0]
    u = phis * (m / (2.0 * jnp.pi))
    k = jnp.floor(u)
    f = u - k
    ki = jnp.clip(k.astype(jnp.int32), 0, m - 1)
    a = verts[ki % m]
    b = verts[(ki + 1) % m]
    return a + (b - a) * f[:, None]


# ---------------------------------------------------------------------------
# Mesh silhouette geometry
# ---------------------------------------------------------------------------

def mesh_silhouette_segments(mesh, cam_pos):
    """Silhouette edge segments of a triangle mesh seen from ``cam_pos``.

    Returns numpy arrays (P, Q, W): segment endpoints (E, 3) and, per
    segment, the front-facing adjacent triangle's third vertex (E, 3) —
    an 'inward witness' whose projection marks the object side of the
    edge (the projected surface folds back there), used to orient the
    image-space outward normal per edge.  Unlike a sphere/box the mesh
    silhouette need not be one convex loop, so a global-centroid
    orientation would be wrong.

    An interior edge (two adjacent faces) is on the silhouette iff its
    faces differ in front-facing-ness (geometric normals); a boundary
    edge of an open mesh is on it iff its single face is front-facing.
    """
    import numpy as np
    V = np.asarray(mesh.vertices)[:mesh.num_faces].astype(np.float64)
    cam = np.asarray(cam_pos, np.float64)
    n = np.cross(V[:, 1] - V[:, 0], V[:, 2] - V[:, 0])
    cent = V.mean(axis=1)
    front = np.einsum("fk,fk->f", n, cam[None] - cent) > 0

    def vkey(v):
        return tuple(np.round(v * 4096.0).astype(np.int64))

    edges: dict = {}
    for f in range(V.shape[0]):
        for i in range(3):
            a, b = V[f, i], V[f, (i + 1) % 3]
            k = tuple(sorted((vkey(a), vkey(b))))
            edges.setdefault(k, []).append((f, i))
    P, Q, W = [], [], []

    def emit(f, i):
        P.append(V[f, i])
        Q.append(V[f, (i + 1) % 3])
        W.append(V[f, (i + 2) % 3])

    for faces in edges.values():
        if len(faces) == 1:
            f, i = faces[0]
            if front[f]:
                emit(f, i)
        else:
            (f1, i1), (f2, i2) = faces[0], faces[1]
            if front[f1] != front[f2]:
                emit(*(faces[0] if front[f1] else faces[1]))
    if not P:
        raise ValueError("mesh has no visible silhouette from this viewpoint")
    return (np.stack(P).astype(np.float32), np.stack(Q).astype(np.float32),
            np.stack(W).astype(np.float32))


def _segment_boundary_term(scene: Scene, options: RenderOptions,
                           uv_fn, inward_uv: jnp.ndarray,
                           n_edges: int, samples_per_edge: int,
                           spp: int, eps_px: float,
                           lane_salt: int = 0) -> jnp.ndarray:
    """Boundary integral over E straight silhouette segments:
    sum_e  int_0^1 (L_in - L_out)(v . n_out) |du/dt| dt.

    ``uv_fn(delta, t)`` maps a (3,) parameter offset and per-sample
    fractions t (E*S,) to image points (E*S, 2) — sample i lies on segment
    i // S at fraction t[i].  ``inward_uv`` (E*S, 2) are projected witness
    points on the object side of each edge; the outward normal is the
    tangent perpendicular oriented away from them.
    """
    cam = scene.camera
    w, h = cam.resolution
    s = samples_per_edge
    ts = jnp.tile((jnp.arange(s) + 0.5) / s, n_edges)        # (E*S,)
    zero = jnp.zeros((3,))

    uv = uv_fn(zero, ts)                                     # (E*S, 2)
    vel = jax.jacfwd(lambda d: uv_fn(d, ts))(zero)           # (E*S, 2, 3)
    # sample i depends only on t[i] -> the jacobian diagonal is one jvp
    tang = jax.jvp(lambda t: uv_fn(zero, t), (ts,),
                   (jnp.ones_like(ts),))[1]                  # (E*S, 2)
    ds = jnp.linalg.norm(tang, axis=-1)
    n_img = jnp.stack([tang[:, 1], -tang[:, 0]], axis=-1)
    n_img = n_img / jnp.maximum(jnp.linalg.norm(n_img, axis=-1,
                                                keepdims=True), 1e-12)
    toward_obj = jnp.sum((inward_uv - uv) * n_img, axis=-1)
    n_img = jnp.where(toward_obj[:, None] > 0, -n_img, n_img)

    o_in, d_in = rays_through_pixels(cam, uv - eps_px * n_img)
    o_out, d_out = rays_through_pixels(cam, uv + eps_px * n_img)
    l_in = mean_radiance(scene, options, o_in, d_in, spp,
                         lane_offset=lane_salt)
    l_out = mean_radiance(scene, options, o_out, d_out, spp,
                          lane_offset=lane_salt + (1 << 20))
    ldiff = (l_in.x + l_in.y + l_in.z - l_out.x - l_out.y - l_out.z) / 3.0

    inside = ((uv[:, 0] >= 0) & (uv[:, 0] <= w)
              & (uv[:, 1] >= 0) & (uv[:, 1] <= h))
    weight = jnp.where(inside, ldiff * ds, 0.0)
    vn = jnp.einsum("nkd,nk->nd", vel, n_img)
    return (weight[:, None] * vn).sum(0) / (s * w * h)


def translate_mesh(mesh, delta: jnp.ndarray):
    """MeshData with every vertex (and the AABB) moved by ``delta``.

    A pure translation is rigid, so an attached BVH shifts exactly: vertex
    columns of ``faces_packed`` and the lb/ub columns of every bounds level
    move by ``delta`` (normals and the tree topology are unchanged; padding
    nodes keep their dead-row can't-hit boxes).  No rebuild needed.
    """
    delta = jnp.asarray(delta, jnp.float32)
    bvh = getattr(mesh, "bvh", None)
    if bvh is not None:
        d9 = jnp.tile(delta, 3)              # v0 v1 v2 xyz columns 0-8
        d6 = jnp.concatenate([delta, delta])  # lb xyz | ub xyz columns 0-5
        bvh = dataclasses.replace(
            bvh,
            faces_packed=bvh.faces_packed.at[:, 0:9].add(d9[None, :]),
            cluster_bounds=bvh.cluster_bounds.at[:, 0:6].add(d6[None, :]),
            super_bounds=bvh.super_bounds.at[:, 0:6].add(d6[None, :]),
            hyper_bounds=bvh.hyper_bounds.at[:, 0:6].add(d6[None, :]))
    return dataclasses.replace(
        mesh, vertices=mesh.vertices + delta[None, None, :],
        aabb_lb=mesh.aabb_lb + delta, aabb_ub=mesh.aabb_ub + delta,
        bvh=bvh)


def mesh_translation_gradient(scene: Scene, options: RenderOptions, *,
                              samples_per_edge: int = 8, spp: int = 128,
                              eps_px: float = 0.75,
                              include_interior: bool = True) -> jnp.ndarray:
    """d(mean image)/d(translation of the scene's mesh) — a (3,) vector.

    Mesh vertices are pre-transformed world space (scene.cpp:266-318), so
    a mesh translation adds delta to every vertex; the silhouette segments
    ride along rigidly.
    """
    cam = scene.camera
    p_np, q_np, w_np = mesh_silhouette_segments(scene.mesh,
                                                jnp.asarray(cam.position))
    P, Q = jnp.asarray(p_np), jnp.asarray(q_np)
    n_edges = P.shape[0]
    s = samples_per_edge
    wit = jnp.repeat(jnp.asarray(w_np), s, axis=0)

    def uv_fn(delta, t):
        a = jnp.repeat(P, s, axis=0)
        b = jnp.repeat(Q, s, axis=0)
        x = a + (b - a) * t[:, None] + delta
        return project_to_pixels(x, cam)

    inward_uv = project_to_pixels(wit, cam)
    boundary = _segment_boundary_term(scene, options, uv_fn, inward_uv,
                                      n_edges, s, spp, eps_px)
    if not include_interior:
        return boundary

    def j_interior(delta):
        sc = dataclasses.replace(scene,
                                 mesh=translate_mesh(scene.mesh, delta))
        state = trace_iteration(sc, options, init_render_state(sc),
                                differentiable=True)
        return jnp.mean(jnp.stack(list(state.accum)))

    return boundary + jax.grad(j_interior)(jnp.zeros((3,)))


def sphere_world_radius(geoms: Geoms, index: int) -> float:
    """Reference spheres are radius-0.5 unit spheres scaled by SCALE
    (intersections.h:112); uniform scale required for an exact circle."""
    import numpy as np
    s = np.asarray(geoms.scale[index])
    if not (abs(s[0] - s[1]) < 1e-5 and abs(s[0] - s[2]) < 1e-5):
        raise ValueError(f"edge gradients need uniform sphere scale, got {s}")
    return 0.5 * float(s[0])


# ---------------------------------------------------------------------------
# The estimator
# ---------------------------------------------------------------------------

def _silhouette_boundary_term(scene: Scene, options: RenderOptions,
                              uv_fn, n_edge: int, spp: int, eps_px: float,
                              lane_salt: int = 0) -> jnp.ndarray:
    """Edge integral (1/N_px) * oint (L_in - L_out)(v . n_out) ds for one
    closed silhouette curve.

    ``uv_fn(delta, phis)`` maps a (3,) parameter offset and curve
    parameters to image-space points (N, 2); the curve at delta=0 is the
    silhouette, and d(uv)/d(delta) is the edge velocity.
    """
    cam = scene.camera
    w, h = cam.resolution
    phis = (jnp.arange(n_edge) + 0.5) * (2.0 * jnp.pi / n_edge)
    zero = jnp.zeros((3,))

    uv = uv_fn(zero, phis)                                   # (N, 2)
    vel = jax.jacfwd(lambda d: uv_fn(d, phis))(zero)         # (N, 2, 3)
    tang = jax.vmap(jax.jacfwd(lambda p: uv_fn(zero, p[None])[0]))(phis)
    ds = jnp.linalg.norm(tang, axis=-1)                      # |du/dphi|
    # outward normal: perpendicular of the tangent, oriented away from the
    # projected-silhouette centroid
    n_img = jnp.stack([tang[:, 1], -tang[:, 0]], axis=-1)
    n_img = n_img / jnp.maximum(jnp.linalg.norm(n_img, axis=-1,
                                                keepdims=True), 1e-12)
    outward = jnp.sum((uv - jnp.mean(uv, axis=0, keepdims=True)) * n_img,
                      axis=-1)
    n_img = jnp.where(outward[:, None] < 0, -n_img, n_img)

    o_in, d_in = rays_through_pixels(cam, uv - eps_px * n_img)
    o_out, d_out = rays_through_pixels(cam, uv + eps_px * n_img)
    l_in = mean_radiance(scene, options, o_in, d_in, spp,
                         lane_offset=lane_salt)
    l_out = mean_radiance(scene, options, o_out, d_out, spp,
                          lane_offset=lane_salt + (1 << 20))
    ldiff = (l_in.x + l_in.y + l_in.z - l_out.x - l_out.y - l_out.z) / 3.0

    # samples projecting outside the frame contribute nothing to J
    inside = ((uv[:, 0] >= 0) & (uv[:, 0] <= w)
              & (uv[:, 1] >= 0) & (uv[:, 1] <= h))
    weight = jnp.where(inside, ldiff * ds, 0.0)              # (N,)
    vn = jnp.einsum("nkd,nk->nd", vel, n_img)                # (N, 3)
    return (2.0 * jnp.pi / n_edge) * (weight[:, None] * vn).sum(0) / (w * h)


def translation_gradient(scene: Scene, options: RenderOptions,
                         geom_index: int, *,
                         n_edge: int = 512, spp: int = 128,
                         eps_px: float = 0.75,
                         include_interior: bool = True) -> jnp.ndarray:
    """d(mean image)/d(translation of geom ``geom_index``) — a (3,) vector.

    J = mean over pixels and RGB of the expected radiance image.  The
    boundary term samples ``n_edge`` silhouette points, shoots ``spp``
    paths just inside and outside each (``eps_px`` pixels across the
    edge), and integrates (L_in - L_out)(v . n) ds in image space.
    """
    import numpy as np
    cam = scene.camera
    geoms = scene.geoms
    cam_pos = jnp.asarray(cam.position)
    gtype = int(np.asarray(geoms.type[geom_index]))
    if gtype == 0:                                   # SPHERE
        radius = sphere_world_radius(geoms, geom_index)

        def uv_fn(delta, phis):
            center = geoms.translation[geom_index] + delta
            x = silhouette_points_sphere(center, radius, cam_pos, phis)
            return project_to_pixels(x, cam)
    elif gtype == 1:                                 # CUBE
        # Translating a TRS geom adds delta directly in world space
        # (world = T + R*S*x_obj), so the silhouette polygon rides along.
        verts = jnp.asarray(box_silhouette_loop(geoms, geom_index, cam_pos))

        def uv_fn(delta, phis):
            x = polygon_points(verts, phis) + delta
            return project_to_pixels(x, cam)
    else:
        raise ValueError("edge gradients support sphere and cube geoms; "
                         f"geom {geom_index} has type {gtype}")

    boundary = _silhouette_boundary_term(scene, options, uv_fn,
                                         n_edge, spp, eps_px)
    if not include_interior:
        return boundary

    def j_interior(delta):
        s = dataclasses.replace(scene,
                                geoms=translate_geom(geoms, geom_index, delta))
        state = trace_iteration(s, options, init_render_state(s),
                                differentiable=True)
        return jnp.mean(jnp.stack(list(state.accum)))

    return boundary + jax.grad(j_interior)(jnp.zeros((3,)))


def rotation_matrix_xyz_deg(rot: jnp.ndarray) -> jnp.ndarray:
    """Differentiable 3x3 R = Rx @ Ry @ Rz, angles in DEGREES XYZ order —
    the rotation block of build_transformation_matrix (utilities.cpp:44-51,
    scene/structs.py)."""
    r = jnp.radians(rot)
    cx, sx = jnp.cos(r[0]), jnp.sin(r[0])
    cy, sy = jnp.cos(r[1]), jnp.sin(r[1])
    cz, sz = jnp.cos(r[2]), jnp.sin(r[2])
    rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cx, -sx], [0.0, sx, cx]])
    ry = jnp.array([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]])
    rz = jnp.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]])
    return rx @ ry @ rz


def retrs_geom(geoms: Geoms, index: int, drot: jnp.ndarray,
               dscale: jnp.ndarray) -> Geoms:
    """Geoms with geom ``index``'s transform rebuilt at (rotation + drot,
    scale + dscale), differentiably (jnp 4x4 compose + inverse).

    The translation path keeps :func:`translate_geom` (exact sparse
    update); rotation/scale need the full rebuild because they change the
    3x3 block and its inverse non-trivially.
    """
    rot = geoms.rotation[index] + drot
    scl = geoms.scale[index] + dscale
    r3 = rotation_matrix_xyz_deg(rot)
    m3 = r3 * scl[None, :]                       # R @ diag(s)
    m = jnp.eye(4).at[:3, :3].set(m3).at[:3, 3].set(geoms.translation[index])
    inv = jnp.linalg.inv(m)
    return dataclasses.replace(
        geoms,
        rotation=geoms.rotation.at[index].set(rot),
        scale=geoms.scale.at[index].set(scl),
        transform=geoms.transform.at[index].set(m.astype(jnp.float32)),
        inverse_transform=geoms.inverse_transform.at[index].set(
            inv.astype(jnp.float32)),
        inv_transpose=geoms.inv_transpose.at[index].set(
            inv.T.astype(jnp.float32)))


def trs_gradient(scene: Scene, options: RenderOptions, geom_index: int,
                 param: str, *, n_edge: int = 512, spp: int = 128,
                 eps_px: float = 0.75,
                 include_interior: bool = True) -> jnp.ndarray:
    """d(mean image)/d(ROTAT or SCALE of geom ``geom_index``) — (3,).

    Completes d(image)/d(TRS) over every transform parameter the scene
    randomizer mutates (create_scene.py:47-57 equivalents): translations
    via :func:`translation_gradient`, rotations/scales here.  Same
    boundary machinery — only the edge-point velocity differs:

      world(delta) = T + R(rot + drot) ((scale + dscale) .* x_obj)

    with the object-space silhouette geometry held fixed for cubes (the
    active edge set is piecewise constant; flips are measure-zero) and
    re-derived inside the differentiable map for spheres (the unit-sphere
    silhouette circle depends on the object-space camera, which moves
    under rotation/scale — an anisotropically-scaled sphere's world
    silhouette is exactly the TRS image of that circle).

    The interior term matters here (unlike translations of diffuse
    scenes): rotating/scaling a geom changes shading normals and hit
    points continuously — plain AD through the differentiable render path
    with :func:`retrs_geom` captures it.

    Secondary-visibility boundaries remain unestimated, as for
    translations (module docstring).
    """
    import numpy as np
    if param not in ("rotate", "scale"):
        raise ValueError(f"param must be 'rotate' or 'scale', got {param!r}")
    cam = scene.camera
    geoms = scene.geoms
    cam_pos = jnp.asarray(cam.position)
    gtype = int(np.asarray(geoms.type[geom_index]))
    T = geoms.translation[geom_index]
    rot0 = geoms.rotation[geom_index]
    scl0 = geoms.scale[geom_index]

    def world_map(delta, x_obj):
        drot = delta if param == "rotate" else jnp.zeros((3,))
        dscl = delta if param == "scale" else jnp.zeros((3,))
        r3 = rotation_matrix_xyz_deg(rot0 + drot)
        return T[None, :] + (x_obj * (scl0 + dscl)[None, :]) @ r3.T

    if gtype == 0:                                   # SPHERE
        def uv_fn(delta, phis):
            drot = delta if param == "rotate" else jnp.zeros((3,))
            dscl = delta if param == "scale" else jnp.zeros((3,))
            r3 = rotation_matrix_xyz_deg(rot0 + drot)
            # object-space camera of the TRS'd unit sphere (radius 0.5,
            # intersections.h:112): oc = S^-1 R^T (cam - T)
            oc = (r3.T @ (cam_pos - T)) / (scl0 + dscl)
            c = silhouette_points_sphere(jnp.zeros((3,)), 0.5, oc, phis)
            return project_to_pixels(world_map(delta, c), cam)
    elif gtype == 1:                                 # CUBE
        verts_obj = jnp.asarray(box_silhouette_loop(
            geoms, geom_index, np.asarray(cam.position), object_space=True))

        def uv_fn(delta, phis):
            x_obj = polygon_points(verts_obj, phis)
            return project_to_pixels(world_map(delta, x_obj), cam)
    else:
        raise ValueError("edge gradients support sphere and cube geoms; "
                         f"geom {geom_index} has type {gtype}")

    boundary = _silhouette_boundary_term(scene, options, uv_fn,
                                         n_edge, spp, eps_px)
    if not include_interior:
        return boundary

    def j_interior(delta):
        drot = delta if param == "rotate" else jnp.zeros((3,))
        dscl = delta if param == "scale" else jnp.zeros((3,))
        s = dataclasses.replace(
            scene, geoms=retrs_geom(geoms, geom_index, drot, dscl))
        state = trace_iteration(s, options, init_render_state(s),
                                differentiable=True)
        return jnp.mean(jnp.stack(list(state.accum)))

    return boundary + jax.grad(j_interior)(jnp.zeros((3,)))


def rotation_gradient(scene, options, geom_index: int, **kw) -> jnp.ndarray:
    """d(mean image)/d(ROTAT degrees of geom ``geom_index``) — (3,)."""
    return trs_gradient(scene, options, geom_index, "rotate", **kw)


def scale_gradient(scene, options, geom_index: int, **kw) -> jnp.ndarray:
    """d(mean image)/d(SCALE of geom ``geom_index``) — (3,)."""
    return trs_gradient(scene, options, geom_index, "scale", **kw)


def camera_translation_gradient(scene: Scene, options: RenderOptions, *,
                                geom_indices: Optional[Tuple[int, ...]] = None,
                                n_edge: int = 512, spp: int = 128,
                                eps_px: float = 0.75) -> jnp.ndarray:
    """d(mean image)/d(camera position) — a (3,) vector.

    Every visibility silhouette moves when the camera moves; this sums the
    boundary terms of the silhouettes of the given geoms (default: every
    uniform-scale sphere plus every cube whose silhouette is visible).
    Sphere silhouettes slide on the surface as the camera moves; a cube's
    silhouette edges are FIXED on the cube (the active edge set is
    piecewise constant in camera position — topology flips are
    measure-zero), so only the projection varies.  Scope caveat
    (documented): material-boundary curves are NOT sampled — exact only
    when those curves separate regions of equal radiance.
    """
    import numpy as np
    cam = scene.camera
    geoms = scene.geoms
    if geom_indices is None:
        types = np.asarray(geoms.type)
        scales = np.asarray(geoms.scale)
        geom_indices = []
        for i in range(len(types)):
            if types[i] == 0 and float(np.ptp(scales[i])) < 1e-6:
                geom_indices.append(int(i))
            elif types[i] == 1:
                try:
                    box_silhouette_loop(geoms, i, np.asarray(cam.position))
                    geom_indices.append(int(i))
                except ValueError:
                    pass                      # camera inside -> no silhouette
        geom_indices = tuple(geom_indices)
    base_pos = jnp.asarray(cam.position)
    total = jnp.zeros((3,))
    for k, gi in enumerate(geom_indices):
        if int(np.asarray(geoms.type[gi])) == 0:
            radius = sphere_world_radius(geoms, gi)
            center = geoms.translation[gi]

            def uv_fn(delta, phis, center=center, radius=radius):
                pos = base_pos + delta
                x = silhouette_points_sphere(center, radius, pos, phis)
                return project_to_pixels(x, cam, position=pos)
        else:
            verts = jnp.asarray(box_silhouette_loop(geoms, gi,
                                                    np.asarray(cam.position)))

            def uv_fn(delta, phis, verts=verts):
                pos = base_pos + delta
                x = polygon_points(verts, phis)
                return project_to_pixels(x, cam, position=pos)

        total = total + _silhouette_boundary_term(
            scene, options, uv_fn, n_edge, spp, eps_px,
            lane_salt=k * (1 << 21))
    return total
