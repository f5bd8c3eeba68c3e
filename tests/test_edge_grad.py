"""Edge-sampled geometry gradients (render/edge_grad.py) vs oracles.

The renderer's AD gradient w.r.t. geometry is zero a.e. (path contributions
are products of albedos and emittance — piecewise constant in positions),
so d(mean image)/d(translation) is validated against two independent
oracles:

  1. a semi-analytic area oracle: J = L_out + (L_in - L_out) * A/N_px for a
     black sphere in front of a uniform emissive wall, with the projected
     silhouette area A computed by the shoelace formula and differentiated
     by central differences (no Monte Carlo anywhere);
  2. rendered finite differences of the actual AA-jittered estimator.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ai_path_tracer_denoiser_tpu.config import RenderOptions
from ai_path_tracer_denoiser_tpu.ops.vec3 import Vec3
from ai_path_tracer_denoiser_tpu.render import render
from ai_path_tracer_denoiser_tpu.render.edge_grad import (
    project_to_pixels, rays_through_pixels, silhouette_points_sphere,
    trace_radiance, translate_geom, translation_gradient)
from ai_path_tracer_denoiser_tpu.render.wavefront import (
    generate_camera_rays_v)
from ai_path_tracer_denoiser_tpu.scene import parse_scene_text

SCENE_TEXT = """
// emissive white wall
MATERIAL 0
RGB         1 1 1
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   2

// black diffuse sphere
MATERIAL 1
RGB         0 0 0
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   0

CAMERA
RES         128 128
FOVY        45
ITERATIONS  8
DEPTH       3
FILE        edge_test
EYE         0 0 6
LOOKAT      0 0 0
UP          0 1 0

// wall behind the sphere, covering the whole frame
OBJECT 0
cube
material 0
TRANS       0 0 -6
ROTAT       0 0 0
SCALE       60 60 0.2

// off-axis sphere (world radius 1) so x/y translations change the
// projected area too (perspective ellipse)
OBJECT 1
sphere
material 1
TRANS       1.2 0.4 0
ROTAT       0 0 0
SCALE       2 2 2
"""

OPTS = RenderOptions(antialias=False)
SPHERE = 1


def _scene():
    return parse_scene_text(SCENE_TEXT, base_dir=".")


def test_projection_roundtrip():
    """project_to_pixels inverts the ray-gen pixel mapping exactly."""
    scene = _scene()
    cam = scene.camera
    w, _ = cam.resolution
    ids = jnp.asarray([0, 5, 1000, 128 * 64 + 17, 128 * 128 - 1], jnp.uint32)
    o, d = generate_camera_rays_v(cam, jnp.int32(1), OPTS, pixel_ids=ids)
    pts = jnp.stack([o.x + 3.7 * d.x, o.y + 3.7 * d.y, o.z + 3.7 * d.z], -1)
    uv = project_to_pixels(pts, cam)
    np.testing.assert_allclose(np.asarray(uv[:, 0]), np.asarray(ids % w),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(uv[:, 1]), np.asarray(ids // w),
                               atol=5e-3)


def test_silhouette_points_are_tangent():
    scene = _scene()
    center = scene.geoms.translation[SPHERE]
    cam_pos = jnp.asarray(scene.camera.position)
    phis = jnp.linspace(0, 2 * jnp.pi, 64, endpoint=False)
    x = silhouette_points_sphere(center, 1.0, cam_pos, phis)
    r = jnp.linalg.norm(x - center[None], axis=-1)
    np.testing.assert_allclose(np.asarray(r), 1.0, atol=1e-5)
    tangency = jnp.einsum("nk,nk->n", x - center[None], x - cam_pos[None])
    np.testing.assert_allclose(np.asarray(tangency), 0.0, atol=1e-4)


def test_inside_outside_radiance():
    """Rays eps inside the silhouette hit the black sphere (L=0); rays eps
    outside hit the emissive wall (L=2)."""
    scene = _scene()
    cam = scene.camera
    center = scene.geoms.translation[SPHERE]
    phis = jnp.linspace(0, 2 * jnp.pi, 32, endpoint=False)
    x = silhouette_points_sphere(center, 1.0, jnp.asarray(cam.position), phis)
    uv = project_to_pixels(x, cam)
    ctr = jnp.mean(uv, axis=0, keepdims=True)
    n = (uv - ctr) / jnp.linalg.norm(uv - ctr, axis=-1, keepdims=True)
    for sgn, expect in ((-1.0, 0.0), (+1.0, 2.0)):
        o, d = rays_through_pixels(cam, uv + sgn * 1.0 * n)
        col = trace_radiance(scene, OPTS, o, d, jnp.int32(1))
        np.testing.assert_allclose(np.asarray(col.x), expect, atol=1e-5)


def _shoelace_area_oracle(scene, delta_axis, eps=2e-3, n=8192):
    """Central-difference d(projected silhouette area)/d(translation)."""
    cam = scene.camera
    cam_pos = jnp.asarray(cam.position)
    phis = jnp.linspace(0, 2 * jnp.pi, n, endpoint=False)

    def area(delta):
        c = scene.geoms.translation[SPHERE] + delta
        x = silhouette_points_sphere(c, 1.0, cam_pos, phis)
        uv = np.asarray(project_to_pixels(x, cam), np.float64)
        x0, y0 = uv[:, 0], uv[:, 1]
        x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
        return abs(np.sum(x0 * y1 - x1 * y0)) / 2.0

    d = np.zeros(3)
    d[delta_axis] = eps
    return (area(jnp.asarray(d)) - area(jnp.asarray(-d))) / (2 * eps)


def test_translation_gradient_matches_area_oracle():
    """Boundary estimator == (L_in - L_out)/N_px * dA/dtheta, all 3 axes."""
    scene = _scene()
    w, h = scene.camera.resolution
    # deterministic radiances here (black sphere / emissive wall), so a
    # handful of paths per edge sample suffices
    g = np.asarray(translation_gradient(scene, OPTS, SPHERE,
                                        n_edge=512, spp=2, eps_px=0.75))
    l_in, l_out = 0.0, 2.0
    for axis in range(3):
        da = _shoelace_area_oracle(scene, axis)
        expect = (l_in - l_out) * da / (w * h)
        np.testing.assert_allclose(
            g[axis], expect, rtol=0.04, atol=2e-6,
            err_msg=f"axis {axis}: estimator {g[axis]} vs oracle {expect}")
    # sanity: moving the (off-axis, x>0) sphere further out or closer both
    # change coverage; the z component must dominate and be negative
    # (toward the camera -> bigger silhouette -> darker image)
    assert g[2] < 0


def test_translation_gradient_matches_rendered_fd():
    """End-to-end: the estimator matches finite differences of the actual
    AA-jittered rendered mean image (the expectation the boundary term
    differentiates)."""
    scene = _scene()
    opts = RenderOptions(antialias=True)
    w, h = scene.camera.resolution
    g = np.asarray(translation_gradient(scene, opts, SPHERE,
                                        n_edge=512, spp=2, eps_px=0.75))

    def j(dz):
        geoms = translate_geom(scene.geoms, SPHERE,
                               jnp.asarray([0.0, 0.0, dz]))
        s = dataclasses.replace(scene, geoms=geoms)
        img, _, _ = render(s, opts, num_iterations=192)
        return float(jnp.mean(img))

    dz = 0.15
    fd = (j(dz) - j(-dz)) / (2 * dz)
    np.testing.assert_allclose(g[2], fd, rtol=0.08,
                               err_msg=f"estimator {g[2]} vs rendered FD {fd}")


BOX_SCENE_TEXT = SCENE_TEXT.replace(
    """OBJECT 1
sphere
material 1
TRANS       1.2 0.4 0
ROTAT       0 0 0
SCALE       2 2 2
""",
    """OBJECT 1
cube
material 1
TRANS       1.2 0.4 0
ROTAT       20 35 10
SCALE       1.6 1.2 1.4
""")
BOX = 1


def _box_scene():
    return parse_scene_text(BOX_SCENE_TEXT, base_dir=".")


def test_box_silhouette_loop_geometry():
    """The loop is closed, its vertices are cube corners/edge points, and
    every loop edge separates a front from a back face."""
    from ai_path_tracer_denoiser_tpu.render.edge_grad import (
        box_silhouette_loop, polygon_points)
    scene = _box_scene()
    verts = box_silhouette_loop(scene.geoms, BOX,
                                np.asarray(scene.camera.position))
    assert verts.shape[0] in (4, 6)
    # all loop vertices are corners of the transformed unit cube
    inv = np.asarray(scene.geoms.inverse_transform[BOX])
    h = np.concatenate([verts, np.ones((len(verts), 1))], axis=1)
    obj = (h @ inv.T)[:, :3]
    np.testing.assert_allclose(np.abs(obj), 0.5, atol=1e-5)
    # polygon_points interpolates along the loop
    phis = jnp.linspace(0.01, 2 * jnp.pi - 0.01, 37)
    pts = np.asarray(polygon_points(jnp.asarray(verts), phis))
    po = (np.concatenate([pts, np.ones((len(pts), 1))], 1) @ inv.T)[:, :3]
    # every sampled point lies ON the cube surface (some |coord| == 0.5)
    assert np.all(np.isclose(np.abs(po), 0.5, atol=1e-4).any(axis=1))


def _box_shoelace_area_oracle(scene, delta_axis, eps=2e-3, n=8192):
    """Central-difference d(projected silhouette area)/d(translation) for
    the cube — oracle mirror of _shoelace_area_oracle."""
    from ai_path_tracer_denoiser_tpu.render.edge_grad import (
        box_silhouette_loop, polygon_points)
    cam = scene.camera
    verts = jnp.asarray(box_silhouette_loop(scene.geoms, BOX,
                                            np.asarray(cam.position)))
    phis = jnp.linspace(0, 2 * jnp.pi, n, endpoint=False)

    def area(delta):
        x = polygon_points(verts, phis) + delta
        uv = np.asarray(project_to_pixels(x, cam), np.float64)
        x0, y0 = uv[:, 0], uv[:, 1]
        x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
        return abs(np.sum(x0 * y1 - x1 * y0)) / 2.0

    d = np.zeros(3)
    d[delta_axis] = eps
    return (area(jnp.asarray(d)) - area(jnp.asarray(-d))) / (2 * eps)


def test_box_translation_gradient_matches_area_oracle():
    """Cube boundary estimator == (L_in - L_out)/N_px * dA/dtheta."""
    scene = _box_scene()
    w, h = scene.camera.resolution
    g = np.asarray(translation_gradient(scene, OPTS, BOX,
                                        n_edge=512, spp=2, eps_px=0.75))
    l_in, l_out = 0.0, 2.0
    for axis in range(3):
        da = _box_shoelace_area_oracle(scene, axis)
        expect = (l_in - l_out) * da / (w * h)
        np.testing.assert_allclose(
            g[axis], expect, rtol=0.05, atol=3e-6,
            err_msg=f"axis {axis}: estimator {g[axis]} vs oracle {expect}")


def test_box_camera_gradient_duality():
    """With a uniform emissive wall, moving the camera equals moving the
    cube by the negative delta (cube edges are fixed on the body; only the
    projection moves)."""
    from ai_path_tracer_denoiser_tpu.render.edge_grad import (
        camera_translation_gradient)
    scene = _box_scene()
    g_cam = np.asarray(camera_translation_gradient(
        scene, OPTS, geom_indices=(BOX,), n_edge=512, spp=2))
    g_obj = np.asarray(translation_gradient(scene, OPTS, BOX, n_edge=512,
                                            spp=2, include_interior=False))
    np.testing.assert_allclose(g_cam, -g_obj, rtol=0.03, atol=3e-6)


MESH_SCENE_TEXT = SCENE_TEXT.replace(
    """OBJECT 1
sphere
material 1
TRANS       1.2 0.4 0
ROTAT       0 0 0
SCALE       2 2 2
""",
    """MESH 0
PATH        assets/icosahedron.obj
material 1
TRANS       1.2 0.4 0
ROTAT       15 30 0
SCALE       1.8 1.8 1.8
""")


def _mesh_scene():
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return parse_scene_text(MESH_SCENE_TEXT, base_dir=repo)


def test_mesh_silhouette_segments_geometry():
    """Silhouette segments of a watertight icosahedron: endpoints are mesh
    vertices, every segment separates a front from a back face, and the
    count is plausible for a convex 20-face solid."""
    from ai_path_tracer_denoiser_tpu.render.edge_grad import (
        mesh_silhouette_segments)
    scene = _mesh_scene()
    assert scene.mesh.bvh is None        # scan path, translate_mesh works
    P, Q, W = mesh_silhouette_segments(scene.mesh,
                                       np.asarray(scene.camera.position))
    assert 6 <= P.shape[0] <= 12         # convex solid: one loop of edges
    verts = np.asarray(scene.mesh.vertices)[:scene.mesh.num_faces].reshape(-1, 3)
    for pt in np.concatenate([P, Q]):
        assert np.min(np.linalg.norm(verts - pt[None], axis=1)) < 1e-4


def test_mesh_translation_gradient_matches_rendered_fd():
    """Boundary estimator for the mesh matches finite differences of the
    rendered mean image (x and z axes)."""
    from ai_path_tracer_denoiser_tpu.render.edge_grad import (
        mesh_translation_gradient, translate_mesh)
    scene = _mesh_scene()
    opts = RenderOptions(antialias=True)
    g = np.asarray(mesh_translation_gradient(scene, opts,
                                             samples_per_edge=48, spp=2,
                                             eps_px=0.75))

    def j(delta):
        s = dataclasses.replace(scene,
                                mesh=translate_mesh(scene.mesh,
                                                    jnp.asarray(delta)))
        img, _, _ = render(s, opts, num_iterations=160)
        return float(jnp.mean(img))

    for axis, step in ((0, 0.15), (2, 0.15)):
        d = np.zeros(3)
        d[axis] = step
        fd = (j(d) - j(-d)) / (2 * step)
        np.testing.assert_allclose(
            g[axis], fd, rtol=0.12, atol=3e-6,
            err_msg=f"mesh axis {axis}: estimator {g[axis]} vs FD {fd}")


def test_camera_translation_gradient():
    """Camera-translation boundary term vs the shoelace area oracle, plus
    the world/camera duality: with a uniform wall (no other moving edges),
    moving the camera by delta equals moving the sphere by -delta."""
    from ai_path_tracer_denoiser_tpu.render.edge_grad import (
        camera_translation_gradient)
    scene = _scene()
    cam = scene.camera
    w, h = cam.resolution
    g_cam = np.asarray(camera_translation_gradient(scene, OPTS,
                                                   n_edge=512, spp=2))

    # oracle: FD of the projected silhouette area as the camera moves
    phis = jnp.linspace(0, 2 * jnp.pi, 8192, endpoint=False)
    center = scene.geoms.translation[SPHERE]

    def area(delta):
        pos = jnp.asarray(cam.position) + delta
        x = silhouette_points_sphere(center, 1.0, pos, phis)
        uv = np.asarray(project_to_pixels(x, cam, position=pos), np.float64)
        x0, y0 = uv[:, 0], uv[:, 1]
        x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
        return abs(np.sum(x0 * y1 - x1 * y0)) / 2.0

    eps = 2e-3
    for axis in range(3):
        d = np.zeros(3)
        d[axis] = eps
        da = (area(jnp.asarray(d)) - area(jnp.asarray(-d))) / (2 * eps)
        expect = (0.0 - 2.0) * da / (w * h)
        np.testing.assert_allclose(g_cam[axis], expect, rtol=0.04, atol=2e-6,
                                   err_msg=f"camera axis {axis}")

    g_obj = np.asarray(translation_gradient(scene, OPTS, SPHERE, n_edge=512,
                                            spp=2, include_interior=False))
    np.testing.assert_allclose(g_cam, -g_obj, rtol=0.02, atol=2e-6)


def test_retrs_geom_matches_host_matrices():
    """retrs_geom at delta=0 reproduces the parser's host-built TRS
    matrices (build_transformation_matrix) to f32 rounding."""
    from ai_path_tracer_denoiser_tpu.render.edge_grad import retrs_geom

    scene = _box_scene()
    g = retrs_geom(scene.geoms, BOX, jnp.zeros((3,)), jnp.zeros((3,)))
    np.testing.assert_allclose(np.asarray(g.transform[BOX]),
                               np.asarray(scene.geoms.transform[BOX]),
                               rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(g.inverse_transform[BOX]),
                               np.asarray(scene.geoms.inverse_transform[BOX]),
                               rtol=0, atol=2e-6)


def test_rotation_gradient_sphere_is_zero():
    """A uniformly-scaled sphere is rotation-invariant: the estimator must
    return ~0 for d(image)/d(ROTAT) (both the boundary velocity and the
    interior term vanish)."""
    from ai_path_tracer_denoiser_tpu.render.edge_grad import rotation_gradient

    scene = _scene()
    g = np.asarray(rotation_gradient(scene, OPTS, SPHERE,
                                     n_edge=128, spp=2, eps_px=0.75))
    assert np.all(np.abs(g) < 1e-4), g


def test_scale_gradient_sphere_matches_rendered_fd():
    """d(mean image)/d(SCALE) of the sphere vs rendered finite differences
    along sx (anisotropic direction from a uniform starting point — the
    silhouette becomes an ellipse; the closed-form unit-sphere-circle
    pullback must track it)."""
    from ai_path_tracer_denoiser_tpu.render.edge_grad import (retrs_geom,
                                                              scale_gradient)

    scene = _scene()
    opts = RenderOptions(antialias=True)
    g = np.asarray(scale_gradient(scene, opts, SPHERE,
                                  n_edge=512, spp=2, eps_px=0.75))

    def j(ds):
        geoms = retrs_geom(scene.geoms, SPHERE, jnp.zeros((3,)),
                           jnp.asarray([ds, 0.0, 0.0]))
        s = dataclasses.replace(scene, geoms=geoms)
        img, _, _ = render(s, opts, num_iterations=192)
        return float(jnp.mean(img))

    ds = 0.1
    fd = (j(ds) - j(-ds)) / (2 * ds)
    np.testing.assert_allclose(g[0], fd, rtol=0.1,
                               err_msg=f"estimator {g[0]} vs rendered FD {fd}")
    # growing the black sphere darkens the image along every scale axis
    assert np.all(g < 0)


def test_rotation_gradient_box_matches_rendered_fd():
    """d(mean image)/d(ROTAT degrees) of a rotated box vs rendered finite
    differences along ry."""
    from ai_path_tracer_denoiser_tpu.render.edge_grad import (retrs_geom,
                                                              trs_gradient)

    scene = _box_scene()
    opts = RenderOptions(antialias=True)
    g = np.asarray(trs_gradient(scene, opts, BOX, "rotate",
                                n_edge=512, spp=2, eps_px=0.75))

    def j(dr):
        geoms = retrs_geom(scene.geoms, BOX, jnp.asarray([0.0, dr, 0.0]),
                           jnp.zeros((3,)))
        s = dataclasses.replace(scene, geoms=geoms)
        img, _, _ = render(s, opts, num_iterations=192)
        return float(jnp.mean(img))

    dr = 2.0      # degrees
    fd = (j(dr) - j(-dr)) / (2 * dr)
    # rotating the box sweeps silhouette area; both must see the same sign
    # and magnitude (FD noise floor at 192 spp is a few percent of |g|)
    np.testing.assert_allclose(g[1], fd, rtol=0.15, atol=3e-6,
                               err_msg=f"estimator {g[1]} vs rendered FD {fd}")
