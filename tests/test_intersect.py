"""Intersection primitives vs closed-form oracles."""
import numpy as np
import jax.numpy as jnp

from ai_path_tracer_denoiser_tpu.ops.intersect import (
    box_intersect, sphere_intersect, triangle_intersect, ray_aabb_intersect,
    intersect_scene)
from ai_path_tracer_denoiser_tpu.scene.structs import (
    geom_matrices, make_geoms, make_mesh, SPHERE, CUBE)

I4 = jnp.eye(4)


def test_sphere_head_on():
    # unit-diameter sphere at origin; ray from z=+5 toward origin
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, point, normal, outside = sphere_intersect(I4, I4, I4, o, d)
    np.testing.assert_allclose(float(t[0]), 4.5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(point[0]), [0, 0, 0.5], atol=1e-3)
    np.testing.assert_allclose(np.asarray(normal[0]), [0, 0, 1], atol=1e-4)
    assert bool(outside[0])


def test_sphere_from_inside():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, point, normal, outside = sphere_intersect(I4, I4, I4, o, d)
    np.testing.assert_allclose(float(t[0]), 0.5, atol=1e-3)
    # inward-flipped normal
    np.testing.assert_allclose(np.asarray(normal[0]), [0, 0, 1], atol=1e-4)
    assert not bool(outside[0])


def test_sphere_miss():
    o = jnp.array([[2.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, *_ = sphere_intersect(I4, I4, I4, o, d)
    assert float(t[0]) == -1.0


def test_box_faces_and_scaling():
    m, inv, invt = geom_matrices((0, 0, 0), (0, 0, 0), (2, 4, 6))
    m, inv = jnp.asarray(m), jnp.asarray(inv)
    o = jnp.array([[0.0, 0.0, 10.0], [5.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [-1.0, 0.0, 0.0]])
    t, point, normal, outside = box_intersect(m, inv, o, d)
    np.testing.assert_allclose(np.asarray(t), [7.0, 4.0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(normal), [[0, 0, 1], [1, 0, 0]], atol=1e-4)
    assert bool(outside[0]) and bool(outside[1])


def test_box_from_inside():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, point, normal, outside = box_intersect(I4, I4, o, d)
    np.testing.assert_allclose(float(t[0]), 0.5, atol=1e-3)
    assert not bool(outside[0])


def test_triangle_hit_and_backface_cull():
    v = jnp.array([[[-1.0, -1.0, 0.0], [1.0, -1.0, 0.0], [0.0, 1.0, 0.0]]])
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (1, 3, 1)).reshape(1, 3, 3)
    o = jnp.array([[0.0, 0.0, 5.0], [0.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    t, point, normal = triangle_intersect(v, n, o, d)
    # glm one-sided test: determinant sign depends on winding; exactly one
    # of the two opposite rays may hit
    hits = (np.asarray(t) > 0).sum()
    assert hits == 1
    hit_t = np.asarray(t)[np.asarray(t) > 0]
    np.testing.assert_allclose(hit_t, [5.0], atol=1e-3)


def test_ray_aabb():
    lb = jnp.array([-1.0, -1.0, -1.0])
    ub = jnp.array([1.0, 1.0, 1.0])
    o = jnp.array([[0.0, 0.0, 5.0], [3.0, 3.0, 5.0], [0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    hit = np.asarray(ray_aabb_intersect(o, d, lb, ub))
    assert hit.tolist() == [True, False, True]  # inside-the-box ray counts


def test_intersect_scene_picks_closest():
    geoms = make_geoms([
        dict(type=SPHERE, material_id=7, translation=(0, 0, 0),
             rotation=(0, 0, 0), scale=(1, 1, 1)),
        dict(type=CUBE, material_id=3, translation=(0, 0, 3),
             rotation=(0, 0, 0), scale=(1, 1, 1)),
    ])
    mesh = make_mesh(np.zeros((0, 3, 3), np.float32),
                     np.zeros((0, 3, 3), np.float32), np.zeros((0,), np.int32))
    o = jnp.array([[0.0, 0.0, 10.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    out = intersect_scene(geoms, mesh, o, d)
    # cube at z=3 (near face 3.5... scale 1 cube spans z in [2.5, 3.5]) wins
    assert int(out["material_id"][0]) == 3
    np.testing.assert_allclose(float(out["t"][0]), 6.5, atol=1e-3)


def test_intersect_scene_mesh_and_geom():
    geoms = make_geoms([
        dict(type=SPHERE, material_id=1, translation=(0, 0, -5),
             rotation=(0, 0, 0), scale=(1, 1, 1)),
    ])
    # large triangle in the z=0 plane, in front of the sphere
    v = np.array([[[-5, -5, 0], [5, -5, 0], [0, 5, 0]]], np.float32)
    nrm = np.tile(np.array([0, 0, 1], np.float32), (1, 3, 1))
    mesh = make_mesh(v, nrm, np.array([9], np.int32))
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    out = intersect_scene(geoms, mesh, o, d)
    got_mat = int(out["material_id"][0])
    t = float(out["t"][0])
    if got_mat == 9:
        np.testing.assert_allclose(t, 5.0, atol=1e-3)
    else:
        # winding flipped -> backface culled; sphere should win then
        assert got_mat == 1
    # a ray that misses everything
    out2 = intersect_scene(geoms, mesh, jnp.array([[20.0, 0.0, 5.0]]), d)
    assert float(out2["t"][0]) == -1.0
    assert int(out2["material_id"][0]) == -1
