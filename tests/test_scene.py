"""Scene parser, transforms, camera derivation, OBJ loader, randomizer."""
import math

import numpy as np

from ai_path_tracer_denoiser_tpu.scene import (
    load_scene, parse_scene_text, build_transformation_matrix)
from ai_path_tracer_denoiser_tpu.scene.camera import (
    derive_camera, orbit_camera, orbit_params_from_camera)
from ai_path_tracer_denoiser_tpu.scene.obj_loader import parse_obj_text
from ai_path_tracer_denoiser_tpu.scene.randomizer import randomize_scene_text


def test_cornell_parse(cornell_scene):
    s = cornell_scene
    assert s.geoms.count == 7
    assert s.materials.count == 5
    assert s.camera.resolution == (800, 800)
    assert s.iterations == 5000 and s.trace_depth == 8
    assert float(s.materials.emittance[0]) == 5.0
    np.testing.assert_allclose(float(s.materials.index_of_refraction[4]), 1.33,
                               rtol=1e-6)
    # light cube scale
    np.testing.assert_allclose(np.asarray(s.geoms.scale[0]), [3, 0.3, 3], atol=1e-6)
    # velocity parsed on the sphere
    np.testing.assert_allclose(np.asarray(s.geoms.vel[6]), [0, -0.1, 0], atol=1e-6)


def test_transform_matrix_trs_order():
    # pure translation
    m = build_transformation_matrix((1, 2, 3), (0, 0, 0), (1, 1, 1))
    np.testing.assert_allclose(m[:3, 3], [1, 2, 3], atol=1e-6)
    # rotation 90deg about z maps +x to +y
    m = build_transformation_matrix((0, 0, 0), (0, 0, 90), (1, 1, 1))
    v = m @ np.array([1, 0, 0, 1.0])
    np.testing.assert_allclose(v[:3], [0, 1, 0], atol=1e-6)
    # scale is applied before rotation (T*R*S)
    m = build_transformation_matrix((0, 0, 0), (0, 0, 90), (2, 1, 1))
    v = m @ np.array([1, 0, 0, 1.0])
    np.testing.assert_allclose(v[:3], [0, 2, 0], atol=1e-6)


def test_inverse_consistency(cornell_scene):
    t = np.asarray(cornell_scene.geoms.transform)
    inv = np.asarray(cornell_scene.geoms.inverse_transform)
    prod = np.einsum("gij,gjk->gik", t, inv)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (t.shape[0], 1, 1)),
                               atol=1e-4)


def test_camera_derivation():
    cam = derive_camera((800, 800), 45.0, (0, 5, 10.5), (0, 5, 0), (0, 1, 0))
    np.testing.assert_allclose(np.asarray(cam.view), [0, 0, -1], atol=1e-6)
    # fov convention: yscaled = tan(45deg) = 1 -> pixelLength = 2/800
    np.testing.assert_allclose(np.asarray(cam.pixel_length), [2 / 800, 2 / 800],
                               atol=1e-8)
    # right = normalize(cross(view, up)) = cross((0,0,-1),(0,1,0)) = (1,0,0)
    np.testing.assert_allclose(np.asarray(cam.right), [1, 0, 0], atol=1e-5)


def test_orbit_roundtrip():
    cam = derive_camera((64, 64), 45.0, (0, 5, 10.5), (0, 5, 0), (0, 1, 0))
    phi, theta, zoom = orbit_params_from_camera(cam)
    cam2 = orbit_camera(cam, phi, theta, zoom)
    np.testing.assert_allclose(np.asarray(cam2.position),
                               np.asarray(cam.position), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cam2.view), np.asarray(cam.view),
                               atol=1e-5)


def test_obj_parser_triangles_and_quads():
    obj = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
f 1//1 2//1 3//1
f 1//1 2//1 3//1 4//1
"""
    v, n = parse_obj_text(obj)
    assert v.shape == (3, 3, 3)  # 1 tri + 1 quad -> 2 fan tris = 3 total
    np.testing.assert_allclose(n[0, 0], [0, 0, 1], atol=1e-6)


def test_obj_transform_applied():
    obj = "v 1 0 0\nv 0 1 0\nv 0 0 1\nf 1 2 3\n"
    m = build_transformation_matrix((10, 0, 0), (0, 0, 0), (2, 2, 2))
    v, n = parse_obj_text(obj, m)
    np.testing.assert_allclose(v[0, 0], [12, 0, 0], atol=1e-5)
    # no vn -> geometric normals, unit length
    np.testing.assert_allclose(np.linalg.norm(n[0, 0]), 1.0, atol=1e-5)


def test_mesh_block_scene(tmp_path):
    obj_path = tmp_path / "tri.obj"
    obj_path.write_text("v -5 0 -3\nv 5 0 -3\nv 0 8 -3\nf 1 2 3\n")
    text = f"""
MATERIAL 0
RGB 1 1 1
SPECEX 0
SPECRGB 0 0 0
REFL 0
REFR 0
REFRIOR 0
EMITTANCE 3

CAMERA
RES 32 32
FOVY 45
ITERATIONS 10
DEPTH 4
FILE meshtest
EYE 0 2 8
LOOKAT 0 2 0
UP 0 1 0

MESH 0
PATH {obj_path}
material 0
TRANS 0 0 0
ROTAT 0 0 0
SCALE 1 1 1
"""
    scene = parse_scene_text(text, base_dir=str(tmp_path))
    assert scene.mesh.num_faces == 1
    assert scene.mesh.padded_count % 128 == 0
    assert bool(scene.mesh.valid[0]) and not bool(scene.mesh.valid[1])
    np.testing.assert_allclose(np.asarray(scene.mesh.aabb_lb), [-5, 0, -3], atol=1e-5)


def test_randomizer_mutates_and_preserves_structure():
    template = open("scenes/cornell_box.txt").read()
    rng = np.random.default_rng(0)
    out = randomize_scene_text(template, rng)
    assert out != template
    # still parses, same component counts
    s = parse_scene_text(out)
    assert s.geoms.count == 7 and s.materials.count == 5
    # EYE moved
    assert "EYE         0.0 5 10.5" not in out
