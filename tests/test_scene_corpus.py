"""Scene corpus: every shipped scene parses, and representative ones render.

Mirrors the reference's use of its curated scene set as feature oracles
(Inference/scenes/Scenes/, SURVEY.md C31): each scene exercises a feature
(AA, fresnels, meshes, motion blur, timing, randomizer template).
"""
import glob
import os

import numpy as np
import pytest

from ai_path_tracer_denoiser_tpu.config import RenderOptions
from ai_path_tracer_denoiser_tpu.render import render
from ai_path_tracer_denoiser_tpu.scene import load_scene, parse_scene_text
from ai_path_tracer_denoiser_tpu.scene.randomizer import generate_variants

SCENES_DIR = os.path.join(os.path.dirname(__file__), "..", "scenes")
ALL_SCENES = sorted(glob.glob(os.path.join(SCENES_DIR, "*.txt")))


def test_corpus_is_nonempty():
    assert len(ALL_SCENES) >= 15


def test_checked_in_randomized_corpus_parses():
    """scenes/scenes_created/: 30 committed training variants (reference
    ships scenes_created/ with ~30 — README.md:96-103); each must parse and
    have a light so datagen never renders black ground truths."""
    created = sorted(glob.glob(os.path.join(SCENES_DIR, "scenes_created",
                                            "*.txt")))
    # 30 randomize-CLI variants + the 28 train / 4 eval variants that
    # trained the shipped multi-scene model (seeds 42 / 777)
    assert len(created) == 62
    for path in created:
        scene = load_scene(path)
        assert float(np.asarray(scene.materials.emittance).max()) > 0
        assert scene.geoms.transform.shape[0] >= 7


@pytest.mark.parametrize("path", ALL_SCENES, ids=os.path.basename)
def test_scene_parses(path):
    scene = load_scene(path)
    assert scene.geoms.transform.shape[0] >= 2
    assert scene.materials.color.shape[0] >= 2
    # every scene must have at least one emissive material (a light)
    assert float(np.asarray(scene.materials.emittance).max()) > 0
    assert scene.camera.resolution == (800, 800)
    if "mesh" in os.path.basename(path) or "timing" in os.path.basename(path):
        assert scene.mesh.num_faces > 0


def _tiny(path, res=24, depth=3):
    import dataclasses
    from ai_path_tracer_denoiser_tpu.scene.camera import derive_camera
    scene = load_scene(path)
    cam = derive_camera((res, res), 45.0, np.asarray(scene.camera.position),
                        np.asarray(scene.camera.look_at),
                        np.asarray(scene.camera.up))
    return dataclasses.replace(scene, camera=cam, trace_depth=depth)


@pytest.mark.parametrize("name", [
    "cornell_fresnels.txt", "cornell_mesh_icosahedron.txt",
    "cornell_two_lights.txt", "spheres_grid.txt",
])
def test_scene_renders_light(name):
    scene = _tiny(os.path.join(SCENES_DIR, name))
    img, _, _ = render(scene, RenderOptions(), num_iterations=4)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01, f"{name} rendered black"


def test_mesh_blob_renders_and_occludes():
    """The 5120-face blob must actually block rays (depth closer than wall)."""
    scene = _tiny(os.path.join(SCENES_DIR, "cornell_mesh_blob.txt"), res=32)
    _, gbuf, _ = render(scene, RenderOptions(antialias=False),
                        num_iterations=1)
    depth = np.asarray(gbuf)[6]
    center = depth[14:19, 14:19]
    # camera sits ~15.5 units from the back wall; the blob surface is ~8-10
    assert 6.0 < center.mean() < 12.0, center


def test_mesh_statue_bvh_renders_and_occludes():
    """81,920-face statue (bunny/dragon-class): loads with a cluster BVH
    and the BVH-routed render produces correct occlusion."""
    scene = _tiny(os.path.join(SCENES_DIR, "cornell_mesh_statue.txt"), res=32)
    assert scene.mesh.num_faces == 81920
    assert scene.mesh.bvh is not None and scene.mesh.bvh.n_clusters >= 2560
    _, gbuf, _ = render(scene, RenderOptions(antialias=False),
                        num_iterations=1)
    depth = np.asarray(gbuf)[6]
    center = depth[14:19, 14:19]
    assert 6.0 < center.mean() < 12.0, center


def test_randomized_variants_parse_and_render():
    with open(os.path.join(SCENES_DIR, "template_random.txt")) as f:
        template = f.read()
    texts = list(generate_variants(template, 3, seed=42))
    assert len({t for t in texts}) == 3  # actually distinct
    for t in texts:
        scene = parse_scene_text(t, base_dir=SCENES_DIR)
        assert scene.geoms.transform.shape[0] == 10
    # render one tiny variant
    import dataclasses
    from ai_path_tracer_denoiser_tpu.scene.camera import derive_camera
    scene = parse_scene_text(texts[0], base_dir=SCENES_DIR)
    cam = derive_camera((16, 16), 45.0, np.asarray(scene.camera.position),
                        np.asarray(scene.camera.look_at),
                        np.asarray(scene.camera.up))
    scene = dataclasses.replace(scene, camera=cam, trace_depth=2)
    img, _, _ = render(scene, RenderOptions(), num_iterations=2)
    assert np.isfinite(np.asarray(img)).all()
