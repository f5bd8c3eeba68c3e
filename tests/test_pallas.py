"""Pallas megakernel: equivalence with the XLA wavefront path.

The megakernel (render/pallas_backend.py) reuses the exact SoA math of the
XLA path, so its output must be BIT-IDENTICAL — verified here in Pallas
interpreter mode on CPU (and holding on real TPU hardware, where the bench
path cross-checks against the XLA driver).
"""
import dataclasses

import numpy as np
import pytest

from ai_path_tracer_denoiser_tpu.config import RenderOptions
from ai_path_tracer_denoiser_tpu.render import render
from ai_path_tracer_denoiser_tpu.render.pallas_backend import (
    pallas_eligible, render_pallas)


def _small(scene, res=32, depth=3):
    from ai_path_tracer_denoiser_tpu.scene.camera import derive_camera
    cam = derive_camera((res, res), 45.0, np.asarray(scene.camera.position),
                        np.asarray(scene.camera.look_at),
                        np.asarray(scene.camera.up))
    return dataclasses.replace(scene, camera=cam, trace_depth=depth)


def test_pallas_matches_xla_bitexact(cornell_scene_small):
    scene = _small(cornell_scene_small)
    img_x, gb_x, _ = render(scene, RenderOptions(backend="xla"),
                            num_iterations=2)
    img_p, gb_p, _ = render(scene, RenderOptions(backend="pallas"),
                            num_iterations=2)
    np.testing.assert_array_equal(np.asarray(img_x), np.asarray(img_p))
    np.testing.assert_array_equal(np.asarray(gb_x), np.asarray(gb_p))


def test_pallas_accumulates_across_calls(cornell_scene_small):
    scene = _small(cornell_scene_small)
    opts = RenderOptions(backend="pallas")
    _, _, st = render(scene, opts, num_iterations=1)
    img_p, _, st = render(scene, opts, num_iterations=1, state=st)
    img_x, _, _ = render(scene, RenderOptions(backend="xla"),
                         num_iterations=2)
    assert int(st.iteration) == 2
    np.testing.assert_array_equal(np.asarray(img_x), np.asarray(img_p))


def test_pallas_eligibility_gates():
    from ai_path_tracer_denoiser_tpu.scene import load_scene
    scene = load_scene("scenes/cornell_box.txt")
    assert pallas_eligible(scene, RenderOptions())
    assert not pallas_eligible(scene, RenderOptions(sort_material=True))
    assert not pallas_eligible(scene, RenderOptions(motion_blur=True))
    assert not pallas_eligible(
        scene, RenderOptions(antialias=False, cache_first_bounce=True))
    assert not pallas_eligible(scene, RenderOptions(), differentiable=True)
    with pytest.raises(ValueError):
        render(scene, RenderOptions(backend="pallas", sort_material=True),
               num_iterations=1)


def test_pallas_nonsquare_and_padding(cornell_scene_small):
    """Pixel count not a multiple of the 128x128-lane tile pads correctly."""
    from ai_path_tracer_denoiser_tpu.scene.camera import derive_camera
    scene = cornell_scene_small
    cam = derive_camera((40, 24), 45.0, np.asarray(scene.camera.position),
                        np.asarray(scene.camera.look_at),
                        np.asarray(scene.camera.up))
    scene = dataclasses.replace(scene, camera=cam, trace_depth=2)
    img_x, gb_x, _ = render(scene, RenderOptions(backend="xla"),
                            num_iterations=1)
    img_p, gb_p, _ = render(scene, RenderOptions(backend="pallas"),
                            num_iterations=1)
    assert np.asarray(img_p).shape == (24, 40, 3)
    np.testing.assert_array_equal(np.asarray(img_x), np.asarray(img_p))
    np.testing.assert_array_equal(np.asarray(gb_x), np.asarray(gb_p))
