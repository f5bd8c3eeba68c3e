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
    import os
    from ai_path_tracer_denoiser_tpu.scene import load_scene
    scene = load_scene(os.path.join(os.path.dirname(__file__), "..",
                                    "scenes", "cornell_box.txt"))
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


def test_pallas_kernel_cache_reused_across_camera_moves(cornell_scene_small):
    """Interactive orbits must reuse one compiled kernel: the cache is keyed
    on scene content (geometry/materials/res/depth), not object identity,
    and the camera is a runtime SMEM input."""
    import dataclasses as dc
    import numpy as np
    from ai_path_tracer_denoiser_tpu.render import pallas_backend as PB
    from ai_path_tracer_denoiser_tpu.scene.camera import derive_camera

    scene = _small(cornell_scene_small)
    PB._KERNEL_CACHE.clear()
    opts = RenderOptions(backend="pallas")
    render(scene, opts, num_iterations=1)
    assert len(PB._KERNEL_CACHE) == 1
    # orbit: fresh Scene object each frame, same geometry
    cam2 = derive_camera(scene.camera.resolution, 45.0,
                         np.asarray(scene.camera.position) + [0.3, 0, 0],
                         np.asarray(scene.camera.look_at),
                         np.asarray(scene.camera.up))
    img2, _, _ = render(dc.replace(scene, camera=cam2), opts,
                        num_iterations=1)
    assert len(PB._KERNEL_CACHE) == 1, "camera move recompiled the kernel"
    img2x, _, _ = render(dc.replace(scene, camera=cam2),
                         RenderOptions(backend="xla"), num_iterations=1)
    np.testing.assert_array_equal(np.asarray(img2), np.asarray(img2x))


def test_pallas_kernel_cache_distinguishes_meshes():
    """Two scenes differing ONLY in mesh content must not share a compiled
    kernel (regression: the fingerprint once omitted scene.mesh, so a
    translated mesh silently rendered the stale baked geometry)."""
    import os
    import dataclasses as dc
    import numpy as np
    from ai_path_tracer_denoiser_tpu.render import pallas_backend as PB
    from ai_path_tracer_denoiser_tpu.scene import load_scene
    from ai_path_tracer_denoiser_tpu.scene.structs import make_mesh

    scene = load_scene(os.path.join(os.path.dirname(__file__), "..",
                                    "scenes", "cornell_mesh_icosahedron.txt"))
    scene = _small(scene, res=24, depth=2)
    nf = scene.mesh.num_faces
    verts = np.asarray(scene.mesh.vertices)[:nf].copy()
    norms = np.asarray(scene.mesh.normals)[:nf].copy()
    mats = np.asarray(scene.mesh.material_id)[:nf].copy()
    moved = make_mesh(verts + np.float32([0.0, 1.5, 0.0]), norms, mats)
    scene_moved = dc.replace(scene, mesh=moved)
    assert (PB._scene_fingerprint(scene)
            != PB._scene_fingerprint(scene_moved))

    PB._KERNEL_CACHE.clear()
    opts = RenderOptions(backend="pallas")
    img_a, _, _ = render(scene, opts, num_iterations=1)
    img_b, _, _ = render(scene_moved, opts, num_iterations=1)
    assert len(PB._KERNEL_CACHE) == 2, "mesh change did not re-key the cache"
    assert not np.array_equal(np.asarray(img_a), np.asarray(img_b)), (
        "translated mesh rendered identically — stale kernel reused")
    # and each matches its own XLA render
    img_bx, _, _ = render(scene_moved, RenderOptions(backend="xla"),
                          num_iterations=1)
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_bx),
                               atol=1e-6, rtol=0)


def test_pallas_pixel_split_fixup():
    """The float y=pid//w estimate + integer fix-up must be exact up to the
    2^23-pixel eligibility cap (naive float split breaks past ~2^22)."""
    import jax.numpy as jnp
    import numpy as np
    w = 2896
    n = 2 ** 23  # beyond the naive-exactness bound, at the eligibility cap
    pid = np.arange(n - 2 ** 20, n, dtype=np.int64)  # worst (largest) pids
    pid_i32 = jnp.asarray(pid, jnp.int32)
    pid_f = pid_i32.astype(jnp.float32)
    inv_w = np.float32(1.0 / w)
    y = jnp.floor((pid_f + 0.5) * inv_w).astype(jnp.int32)
    x = pid_i32 - y * np.int32(w)
    y = jnp.where(x < 0, y - 1, y)
    x = jnp.where(x < 0, x + np.int32(w), x)
    y = jnp.where(x >= w, y + 1, y)
    x = jnp.where(x >= w, x - np.int32(w), x)
    np.testing.assert_array_equal(np.asarray(y), pid // w)
    np.testing.assert_array_equal(np.asarray(x), pid % w)


def test_pallas_mesh_matches_xla():
    """Baked-constant triangle loop == XLA chunked mesh scan (to 1 ulp:
    constant folding changes FMA contraction in the triangle math — observed
    max diff 3e-8 on 1/10240 elements; geoms remain bit-exact)."""
    import os
    import dataclasses as dc
    import numpy as np
    from ai_path_tracer_denoiser_tpu.scene import load_scene
    from ai_path_tracer_denoiser_tpu.scene.camera import derive_camera

    scene = load_scene(os.path.join(os.path.dirname(__file__), "..",
                                    "scenes", "cornell_mesh_icosahedron.txt"))
    cam = derive_camera((32, 32), 45.0, np.asarray(scene.camera.position),
                        np.asarray(scene.camera.look_at),
                        np.asarray(scene.camera.up))
    scene = dc.replace(scene, camera=cam, trace_depth=3)
    assert scene.mesh.num_faces == 20
    img_x, gb_x, _ = render(scene, RenderOptions(backend="xla"),
                            num_iterations=2)
    img_p, gb_p, _ = render(scene, RenderOptions(backend="pallas"),
                            num_iterations=2)
    np.testing.assert_allclose(np.asarray(img_x), np.asarray(img_p),
                               atol=1e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(gb_x), np.asarray(gb_p),
                               atol=1e-6, rtol=0)
    # depth channel sees the mesh (closer than the back wall) somewhere
    assert (np.asarray(gb_x)[6] > 0).any()


# ---------------------------------------------------------------------------
# Operand-geometry mode: one compiled kernel per scene *layout*
# ---------------------------------------------------------------------------

def test_pallas_operand_matches_baked_bitexact(cornell_scene_small):
    """pallas_geometry="operand" (scene in SMEM scalars) reproduces the
    baked-constant kernel bit-for-bit: same math, constants vs sregs."""
    scene = _small(cornell_scene_small)
    img_b, gb_b, _ = render(scene, RenderOptions(backend="pallas"),
                            num_iterations=2)
    img_o, gb_o, _ = render(
        scene, RenderOptions(backend="pallas", pallas_geometry="operand"),
        num_iterations=2)
    np.testing.assert_array_equal(np.asarray(img_b), np.asarray(img_o))
    np.testing.assert_array_equal(np.asarray(gb_b), np.asarray(gb_o))


def test_pallas_operand_kernel_shared_across_scene_variants():
    """Randomizer variants (same geom layout, different transforms and
    materials) must reuse ONE compiled kernel in operand mode — the whole
    point of the mode (datagen scene streams don't recompile) — and still
    render *different* images."""
    import os
    from ai_path_tracer_denoiser_tpu.render.pallas_backend import \
        _KERNEL_CACHE
    from ai_path_tracer_denoiser_tpu.scene import parse_scene_text
    from ai_path_tracer_denoiser_tpu.scene.randomizer import generate_variants

    tmpl = open(os.path.join(os.path.dirname(__file__), "..", "scenes",
                             "template_random.txt")).read()
    base = os.path.join(os.path.dirname(__file__), "..", "scenes")
    v1, v2 = [_small(parse_scene_text(t, base_dir=base))
              for t in generate_variants(tmpl, 2, seed=7)]
    opts = RenderOptions(backend="pallas", pallas_geometry="operand")
    img1, _, _ = render(v1, opts, num_iterations=1)
    n_after_first = len(_KERNEL_CACHE)
    img2, _, _ = render(v2, opts, num_iterations=1)
    assert len(_KERNEL_CACHE) == n_after_first, \
        "second variant compiled a new kernel despite identical layout"
    assert not np.array_equal(np.asarray(img1), np.asarray(img2))
    # and the shared kernel is still exact vs the per-scene baked one
    img2_b, _, _ = render(v2, RenderOptions(backend="pallas"),
                          num_iterations=1)
    np.testing.assert_array_equal(np.asarray(img2_b), np.asarray(img2))
