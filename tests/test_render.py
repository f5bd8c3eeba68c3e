"""End-to-end renderer behavior on a small Cornell box."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ai_path_tracer_denoiser_tpu.config import RenderOptions
from ai_path_tracer_denoiser_tpu.render import (
    render, render_gbuffer_frame, init_render_state, trace_iteration)
from ai_path_tracer_denoiser_tpu.ops.bsdf import (
    cosine_hemisphere_direction, schlick, fresnel_dielectric)


def test_render_produces_light(cornell_scene_small):
    img, gbuf, state = render(cornell_scene_small, RenderOptions(),
                              num_iterations=4)
    img = np.asarray(img)
    assert img.shape == (64, 64, 3)
    assert img.max() > 0.5            # the light is visible
    assert np.isfinite(img).all()
    # most of the view covers the box interior -> mostly lit pixels
    assert (img.sum(-1) > 0).mean() > 0.5


def test_gbuffer_channels(cornell_scene_small):
    opts = RenderOptions(flip_horizontal=False)
    img, gbuf, state = render(cornell_scene_small, opts, num_iterations=2)
    gbuf = np.asarray(gbuf)
    assert gbuf.shape == (10, 64, 64)
    normals = gbuf[3:6]
    lens = np.linalg.norm(normals, axis=0)
    hit = gbuf[6] > 0
    assert hit.mean() > 0.5                       # depth mostly filled
    np.testing.assert_allclose(lens[hit], 1.0, atol=1e-3)  # unit normals
    # albedo of hit pixels should be positive somewhere
    assert gbuf[7:10].max() > 0.1
    # depth should be near the wall distance (~10-16 range for this view)
    assert 5.0 < gbuf[6][hit].mean() < 20.0


def test_gbuffer_flip():
    pass  # covered by comparing flipped/unflipped below


def test_flip_horizontal(cornell_scene_small):
    img1, g1, _ = render(cornell_scene_small, RenderOptions(flip_horizontal=False),
                         num_iterations=1)
    img2, g2, _ = render(cornell_scene_small, RenderOptions(flip_horizontal=True),
                         num_iterations=1)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2)[:, :, ::-1],
                               atol=1e-6)


def test_accumulation_reduces_variance(cornell_scene_small):
    img4, _, _ = render(cornell_scene_small, RenderOptions(), num_iterations=4)
    img32, _, _ = render(cornell_scene_small, RenderOptions(), num_iterations=32)
    # Means should agree reasonably; variance of the higher-spp image lower.
    m4, m32 = float(np.mean(np.asarray(img4))), float(np.mean(np.asarray(img32)))
    assert abs(m4 - m32) / max(m32, 1e-6) < 0.35


def test_deterministic(cornell_scene_small):
    a, _, _ = render(cornell_scene_small, RenderOptions(), num_iterations=2)
    b, _, _ = render(cornell_scene_small, RenderOptions(), num_iterations=2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_no_aa_is_deterministic_per_pixel(cornell_scene_small):
    opts = RenderOptions(antialias=False, cache_first_bounce=False)
    a, _, _ = render(cornell_scene_small, opts, num_iterations=1)
    assert np.isfinite(np.asarray(a)).all()


def test_first_bounce_cache_matches(cornell_scene_small):
    """With AA off, caching the first bounce must not change the image."""
    base = RenderOptions(antialias=False)
    cached = RenderOptions(antialias=False, cache_first_bounce=True)
    a, _, _ = render(cornell_scene_small, base, num_iterations=3)
    b, _, _ = render(cornell_scene_small, cached, num_iterations=3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sort_material_permutation_roundtrip(cornell_scene_small):
    """The argsort permutation + pixel_index scatter-add is exact.

    At trace_depth=1 no post-sort RNG is consumed, so the sorted image must
    be BITWISE equal to the unsorted one — any indexing error in the
    permutation or the finalGather scatter-add shows up as a changed pixel.
    (Deeper exactness cases live in tests/test_weak_fixes.py.)
    """
    import dataclasses
    scene = dataclasses.replace(cornell_scene_small, trace_depth=1)
    a, _, _ = render(scene, RenderOptions(), num_iterations=2)
    b, _, _ = render(scene, RenderOptions(sort_material=True), num_iterations=2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ground_truth_mode_runs(cornell_scene_small):
    """GROUND_TRUTH-style accumulation: many iterations into one state."""
    img, gbuf, state = render(cornell_scene_small, RenderOptions(),
                              num_iterations=16)
    assert int(state.iteration) == 16


def test_motion_blur_moves_geometry(cornell_scene_small):
    opts = RenderOptions(motion_blur=True)
    img, _, state = render(cornell_scene_small, opts, num_iterations=8)
    # sphere (geom 6) has VEL 0 -0.1 0; after iters 4 and 8 -> dy = -0.02... *2
    ty = float(state.geoms.translation[6, 1])
    assert ty < 4.0  # moved down from initial 4.0
    assert np.isfinite(np.asarray(img)).all()


def test_differentiable_path(cornell_scene_small):
    """Gradient of mean radiance w.r.t. camera position flows and is finite."""
    import dataclasses as dc
    from ai_path_tracer_denoiser_tpu.render.wavefront import (
        init_render_state, trace_iteration, current_image)
    scene = dataclasses.replace(cornell_scene_small, trace_depth=3)
    opts = RenderOptions(antialias=False)

    def loss(position):
        cam = dc.replace(scene.camera, position=position)
        s = dc.replace(scene, camera=cam)
        state = init_render_state(s)
        state = trace_iteration(s, opts, state, differentiable=True)
        return jnp.mean(jnp.stack(list(state.accum)))

    g = jax.grad(loss)(scene.camera.position)
    assert np.isfinite(np.asarray(g)).all()


def test_bsdf_cosine_hemisphere_distribution():
    n = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (4096, 1))
    key = jax.random.PRNGKey(0)
    u1 = jax.random.uniform(key, (4096,))
    u2 = jax.random.uniform(jax.random.PRNGKey(1), (4096,))
    d = np.asarray(cosine_hemisphere_direction(n, u1, u2))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    assert (d[:, 2] >= 0).all()                 # hemisphere
    np.testing.assert_allclose(d[:, 2].mean(), 2 / 3, atol=0.03)  # cosine weight


def test_schlick_limits():
    assert abs(float(schlick(jnp.float32(1.0), jnp.float32(1.5))) - 0.04) < 1e-3
    assert float(schlick(jnp.float32(0.0), jnp.float32(1.5))) > 0.99


def test_fresnel_dielectric_tir():
    # grazing from dense to rare medium -> total internal reflection
    f = float(fresnel_dielectric(jnp.float32(-0.1), jnp.float32(1.0),
                                 jnp.float32(1.5)))
    assert f == 1.0


def test_material_gradient_matches_finite_differences(cornell_scene_small):
    """Pixel-gradient target (SURVEY.md north star): reverse-mode gradients of
    the rendered radiance w.r.t. the *continuous* scene parameters (material
    albedo, emittance) must match central finite differences.

    Note on scope: with cosine-weighted diffuse sampling the path throughput
    is the product of albedos times emittance, so radiance is piecewise
    CONSTANT in geometry/camera parameters — their a.e. gradient is exactly
    zero (boundary terms need edge-sampling/reparameterized estimators, a
    documented non-goal).  Albedo/emittance gradients are the well-posed
    ones, and they flow through the whole masked bounce loop.
    """
    import dataclasses as dc
    from ai_path_tracer_denoiser_tpu.render.wavefront import (
        init_render_state, trace_iteration)

    scene = dataclasses.replace(cornell_scene_small, trace_depth=3)
    opts = RenderOptions(antialias=False)

    def radiance(theta):
        albedo_scale, emit_scale = theta
        mats = dc.replace(scene.materials,
                          color=scene.materials.color * albedo_scale,
                          emittance=scene.materials.emittance * emit_scale)
        s = dc.replace(scene, materials=mats)
        state = trace_iteration(s, opts, init_render_state(s),
                                differentiable=True)
        return jnp.mean(jnp.stack(list(state.accum)))

    theta0 = jnp.array([1.0, 1.0], jnp.float32)
    g = np.asarray(jax.grad(radiance)(theta0))
    eps = 1e-3
    for k in range(2):
        tp = theta0.at[k].add(eps)
        tm = theta0.at[k].add(-eps)
        fd = (float(radiance(tp)) - float(radiance(tm))) / (2 * eps)
        assert np.isfinite(g[k]) and abs(g[k]) > 1e-4, (k, g)
        np.testing.assert_allclose(g[k], fd, rtol=0.02, atol=1e-4,
                                   err_msg=f"param {k}")


def test_checkify_render_finite(cornell_scene_small):
    """ERRORCHECK equivalent: per-iteration finite sweep raises on NaN/Inf."""
    from ai_path_tracer_denoiser_tpu.utils.debug import assert_render_finite
    assert_render_finite(cornell_scene_small, RenderOptions(), 1)
