"""Strengthened tests for VERDICT r1 'weak' findings #5 and #8.

  * material-sort permutation exactness (replaces the vacuous mean check),
  * golden-value Fresnel/Schlick tests at hand-computed angles,
  * iteration-1 ray-gen seed semantics, documenting the reference deviation.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

from ai_path_tracer_denoiser_tpu.config import RenderOptions
from ai_path_tracer_denoiser_tpu.ops.bsdf import (fresnel_dielectric, schlick,
                                                  scatter_ray)
from ai_path_tracer_denoiser_tpu.ops.rng import draw_uniforms
from ai_path_tracer_denoiser_tpu.render import render
from ai_path_tracer_denoiser_tpu.render.wavefront import generate_camera_rays_v


# ---------------------------------------------------------------------------
# Material sorting: exact permutation round-trip
# ---------------------------------------------------------------------------

def test_sort_material_bitwise_at_depth1(cornell_scene_small):
    """With trace_depth=1 the sorted render must be BITWISE identical.

    The argsort permutation happens after the depth-0 shade (whose RNG is
    keyed on unpermuted lane ids), so the only sort-dependent stage left is
    the finalGather scatter-add by pixel_index — any indexing error in the
    permutation or the scatter shows up as a changed image.
    """
    scene = dataclasses.replace(cornell_scene_small, trace_depth=1)
    base = RenderOptions(backend="xla")
    img_plain, _, _ = render(scene, base, num_iterations=3)
    img_sorted, _, _ = render(
        scene, dataclasses.replace(base, sort_material=True), num_iterations=3)
    np.testing.assert_array_equal(np.asarray(img_plain), np.asarray(img_sorted))


def test_sort_material_depth2_all_diffuse(cornell_scene_small):
    """Depth-2, diffuse+emissive-only: still exact.

    Diffuse color multipliers never consume RNG (only directions do, and
    depth-1 shading is the last), so sorting must not change the image even
    with one real bounce.  Specular materials would legitimately differ (the
    reflect/refract pdf is keyed on the post-sort lane id, exactly like the
    reference's thread-indexed makeSeededRandomEngine, pathtrace.cu:341).
    """
    mats = cornell_scene_small.materials
    # strip reflect/refract so every non-emissive surface is diffuse
    mats = dataclasses.replace(
        mats, has_reflective=jnp.zeros_like(mats.has_reflective),
        has_refractive=jnp.zeros_like(mats.has_refractive))
    scene = dataclasses.replace(cornell_scene_small, materials=mats,
                                trace_depth=2)
    base = RenderOptions(backend="xla")
    img_plain, _, _ = render(scene, base, num_iterations=2)
    img_sorted, _, _ = render(
        scene, dataclasses.replace(base, sort_material=True), num_iterations=2)
    np.testing.assert_array_equal(np.asarray(img_plain), np.asarray(img_sorted))


# ---------------------------------------------------------------------------
# Fresnel / Schlick golden values (interactions.h:88-120)
# ---------------------------------------------------------------------------

def test_schlick_golden_values():
    # R0 = ((1-n)/(1+n))^2; ior=1.5 -> (0.5/2.5)^2 = 0.04 exactly.
    np.testing.assert_allclose(float(schlick(jnp.float32(1.0), 1.5)), 0.04,
                               rtol=1e-6)
    # grazing incidence: R -> 1
    np.testing.assert_allclose(float(schlick(jnp.float32(0.0), 1.5)), 1.0,
                               rtol=1e-6)
    # cos=0.5: 0.04 + 0.96 * 0.5^5 = 0.07
    np.testing.assert_allclose(float(schlick(jnp.float32(0.5), 1.5)), 0.07,
                               rtol=1e-5)


def test_fresnel_dielectric_golden_values():
    # normal incidence air->glass: ((1.5-1)/(1.5+1))^2 = 0.04
    np.testing.assert_allclose(
        float(fresnel_dielectric(jnp.float32(1.0), 1.0, 1.5)), 0.04, rtol=1e-5)
    # total internal reflection: glass->air beyond critical angle
    # (sin_c = 1/1.5 -> cos_c = 0.7454; cos_i = -0.5 is past critical)
    assert float(fresnel_dielectric(jnp.float32(-0.5), 1.0, 1.5)) == 1.0
    # 45 degrees air->glass, exact Fresnel equations:
    # sin_t = sin(45)/1.5, cos_t = sqrt(1-sin_t^2)
    ci = np.cos(np.radians(45.0))
    st = np.sin(np.radians(45.0)) / 1.5
    ct = np.sqrt(1 - st * st)
    r_par = (1.5 * ci - ct) / (1.5 * ci + ct)
    r_per = (ci - 1.5 * ct) / (ci + 1.5 * ct)
    expect = 0.5 * (r_par ** 2 + r_per ** 2)
    np.testing.assert_allclose(
        float(fresnel_dielectric(jnp.float32(ci), 1.0, 1.5)), expect, rtol=1e-5)


def _mat(reflective=0.0, refractive=0.0, ior=1.5):
    return dict(color=np.array([[0.9, 0.5, 0.1]], np.float32),
                specular_color=np.array([[1.0, 1.0, 1.0]], np.float32),
                has_reflective=np.array([reflective], np.float32),
                has_refractive=np.array([refractive], np.float32),
                index_of_refraction=np.array([ior], np.float32),
                emittance=np.array([0.0], np.float32))


def test_scatter_normal_incidence_reflect_vs_refract():
    """Refractive hit head-on: Schlick R = 0.04 splits the pdf draw.

    u1 < 0.04 -> mirror reflect with specular color; u1 >= 0.04 -> straight-
    through refraction with diffuse color (interactions.h:195-243).
    """
    d = np.array([[0.0, 0.0, -1.0]], np.float32)
    p = np.zeros((1, 3), np.float32)
    n = np.array([[0.0, 0.0, 1.0]], np.float32)
    mat = _mat(refractive=1.0)

    new_d, new_o, col = scatter_ray(d, p, n, mat,
                                    jnp.asarray([0.02], jnp.float32),
                                    jnp.asarray([0.0], jnp.float32))
    np.testing.assert_allclose(np.asarray(new_d), [[0.0, 0.0, 1.0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(col), [[1.0, 1.0, 1.0]], atol=1e-6)

    new_d, new_o, col = scatter_ray(d, p, n, mat,
                                    jnp.asarray([0.5], jnp.float32),
                                    jnp.asarray([0.0], jnp.float32))
    np.testing.assert_allclose(np.asarray(new_d), [[0.0, 0.0, -1.0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(col), [[0.9, 0.5, 0.1]], atol=1e-6)
    # origin advances 0.01 along the new direction (interactions.h:253)
    np.testing.assert_allclose(np.asarray(new_o), [[0.0, 0.0, -0.01]],
                               atol=1e-7)


def test_scatter_pure_reflective_mirror():
    """has_reflective=1, fresnels off: deterministic mirror bounce."""
    d = np.array([[1.0, -1.0, 0.0]], np.float32) / np.sqrt(2)
    p = np.zeros((1, 3), np.float32)
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    new_d, _, col = scatter_ray(d, p, n, _mat(reflective=1.0),
                                jnp.asarray([0.5], jnp.float32),
                                jnp.asarray([0.0], jnp.float32),
                                fresnels=False)
    expect = np.array([[1.0, 1.0, 0.0]]) / np.sqrt(2)
    np.testing.assert_allclose(np.asarray(new_d), expect, atol=1e-6)
    np.testing.assert_allclose(np.asarray(col), [[1.0, 1.0, 1.0]], atol=1e-6)


# ---------------------------------------------------------------------------
# Iteration-1 ray-gen seed semantics (wavefront.py generate_camera_rays_v)
# ---------------------------------------------------------------------------

def test_raygen_seed_semantics_documented(cornell_scene_small):
    """Our AA jitter is seeded with (iter, pixel, depth=0) at EVERY iteration.

    The reference seeds with pathSegments[index].remainingBounces
    (pathtrace.cu:162): from iteration 2 on that is always 0 (every path ends
    a frame with remainingBounces==0, whether terminated or bounced out), so
    depth=0 is *exact* parity there.  At iteration 1 the reference reads a
    freshly cudaMalloc'd buffer that is never memset (pathtrace.cu:96-129
    allocates dev_paths with no cudaMemset) — undefined garbage, so no
    deterministic implementation can match it; depth=0 is our documented
    stand-in.  This test pins that contract.
    """
    cam = cornell_scene_small.camera
    w, h = cam.resolution
    opts = RenderOptions()
    for iteration in (1, 2, 7):
        _, d = generate_camera_rays_v(cam, jnp.int32(iteration), opts)
        # recompute with the documented seed triple (iter, pixel, depth=0)
        idx = jnp.arange(w * h, dtype=jnp.uint32)
        u = draw_uniforms(jnp.int32(iteration), idx, 0, 2, opts.rng)
        x = (idx % w).astype(jnp.float32)
        y = (idx // w).astype(jnp.float32)
        px = cam.pixel_length[0] * (x - w * 0.5 + (u[0] - 0.5))
        py = cam.pixel_length[1] * (y - h * 0.5 + (u[1] - 0.5))
        from ai_path_tracer_denoiser_tpu.ops.vec3 import Vec3
        expect = Vec3(
            cam.view[0] - cam.right[0] * px - cam.up[0] * py,
            cam.view[1] - cam.right[1] * px - cam.up[1] * py,
            cam.view[2] - cam.right[2] * px - cam.up[2] * py).normalized()
        np.testing.assert_array_equal(np.asarray(d.x), np.asarray(expect.x))
        np.testing.assert_array_equal(np.asarray(d.y), np.asarray(expect.y))
        np.testing.assert_array_equal(np.asarray(d.z), np.asarray(expect.z))


def test_bvh_gate_conservative_on_boundary_ray():
    """A ray whose origin lies exactly on a BVH node bound with a zero
    direction component makes the slab test compute 0 * inf = NaN.  The
    dense scan has no per-cluster gates, so the traversal gate must treat
    NaN as "unbounded axis" (conservative) — NaN-propagating min/max would
    cull the node and silently lose the triangle the scan finds."""
    import jax.numpy as jnp
    from ai_path_tracer_denoiser_tpu.ops.bvh import build_mesh_bvh
    from ai_path_tracer_denoiser_tpu.ops.intersect import mesh_intersect_v
    from ai_path_tracer_denoiser_tpu.ops.vec3 import Vec3
    from ai_path_tracer_denoiser_tpu.render.mesh_kernel import (
        mesh_intersect_bvh)
    from ai_path_tracer_denoiser_tpu.scene.structs import make_mesh

    # axis-aligned triangle grid: every vertex (and so every un-widened
    # cluster bound) sits on integer x coordinates
    verts, norms, mats = [], [], []
    for gx in range(8):
        for gy in range(8):
            x, y = float(gx), float(gy)
            verts.append([[x, y, 0.0], [x + 1, y, 0.0], [x, y + 1, 0.0]])
            norms.append([[0, 0, 1]] * 3)
            mats.append(0)
    verts = np.asarray(verts, np.float32)
    norms = np.asarray(norms, np.float32)
    mats = np.asarray(mats, np.int32)
    mesh = make_mesh(verts, norms, mats)
    bvh, _ = build_mesh_bvh(verts, norms, mats)

    # rays riding exact node-bound planes with d.x == 0: the slab test
    # computes (bound - origin) * inf = 0 * inf = NaN for those nodes.
    # (The builder widens bounds off the geometry, so a NaN-culled node
    # cannot contain a true hit in practice — this pins down that the
    # gate stays conservative, scan-equal even in that corner.)
    bx = np.asarray(bvh.cluster_bounds)[:, [0, 3]].ravel()
    bx = np.unique(bx[np.isfinite(bx)])[:8]         # exact widened planes
    n = len(bx) + 4
    o = np.stack([np.concatenate([bx, [0.0, 4.0, 7.0, 2.0]]),
                  np.linspace(0.2, 7.2, n), np.ones(n)], 1)
    d = np.tile(np.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    ov = Vec3(*(jnp.asarray(o[:, k], jnp.float32) for k in range(3)))
    dv = Vec3(*(jnp.asarray(d[:, k], jnp.float32) for k in range(3)))
    t_ref = np.asarray(mesh_intersect_v(mesh, ov, dv)[0])
    t_k = np.asarray(mesh_intersect_bvh(bvh, ov, dv, interpret=True)[0])
    np.testing.assert_array_equal(t_ref, t_k)
    assert (t_ref > 0).any()            # the rays really do hit


def _write_frames(tmp_path, names, shape=(8, 8, 10), gshape=(8, 8, 3)):
    import numpy as np
    inp = tmp_path / "input"
    gt = tmp_path / "gt"
    inp.mkdir(exist_ok=True)
    gt.mkdir(exist_ok=True)
    for n in names:
        np.save(inp / n, np.zeros(shape, np.float32))
        np.save(gt / n, np.zeros(gshape, np.float32))
    return str(inp), str(gt)


def test_dataset_rejects_short_groups(tmp_path):
    """A (scene,mov,noise) group shorter than the window must fail loudly,
    not overrun into the next scene (silent cross-scene 'temporal' data)."""
    import pytest
    from ai_path_tracer_denoiser_tpu.data import SequenceDataset
    names = [f"000_0_0_{f:04d}.npy" for f in range(4)] + \
            [f"001_0_0_{f:04d}.npy" for f in range(9)]
    inp, gt = _write_frames(tmp_path, names)
    with pytest.raises(ValueError, match="sequence_length"):
        SequenceDataset(inp, gt, sequence_length=7)


def test_dataset_numeric_order_and_stray_files(tmp_path):
    """Raw-int reference filenames ('0_0_0_10' < '0_0_0_2' lexicographically)
    must window in FRAME order, and non-frame files must be ignored."""
    import numpy as np
    from ai_path_tracer_denoiser_tpu.data import SequenceDataset
    names = [f"0_0_0_{f}.npy" for f in range(12)]          # unpadded frames
    inp, gt = _write_frames(tmp_path, names)
    open(tmp_path / "input" / "README.txt", "w").write("stray")
    # tag each input frame with its frame number so windows are checkable
    for f in range(12):
        np.save(tmp_path / "input" / f"0_0_0_{f}.npy",
                np.full((8, 8, 10), f, np.float32))
    ds = SequenceDataset(inp, gt, sequence_length=7)
    assert len(ds) == 12
    # window anchored at frame 2 must be frames 2..8, not [2,20,21,...]
    idx = ds.inputs.index("0_0_0_2.npy")
    x, _ = ds[idx]
    assert [int(v) for v in x[:, 0, 0, 0]] == [2, 3, 4, 5, 6, 7, 8]
    # clamped end window: anchored at frame 11 -> frames 5..11
    idx = ds.inputs.index("0_0_0_11.npy")
    x, _ = ds[idx]
    assert [int(v) for v in x[:, 0, 0, 0]] == [5, 6, 7, 8, 9, 10, 11]
