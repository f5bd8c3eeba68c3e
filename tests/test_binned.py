"""Binned (pair-packed) mesh kernel vs the dense scan — bitwise.

The binned pipeline (render/mesh_binned.py) must reproduce
mesh_intersect_v exactly: every MT evaluation is the same `_triangle_t`
f32 math, subscription is conservative, and the merge is the scan's
first-minimal-face rule.  These tests run the Pallas kernel in interpret
mode off-TPU (tests/conftest.py forces the 8-device CPU mesh) and
compiled on TPU.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_path_tracer_denoiser_tpu.ops.bvh import build_mesh_bvh
from ai_path_tracer_denoiser_tpu.ops.intersect import mesh_intersect_v
from ai_path_tracer_denoiser_tpu.ops.vec3 import Vec3
from ai_path_tracer_denoiser_tpu.render.mesh_binned import (
    mesh_intersect_binned)
from ai_path_tracer_denoiser_tpu.scene.structs import MeshData

INTERP = jax.default_backend() != "tpu"


def soup_mesh(n_faces, seed=0, spread=3.0):
    rng = np.random.default_rng(seed)
    base = (rng.uniform(-spread, spread, (n_faces, 1, 3))
            .repeat(3, axis=1).astype(np.float32))
    verts = base + rng.uniform(-0.4, 0.4, (n_faces, 3, 3)).astype(np.float32)
    normals = rng.normal(size=(n_faces, 3, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    mats = rng.integers(0, 5, n_faces).astype(np.int32)
    bvh, order = build_mesh_bvh(verts, normals, mats)
    verts, normals, mats = verts[order], normals[order], mats[order]
    lb = verts.reshape(-1, 3).min(axis=0)
    ub = verts.reshape(-1, 3).max(axis=0)
    mesh = MeshData(
        vertices=jnp.asarray(verts), normals=jnp.asarray(normals),
        material_id=jnp.asarray(mats),
        valid=jnp.ones((n_faces,), bool),
        aabb_lb=jnp.asarray(lb), aabb_ub=jnp.asarray(ub),
        num_faces=n_faces, bvh=bvh)
    return mesh


def rays(n, seed=1, spread=6.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (3, n)).astype(np.float32)
    d = rng.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    return Vec3(*map(jnp.asarray, o)), Vec3(*map(jnp.asarray, d))


def assert_matches_scan(mesh, o, d, t_cull=None, **kw):
    """Winner-exact everywhere; values bitwise on TPU, ulp-tight on CPU.

    On the real chip the pipeline is fully bitwise vs the scan (verified
    r5, asserted by tests/test_bvh_hw.py blob_binned/statue_binned).  On
    XLA:CPU the *scan itself* produces fusion-dependent 1-ulp t shifts
    (its _triangle_t fuses with the surrounding select/min; the identical
    formula outside that fusion lands 1 ulp away), so off-TPU the value
    comparison allows ulp slack while the winner (hit mask + material)
    stays exact.
    """
    ts, ps, ns, ms = mesh_intersect_v(mesh, o, d)
    tb, pb, nb, mb = mesh_intersect_binned(mesh.bvh, o, d, t_cull,
                                           interpret=INTERP, **kw)
    ts = np.asarray(ts)
    tb = np.asarray(tb)
    if t_cull is not None:
        # binned only guarantees hits strictly below t_cull (the exact
        # contract the scene merge relies on)
        keep = ts < np.asarray(t_cull)
        ts = np.where(keep, ts, np.inf)
    hit_s = np.isfinite(ts)
    hit_b = np.isfinite(tb)
    np.testing.assert_array_equal(hit_s, hit_b)
    np.testing.assert_array_equal(np.asarray(ms)[hit_s],
                                  np.asarray(mb)[hit_s])
    eq = np.testing.assert_array_equal if not INTERP else \
        lambda a, b: np.testing.assert_allclose(a, b, rtol=3e-6, atol=1e-6)
    eq(ts[hit_s], tb[hit_s])
    for a, b in ((ps, pb), (ns, nb)):
        for c in "xyz":
            eq(np.asarray(getattr(a, c))[hit_s],
               np.asarray(getattr(b, c))[hit_s])


@pytest.mark.parametrize("n_faces", [12, 300, 2048])
def test_binned_matches_scan_bitwise(n_faces):
    mesh = soup_mesh(n_faces, seed=n_faces)
    o, d = rays(4096, seed=2)
    assert_matches_scan(mesh, o, d)


def test_binned_with_cull():
    mesh = soup_mesh(512, seed=7)
    o, d = rays(2048, seed=3)
    rng = np.random.default_rng(4)
    t_cull = jnp.asarray(
        rng.uniform(0.5, 20.0, 2048).astype(np.float32))
    # some dead lanes
    t_cull = t_cull.at[::5].set(-np.inf)
    assert_matches_scan(mesh, o, d, t_cull)


def test_binned_fallback_on_tiny_caps():
    """Caps too small for the batch -> cond falls back to v2p, still
    bitwise-equal to the scan."""
    mesh = soup_mesh(256, seed=9)
    o, d = rays(2048, seed=5)
    assert_matches_scan(mesh, o, d, lcap=1024, lcapb=1024)


def test_binned_all_dead():
    mesh = soup_mesh(64, seed=11)
    o, d = rays(1024, seed=6)
    t_cull = jnp.full((1024,), -np.inf)
    tb, _, _, mb = mesh_intersect_binned(mesh.bvh, o, d, t_cull,
                                         interpret=INTERP)
    assert not np.isfinite(np.asarray(tb)).any()
    assert (np.asarray(mb) == -1).all()


def test_binned_in_wavefront_render():
    """Full render through kernel_impl='binned' == the dense-scan render."""
    import dataclasses

    from ai_path_tracer_denoiser_tpu.config import RenderOptions
    from ai_path_tracer_denoiser_tpu.render.wavefront import render
    from ai_path_tracer_denoiser_tpu.scene.parser import load_scene

    scene = load_scene(os.path.join(
        os.path.dirname(__file__), "..", "scenes",
        "cornell_mesh_icosahedron.txt"))
    scene = dataclasses.replace(scene, trace_depth=4)
    res = 96
    from ai_path_tracer_denoiser_tpu.scene.camera import derive_camera
    cam = derive_camera((res, res), float(scene.camera.fov[1]),
                        np.asarray(scene.camera.position),
                        np.asarray(scene.camera.look_at),
                        np.asarray(scene.camera.up))
    scene = dataclasses.replace(scene, camera=cam)

    img_scan, _, _ = render(scene, RenderOptions(
        backend="xla", mesh_bvh=False, denoise=False), num_iterations=2)
    img_bin, _, _ = render(scene, RenderOptions(
        backend="xla", mesh_bvh=True, mesh_kernel_impl="binned",
        denoise=False), num_iterations=2)
    # ulp tolerance off-TPU (see assert_matches_scan docstring); the
    # image path compounds the shifted t through shading, so allow a
    # slightly wider bound
    np.testing.assert_allclose(np.asarray(img_scan), np.asarray(img_bin),
                               rtol=1e-4, atol=1e-5)


def test_phase1_kernel_matches_xla_oracle():
    """The Pallas subscription kernel == the independent XLA bitmask
    formulation (_subscribe_bits + _peel_slots), slot for slot."""
    from ai_path_tracer_denoiser_tpu.ops.bvh import _DEAD_ROW
    from ai_path_tracer_denoiser_tpu.render.mesh_binned import (
        _DEADKEY, _peel_slots, _phase1, _subscribe_bits)

    mesh = soup_mesh(1024, seed=3)
    bvh = mesh.bvh
    kb = bvh.n_supers_real
    o, d = rays(4096, seed=8)
    rng = np.random.default_rng(9)
    tc = jnp.asarray(rng.uniform(0.5, 25.0, 4096).astype(np.float32))
    tc = tc.at[::7].set(-np.inf)

    slots_k, counts_k = _phase1(o, d, tc, bvh.super_bounds, kb, 0, 6,
                                interpret=INTERP)

    n_words = -(-kb // 32)
    need = n_words * 32
    bounds = jnp.concatenate(
        [bvh.super_bounds,
         jnp.tile(jnp.asarray(_DEAD_ROW),
                  (max(0, need - bvh.super_bounds.shape[0]), 1))])[:need]
    words, counts_x = _subscribe_bits(o, d, tc, bounds, n_words)
    slots_x, _ = _peel_slots(words, 6)

    np.testing.assert_array_equal(np.asarray(counts_k),
                                  np.asarray(counts_x))
    np.testing.assert_array_equal(np.asarray(slots_k), np.asarray(slots_x))
    assert int(np.asarray(counts_k).max()) > 0   # the case is non-trivial
