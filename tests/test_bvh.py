"""Cluster-BVH build + Pallas mesh kernel: exactness vs the brute scan.

The acceleration structure must be *invisible*: the kernel shares the
scan's per-pair arithmetic (ops/intersect.py:_triangle_t) and its
first-minimal-face tie-break, and every cull is conservative (widened
AABBs, strict-< merge) — so t/point/normal/material must match the dense
scan bitwise, not approximately.  The kernel runs in Pallas interpret
mode on the CPU test platform.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from ai_path_tracer_denoiser_tpu.ops.bvh import (
    CLUSTER, FANOUT, build_mesh_bvh)
from ai_path_tracer_denoiser_tpu.ops.intersect import mesh_intersect_v
from ai_path_tracer_denoiser_tpu.ops.vec3 import Vec3
from ai_path_tracer_denoiser_tpu.render.mesh_kernel import mesh_intersect_bvh
from ai_path_tracer_denoiser_tpu.scene.structs import make_mesh


def _soup(f=500, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-2, 2, (f, 1, 3))
    verts = (centers + rng.uniform(-0.3, 0.3, (f, 3, 3))).astype(np.float32)
    norms = rng.normal(size=(f, 3, 3)).astype(np.float32)
    norms /= np.linalg.norm(norms, axis=-1, keepdims=True)
    mats = rng.integers(0, 5, f).astype(np.int32)
    return verts, norms, mats


def _rays(n=1536, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ov = Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]))
    dv = Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]))
    return ov, dv


def test_build_invariants():
    verts, norms, mats = _soup(333)
    bvh, order = build_mesh_bvh(verts, norms, mats)
    assert sorted(order.tolist()) == list(range(333))
    f = 333
    v = verts[order]
    packed = np.asarray(bvh.faces_packed)
    assert np.array_equal(packed[:f, 0:9], v.reshape(f, 9))
    assert np.all(packed[f:, 18] == -1.0)

    cb = np.asarray(bvh.cluster_bounds)
    k = -(-f // CLUSTER)
    # every real face inside its (widened) cluster box
    for i in range(f):
        c = i // CLUSTER
        assert np.all(v[i].min(0) >= cb[c, 0:3] - 1e-5)
        assert np.all(v[i].max(0) <= cb[c, 3:6] + 1e-5)
    # padding clusters carry the DEAD-box row: per-axis point intervals at
    # +3e38 / -3e38 / 0 that can never jointly pass the orderless slab
    # test.  (A merely "inverted" box is NOT dead there — the per-axis
    # min/max neutralizes inversion, which is what caused the small-mesh
    # OOB-DMA faults on hardware.)
    from ai_path_tracer_denoiser_tpu.ops.bvh import _DEAD_ROW
    assert np.all(cb[k:] == _DEAD_ROW)
    # clusters inside supers inside hypers
    sb = np.asarray(bvh.super_bounds)
    hb = np.asarray(bvh.hyper_bounds)
    for c in range(k):
        s = c // FANOUT
        assert np.all(cb[c, 0:3] >= sb[s, 0:3] - 1e-5)
        assert np.all(cb[c, 3:6] <= sb[s, 3:6] + 1e-5)
        h = s // FANOUT
        assert np.all(sb[s, 0:3] >= hb[h, 0:3] - 1e-5)
        assert np.all(sb[s, 3:6] <= hb[h, 3:6] + 1e-5)
    # >= (not ==): the builder pads every bounds level to a 2*FANOUT-row
    # minimum (small tables faulted the v3 kernel's 8-row batch reads on
    # hardware), so parent tables can exceed ceil(children/FANOUT).
    assert bvh.n_hypers * FANOUT >= bvh.n_supers
    assert bvh.n_hypers % FANOUT == 0      # v3 reads hypers in 8-row batches
    assert bvh.n_supers * FANOUT >= bvh.n_clusters


def test_kernel_bitwise_equals_scan():
    verts, norms, mats = _soup(777)
    bvh, order = build_mesh_bvh(verts, norms, mats)
    mesh = make_mesh(verts[order], norms[order], mats[order], build_bvh=False)
    ov, dv = _rays()
    t_ref, p_ref, n_ref, m_ref = mesh_intersect_v(mesh, ov, dv)
    t_k, p_k, n_k, m_k = mesh_intersect_bvh(bvh, ov, dv, interpret=True)
    assert np.array_equal(np.asarray(t_ref), np.asarray(t_k))
    assert np.array_equal(np.asarray(m_ref), np.asarray(m_k))
    hit = np.isfinite(np.asarray(t_ref))
    for ca, cb_ in ((p_ref.x, p_k.x), (p_ref.y, p_k.y), (p_ref.z, p_k.z)):
        assert np.array_equal(np.asarray(ca)[hit], np.asarray(cb_)[hit])
    # normals go through normalized_safe (rsqrt chain), where XLA's FMA
    # contraction may differ between the jitted scan and the kernel: allow
    # ulp-level slack there, bitwise everywhere else.
    for ca, cb_ in ((n_ref.x, n_k.x), (n_ref.y, n_k.y), (n_ref.z, n_k.z)):
        np.testing.assert_allclose(np.asarray(ca)[hit], np.asarray(cb_)[hit],
                                   rtol=5e-7, atol=1e-7)


def test_kernel_lanes_bitwise_invariant():
    """The per-program tile width (descent-gating granule) is pure work
    partitioning: lanes=128 must reproduce lanes=1024 bit-for-bit."""
    verts, norms, mats = _soup(777)
    bvh, order = build_mesh_bvh(verts, norms, mats)
    ov, dv = _rays()
    t_a, p_a, n_a, m_a = mesh_intersect_bvh(bvh, ov, dv, interpret=True)
    t_b, p_b, n_b, m_b = mesh_intersect_bvh(bvh, ov, dv, interpret=True,
                                            lanes=128)
    assert np.array_equal(np.asarray(t_a), np.asarray(t_b))
    assert np.array_equal(np.asarray(m_a), np.asarray(m_b))
    for ca, cb_ in ((p_a.x, p_b.x), (p_a.y, p_b.y), (p_a.z, p_b.z),
                    (n_a.x, n_b.x), (n_a.y, n_b.y), (n_a.z, n_b.z)):
        assert np.array_equal(np.asarray(ca), np.asarray(cb_))


def test_kernel_t_cull_is_exact_pruning():
    verts, norms, mats = _soup(300, seed=7)
    bvh, order = build_mesh_bvh(verts, norms, mats)
    mesh = make_mesh(verts[order], norms[order], mats[order], build_bvh=False)
    ov, dv = _rays(1024, seed=3)
    t_ref = np.asarray(mesh_intersect_v(mesh, ov, dv)[0])
    rng = np.random.default_rng(9)
    tc = jnp.asarray(rng.uniform(0.5, 6.0, 1024).astype(np.float32))
    t_k = np.asarray(mesh_intersect_bvh(bvh, ov, dv, t_cull=tc,
                                        interpret=True)[0])
    tc_np = np.asarray(tc)
    finite = np.isfinite(t_k)
    # reported hits are the true hits and strictly beat the bound
    assert np.array_equal(t_k[finite], t_ref[finite])
    assert np.all(t_k[finite] < tc_np[finite])
    # pruned lanes truly had nothing below the bound
    assert np.all(~np.isfinite(t_ref[~finite]) | (t_ref[~finite] >= tc_np[~finite]))


def test_kernel_dead_lanes_skip():
    verts, norms, mats = _soup(200, seed=5)
    bvh, _ = build_mesh_bvh(verts, norms, mats)
    ov, dv = _rays(512, seed=4)
    dead = jnp.full((512,), -np.inf, jnp.float32)
    t_k, _, _, m_k = mesh_intersect_bvh(bvh, ov, dv, t_cull=dead,
                                        interpret=True)
    assert not np.isfinite(np.asarray(t_k)).any()
    assert np.all(np.asarray(m_k) == -1)


def test_make_mesh_bvh_threshold():
    verts, norms, mats = _soup(64)
    assert make_mesh(verts, norms, mats).bvh is None
    verts, norms, mats = _soup(66)
    mesh = make_mesh(verts, norms, mats)
    assert mesh.bvh is not None
    assert mesh.bvh.num_faces == 66
    # MeshData face arrays were reordered consistently with the BVH
    assert np.array_equal(
        np.asarray(mesh.vertices[:66]).reshape(66, 9),
        np.asarray(mesh.bvh.faces_packed[:66, 0:9]))


def test_render_bvh_matches_scan_image():
    """End-to-end: the BVH-routed wavefront render equals the scan render."""
    from ai_path_tracer_denoiser_tpu.config import RenderOptions
    from ai_path_tracer_denoiser_tpu.render import render
    from ai_path_tracer_denoiser_tpu.scene import load_scene
    from ai_path_tracer_denoiser_tpu.scene.camera import derive_camera

    scene = load_scene("scenes/cornell_mesh_icosphere.txt")
    assert scene.mesh.num_faces > 65 and scene.mesh.bvh is not None
    cam = derive_camera((96, 96), float(scene.camera.fov[1]),
                        np.asarray(scene.camera.position),
                        np.asarray(scene.camera.look_at),
                        np.asarray(scene.camera.up))
    scene = dataclasses.replace(scene, camera=cam)
    img_bvh, _, _ = render(scene, RenderOptions(backend="xla"),
                           num_iterations=2)
    img_scan, _, _ = render(scene, RenderOptions(backend="xla",
                                                 mesh_bvh=False),
                            num_iterations=2)
    assert np.array_equal(np.asarray(img_bvh), np.asarray(img_scan))
    assert float(np.asarray(img_bvh).mean()) > 0.01   # non-trivial image


def test_translate_mesh_shifts_bvh_rigidly():
    """translate_mesh on a BVH mesh (the default past BVH_MIN_FACES) must
    not raise, and the shifted BVH kernel must agree bitwise with the scan
    over the shifted vertices — the property mesh_translation_gradient's
    interior term relies on (render/edge_grad.py translate_mesh)."""
    from ai_path_tracer_denoiser_tpu.render.edge_grad import translate_mesh

    verts, norms, mats = _soup(400, seed=3)
    mesh = make_mesh(verts, norms, mats)          # auto-BVH (400 > 65)
    assert mesh.bvh is not None
    delta = jnp.asarray([0.37, -1.21, 0.58], jnp.float32)
    moved = translate_mesh(mesh, delta)
    assert moved.bvh is not None
    # vertices and faces_packed moved consistently
    assert np.array_equal(
        np.asarray(moved.vertices[:400]).reshape(400, 9),
        np.asarray(moved.bvh.faces_packed[:400, 0:9]))
    # monotone rounding keeps shifted bounds containing shifted faces, so
    # kernel-vs-scan stays bitwise (t, material) on the moved mesh
    ov, dv = _rays(512, seed=9)
    t_ref, _, _, m_ref = mesh_intersect_v(moved, ov, dv)
    t_k, _, _, m_k = mesh_intersect_bvh(moved.bvh, ov, dv, interpret=True)
    assert np.array_equal(np.asarray(t_ref), np.asarray(t_k))
    assert np.array_equal(np.asarray(m_ref), np.asarray(m_k))
    assert np.isfinite(np.asarray(t_k)).any()


def test_octant_sort_is_bitwise_identity():
    """octant_sort permutes rays before the kernel and inverts after — the
    result must be bit-for-bit the unsorted query's."""
    from ai_path_tracer_denoiser_tpu.ops.intersect import intersect_scene_v
    from ai_path_tracer_denoiser_tpu.scene import load_scene

    scene = load_scene("scenes/cornell_mesh_icosphere.txt")
    assert scene.mesh.bvh is not None
    ov, dv = _rays(640, seed=11)
    a = intersect_scene_v(scene.geoms, scene.mesh, ov, dv, octant_sort=False)
    b = intersect_scene_v(scene.geoms, scene.mesh, ov, dv, octant_sort=True)
    c = intersect_scene_v(scene.geoms, scene.mesh, ov, dv, octant_sort=True,
                          sort_cells=4)
    for res in (b, c):
        for k in ("t", "material_id"):
            assert np.array_equal(np.asarray(a[k]), np.asarray(res[k])), k
        for ca, cb_ in ((a["point"], res["point"]),
                        (a["normal"], res["normal"])):
            for pa, pb in ((ca.x, cb_.x), (ca.y, cb_.y), (ca.z, cb_.z)):
                assert np.array_equal(np.asarray(pa), np.asarray(pb))


def test_v3_kernel_bitwise_equals_scan():
    """The v3 front-to-back kernel shares the scan's arithmetic and
    tie-breaks: bitwise t/mat/point, ulp normals — same bar as v2."""
    from ai_path_tracer_denoiser_tpu.render.mesh_kernel_v3 import (
        mesh_intersect_bvh_v3)

    verts, norms, mats = _soup(777)
    bvh, order = build_mesh_bvh(verts, norms, mats)
    mesh = make_mesh(verts[order], norms[order], mats[order], build_bvh=False)
    ov, dv = _rays()
    t_ref, p_ref, n_ref, m_ref = mesh_intersect_v(mesh, ov, dv)
    t_k, p_k, n_k, m_k = mesh_intersect_bvh_v3(bvh, ov, dv, interpret=True)
    assert np.array_equal(np.asarray(t_ref), np.asarray(t_k))
    assert np.array_equal(np.asarray(m_ref), np.asarray(m_k))
    hit = np.isfinite(np.asarray(t_ref))
    for ca, cb_ in ((p_ref.x, p_k.x), (p_ref.y, p_k.y), (p_ref.z, p_k.z)):
        assert np.array_equal(np.asarray(ca)[hit], np.asarray(cb_)[hit])
    for ca, cb_ in ((n_ref.x, n_k.x), (n_ref.y, n_k.y), (n_ref.z, n_k.z)):
        np.testing.assert_allclose(np.asarray(ca)[hit], np.asarray(cb_)[hit],
                                   rtol=5e-7, atol=1e-7)


def test_v3_kernel_t_cull_and_dead_lanes():
    from ai_path_tracer_denoiser_tpu.render.mesh_kernel_v3 import (
        mesh_intersect_bvh_v3)

    verts, norms, mats = _soup(300, seed=7)
    bvh, order = build_mesh_bvh(verts, norms, mats)
    mesh = make_mesh(verts[order], norms[order], mats[order], build_bvh=False)
    ov, dv = _rays(1024, seed=3)
    t_ref = np.asarray(mesh_intersect_v(mesh, ov, dv)[0])
    rng = np.random.default_rng(9)
    tc = jnp.asarray(rng.uniform(0.5, 6.0, 1024).astype(np.float32))
    t_k = np.asarray(mesh_intersect_bvh_v3(bvh, ov, dv, t_cull=tc,
                                           interpret=True)[0])
    finite = np.isfinite(t_k)
    assert np.array_equal(t_k[finite], t_ref[finite])
    assert np.all(t_k[finite] < np.asarray(tc)[finite])
    assert np.all(~np.isfinite(t_ref[~finite])
                  | (t_ref[~finite] >= np.asarray(tc)[~finite]))
    dead = jnp.full((1024,), -np.inf, jnp.float32)
    t_d, _, _, m_d = mesh_intersect_bvh_v3(bvh, ov, dv, t_cull=dead,
                                           interpret=True)
    assert not np.isfinite(np.asarray(t_d)).any()
    assert np.all(np.asarray(m_d) == -1)


def test_render_v3_matches_v2_image():
    """End-to-end: mesh_kernel_impl='v3' renders the identical image."""
    from ai_path_tracer_denoiser_tpu.config import RenderOptions
    from ai_path_tracer_denoiser_tpu.render import render
    from ai_path_tracer_denoiser_tpu.scene import load_scene
    from ai_path_tracer_denoiser_tpu.scene.camera import derive_camera

    scene = load_scene("scenes/cornell_mesh_icosphere.txt")
    cam = derive_camera((64, 64), float(scene.camera.fov[1]),
                        np.asarray(scene.camera.position),
                        np.asarray(scene.camera.look_at),
                        np.asarray(scene.camera.up))
    scene = dataclasses.replace(scene, camera=cam)
    img2, _, _ = render(scene, RenderOptions(backend="xla"),
                        num_iterations=2)
    img3, _, _ = render(scene, RenderOptions(backend="xla",
                                             mesh_kernel_impl="v3"),
                        num_iterations=2)
    assert np.array_equal(np.asarray(img2), np.asarray(img3))


def test_v2p_kernel_bitwise_equals_scan():
    """v2p (pipelined-DMA variant of v2): bitwise vs the dense scan, and
    the t_cull/dead-lane contract."""
    from ai_path_tracer_denoiser_tpu.render.mesh_kernel_v2p import (
        mesh_intersect_bvh_v2p)

    verts, norms, mats = _soup(777)
    bvh, order = build_mesh_bvh(verts, norms, mats)
    mesh = make_mesh(verts[order], norms[order], mats[order], build_bvh=False)
    ov, dv = _rays()
    t_ref, p_ref, n_ref, m_ref = mesh_intersect_v(mesh, ov, dv)
    for subtile in (False, True):   # v2p and v2s (per-128-lane MT gating)
        t_k, p_k, n_k, m_k = mesh_intersect_bvh_v2p(bvh, ov, dv,
                                                    interpret=True,
                                                    subtile=subtile)
        assert np.array_equal(np.asarray(t_ref), np.asarray(t_k)), subtile
        assert np.array_equal(np.asarray(m_ref), np.asarray(m_k)), subtile
        hit = np.isfinite(np.asarray(t_ref))
        for ca, cb_ in ((p_ref.x, p_k.x), (p_ref.y, p_k.y),
                        (p_ref.z, p_k.z)):
            assert np.array_equal(np.asarray(ca)[hit], np.asarray(cb_)[hit])
        for ca, cb_ in ((n_ref.x, n_k.x), (n_ref.y, n_k.y),
                        (n_ref.z, n_k.z)):
            np.testing.assert_allclose(np.asarray(ca)[hit],
                                       np.asarray(cb_)[hit],
                                       rtol=5e-7, atol=1e-7)
    dead = jnp.full((1536,), -np.inf, jnp.float32)
    t_d, _, _, m_d = mesh_intersect_bvh_v2p(bvh, ov, dv, t_cull=dead,
                                            interpret=True)
    assert not np.isfinite(np.asarray(t_d)).any()
    assert np.all(np.asarray(m_d) == -1)
