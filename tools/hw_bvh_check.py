"""Hardware (real-TPU) verification of the cluster-BVH mesh kernel.

tests/test_bvh.py proves kernel==scan bitwise in *interpret* mode on CPU;
this script proves the same property on the real chip (VERDICT r3 next #9)
and records per-scene frame timings.  Run stages separately to keep the
blast radius of a potential kernel fault small (a fault wedges the tunneled
backend for ~10-20 min):

    timeout 900 python tools/hw_bvh_check.py blob      # 5,120 faces
    timeout 900 python tools/hw_bvh_check.py statue    # 81,920 faces
    timeout 900 python tools/hw_bvh_check.py frames    # frame timings

Each stage prints one JSON line.  The pytest wrapper
tests/test_bvh_hw.py invokes the bitwise stages when APTD_TPU_TESTS=1.
"""
import dataclasses
import json
import os
import pathlib
import sys
import time

import numpy as np

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
os.chdir(_REPO)


def _log(msg):
    print(f"[hw_bvh_check +{time.perf_counter() - T0:.1f}s] {msg}",
          file=sys.stderr, flush=True)


T0 = time.perf_counter()


def _rays_for_mesh(mesh, n=4096, seed=1):
    """Mixed primary/secondary-style ray batch aimed at (and around) the
    mesh AABB: half from outside toward random AABB interior points (hit
    candidates), half fully random around the box (mostly misses)."""
    import jax.numpy as jnp

    from ai_path_tracer_denoiser_tpu.ops.vec3 import Vec3

    lb = np.asarray(mesh.aabb_lb, np.float32)
    ub = np.asarray(mesh.aabb_ub, np.float32)
    c = (lb + ub) / 2
    r = np.linalg.norm(ub - lb) / 2 + 1e-3
    rng = np.random.default_rng(seed)
    m = n // 2
    # aimed rays
    o1 = c + rng.normal(size=(m, 3)).astype(np.float32) * (3 * r)
    tgt = rng.uniform(lb, ub, (m, 3)).astype(np.float32)
    d1 = tgt - o1
    # random rays
    o2 = c + rng.uniform(-4 * r, 4 * r, (n - m, 3)).astype(np.float32)
    d2 = rng.normal(size=(n - m, 3)).astype(np.float32)
    o = np.concatenate([o1, o2]).astype(np.float32)
    d = np.concatenate([d1, d2]).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return (Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]),
                 jnp.asarray(o[:, 2])),
            Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
                 jnp.asarray(d[:, 2])))


def _bitwise_stage(scene_path, n_rays=4096, min_packed_rows=0, impl="v2"):
    import jax

    from ai_path_tracer_denoiser_tpu.ops.intersect import mesh_intersect_v
    if impl == "binned":
        from ai_path_tracer_denoiser_tpu.render.mesh_binned import (
            mesh_intersect_binned as mesh_intersect_bvh)
    elif impl == "v3":
        from ai_path_tracer_denoiser_tpu.render.mesh_kernel_v3 import (
            mesh_intersect_bvh_v3 as mesh_intersect_bvh)
    elif impl == "v2p":
        from ai_path_tracer_denoiser_tpu.render.mesh_kernel_v2p import (
            mesh_intersect_bvh_v2p as mesh_intersect_bvh)
    else:
        from ai_path_tracer_denoiser_tpu.render.mesh_kernel import (
            mesh_intersect_bvh)
    from ai_path_tracer_denoiser_tpu.scene import load_scene

    assert jax.default_backend() != "cpu", jax.default_backend()
    scene = load_scene(scene_path)
    mesh = scene.mesh
    assert mesh.bvh is not None
    if min_packed_rows:
        # rebuild with a padded face table (small-HBM-array experiment)
        import dataclasses

        from ai_path_tracer_denoiser_tpu.ops.bvh import build_mesh_bvh
        nb, _ = build_mesh_bvh(np.asarray(mesh.vertices[:mesh.num_faces]),
                               np.asarray(mesh.normals[:mesh.num_faces]),
                               np.asarray(mesh.material_id[:mesh.num_faces]),
                               reorder=False,
                               min_packed_rows=min_packed_rows)
        mesh = dataclasses.replace(mesh, bvh=nb)
        _log(f"padded face table to {nb.faces_packed.shape} "
             f"({nb.faces_packed.nbytes / 2**20:.1f} MiB)")
    _log(f"{scene_path}: {mesh.num_faces} faces, bvh "
         f"H={mesh.bvh.n_hypers} S={mesh.bvh.n_supers} "
         f"K={mesh.bvh.n_clusters}")
    ov, dv = _rays_for_mesh(mesh, n_rays)

    _log("running BVH kernel on hardware ...")
    t_k, p_k, n_k, m_k = mesh_intersect_bvh(mesh.bvh, ov, dv,
                                            interpret=False)
    t_k = np.asarray(t_k)
    _log(f"kernel done: {int(np.isfinite(t_k).sum())}/{n_rays} hits")

    _log("running dense scan oracle ...")
    t_r, p_r, n_r, m_r = mesh_intersect_v(mesh, ov, dv)
    t_r = np.asarray(t_r)
    _log(f"scan done: {int(np.isfinite(t_r).sum())}/{n_rays} hits")

    hit = np.isfinite(t_r)
    ok_t = bool(np.array_equal(t_r, t_k))
    ok_m = bool(np.array_equal(np.asarray(m_r), np.asarray(m_k)))
    ok_p = all(np.array_equal(np.asarray(a)[hit], np.asarray(b)[hit])
               for a, b in ((p_r.x, p_k.x), (p_r.y, p_k.y), (p_r.z, p_k.z)))
    # normals: normalized_safe rsqrt chain may FMA-differ -> ulp slack
    ok_n = all(np.allclose(np.asarray(a)[hit], np.asarray(b)[hit],
                           rtol=5e-7, atol=1e-7)
               for a, b in ((n_r.x, n_k.x), (n_r.y, n_k.y), (n_r.z, n_k.z)))
    return {"scene": scene_path, "faces": int(mesh.num_faces),
            "rays": n_rays, "hits": int(hit.sum()),
            "t_bitwise": ok_t, "mat_bitwise": ok_m, "point_bitwise": ok_p,
            "normal_ulp": ok_n,
            "ok": ok_t and ok_m and ok_p and ok_n}


def _soup_stage(n_faces, n_rays=2048, impl="v2"):
    """Synthetic-soup kernel-vs-scan check at an arbitrary face count."""
    import dataclasses

    import jax

    from ai_path_tracer_denoiser_tpu.ops.bvh import build_mesh_bvh
    from ai_path_tracer_denoiser_tpu.ops.intersect import mesh_intersect_v
    if impl == "binned":
        from ai_path_tracer_denoiser_tpu.render.mesh_binned import (
            mesh_intersect_binned as mesh_intersect_bvh)
    elif impl == "v3":
        from ai_path_tracer_denoiser_tpu.render.mesh_kernel_v3 import (
            mesh_intersect_bvh_v3 as mesh_intersect_bvh)
    else:
        from ai_path_tracer_denoiser_tpu.render.mesh_kernel import (
            mesh_intersect_bvh)
    from ai_path_tracer_denoiser_tpu.scene.structs import make_mesh

    assert jax.default_backend() != "cpu"
    rng = np.random.default_rng(0)
    centers = rng.uniform(-2, 2, (n_faces, 1, 3))
    verts = (centers + rng.uniform(-.3, .3, (n_faces, 3, 3))).astype(
        np.float32)
    norms = rng.normal(size=(n_faces, 3, 3)).astype(np.float32)
    norms /= np.linalg.norm(norms, axis=-1, keepdims=True)
    mats = rng.integers(0, 5, n_faces).astype(np.int32)
    bvh, order = build_mesh_bvh(verts, norms, mats)
    mesh = make_mesh(verts[order], norms[order], mats[order],
                     build_bvh=False)
    _log(f"soup {n_faces}: H={bvh.n_hypers} S={bvh.n_supers} "
         f"K={bvh.n_clusters} packed={bvh.faces_packed.nbytes/2**20:.1f}MiB")
    ov, dv = _rays_for_mesh(mesh, n_rays)
    _log("running BVH kernel on hardware ...")
    t_k, _, _, m_k = mesh_intersect_bvh(bvh, ov, dv, interpret=False)
    t_k = np.asarray(t_k)
    _log(f"kernel done: {int(np.isfinite(t_k).sum())}/{n_rays} hits")
    t_r, _, _, m_r = mesh_intersect_v(mesh, ov, dv)
    ok = bool(np.array_equal(np.asarray(t_r), t_k)
              and np.array_equal(np.asarray(m_r), np.asarray(m_k)))
    return {"faces": n_faces, "hits": int(np.isfinite(t_k).sum()),
            "ok": ok}


def _frames_stage():
    """Per-frame timings for the three BENCH mesh rows."""
    import jax

    from ai_path_tracer_denoiser_tpu.config import RenderOptions
    from ai_path_tracer_denoiser_tpu.render import render
    from ai_path_tracer_denoiser_tpu.scene import load_scene

    assert jax.default_backend() != "cpu"
    options = RenderOptions()
    out = {}

    def time_scene(name, scene, iters):
        _log(f"{name}: warmup/compile ...")
        _, _, state = render(scene, options, num_iterations=2)
        np.asarray(state.accum.x)
        t0 = time.perf_counter()
        _, _, state = render(scene, options, num_iterations=iters,
                             state=state)
        np.asarray(state.accum.x)
        ms = (time.perf_counter() - t0) / iters * 1e3
        _log(f"{name}: {ms:.2f} ms/frame")
        out[name] = round(ms, 3)

    blob = load_scene("scenes/cornell_mesh_blob.txt")
    time_scene("blob_ms", blob, 8)
    statue = load_scene("scenes/cornell_mesh_statue.txt")
    time_scene("statue_d1_ms",
               dataclasses.replace(statue, trace_depth=1), 8)
    time_scene("statue_ms", statue, 4)
    return out


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "blob"
    import jax
    _log("probing devices ...")
    devs = jax.devices()
    _log(f"devices: {devs}")

    if stage == "blob":
        res = _bitwise_stage("scenes/cornell_mesh_blob.txt")
    elif stage == "blob_padded":
        # decisive small-mesh experiment: same blob, face table padded
        # past the once-suspected size threshold (kept as a regression probe)
        res = _bitwise_stage("scenes/cornell_mesh_blob.txt",
                             min_packed_rows=8192)
    elif stage == "statue":
        res = _bitwise_stage("scenes/cornell_mesh_statue.txt")
    elif stage == "blob_v3":
        res = _bitwise_stage("scenes/cornell_mesh_blob.txt", impl="v3")
    elif stage == "statue_v3":
        res = _bitwise_stage("scenes/cornell_mesh_statue.txt", impl="v3")
    elif stage == "blob_v2p":
        res = _bitwise_stage("scenes/cornell_mesh_blob.txt", impl="v2p")
    elif stage == "statue_v2p":
        res = _bitwise_stage("scenes/cornell_mesh_statue.txt", impl="v2p")
    elif stage == "blob_binned":
        res = _bitwise_stage("scenes/cornell_mesh_blob.txt", impl="binned")
    elif stage == "statue_binned":
        res = _bitwise_stage("scenes/cornell_mesh_statue.txt",
                             impl="binned")
    elif stage == "frames":
        res = _frames_stage()
    elif stage.isdigit():
        # synthetic triangle soup of N faces: bisect the size threshold
        res = _soup_stage(int(stage))
    elif stage.startswith("soup_v3_") and stage[8:].isdigit():
        res = _soup_stage(int(stage[8:]), impl="v3")
    else:
        raise SystemExit(f"unknown stage {stage}")
    print(json.dumps({"stage": stage, **res}))
    return 0 if res.get("ok", True) else 1


if __name__ == "__main__":
    sys.exit(main())
