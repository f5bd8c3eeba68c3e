"""Quiet-chip mesh timing sweep: impl x scene crossover (r5).

Times 1-spp frames (depth 8 + depth 1) for every mesh scene class under
each eligible implementation:

  scan    dense Moller-Trumbore scan (no hierarchy)
  v2p     per-tile BVH kernel + carry octant/cell sort (r4 default)
  binned  pair-packed bin-major pipeline (r5)

Output: one JSON line per (scene, impl, depth) — the data behind the
routing crossover (VERDICT r4 #8) and the r5 mesh bench rows.  Run each
scene in a fresh process if a kernel wedges the backend:

    python tools/hw_mesh_sweep.py [scene_key ...]
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

SCENES = {
    "icosahedron": "scenes/cornell_mesh_icosahedron.txt",   # 20 faces
    "icosphere": "scenes/cornell_mesh_icosphere.txt",       # 320
    "torus": "scenes/cornell_mesh_torus.txt",               # 800
    "gem": "scenes/cornell_mesh_gem.txt",
    "blob": "scenes/cornell_mesh_blob.txt",                 # 5120
    "statue": "scenes/cornell_mesh_statue.txt",             # 81920
}
IMPLS = ("scan", "v2p", "binned")


def time_frames(scene, opts, n=6):
    import jax
    import jax.numpy as jnp

    from ai_path_tracer_denoiser_tpu.render.wavefront import (
        init_render_state, trace_iteration)
    fence = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))
    st = init_render_state(scene, opts)
    stepf = jax.jit(lambda s: trace_iteration(scene, opts, s))
    st = stepf(st)
    float(fence(st.accum.x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        st = stepf(st)
        float(fence(st.accum.x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    from ai_path_tracer_denoiser_tpu.config import RenderOptions
    from ai_path_tracer_denoiser_tpu.scene.parser import load_scene

    keys = sys.argv[1:] or list(SCENES)
    for key in keys:
        scene = load_scene(SCENES[key])
        for impl in IMPLS:
            if impl == "scan" and scene.mesh.num_faces > 8000:
                continue    # known ~10s/frame class; skip
            if impl == "scan":
                opts = RenderOptions(mesh_bvh=False, backend="xla")
            else:
                opts = RenderOptions(mesh_kernel_impl=impl, backend="xla")
            for depth in (8, 1):
                sc = dataclasses.replace(scene, trace_depth=depth)
                try:
                    ms = time_frames(sc, opts)
                except Exception as e:  # noqa
                    ms = None
                    print(json.dumps({"scene": key, "impl": impl,
                                      "depth": depth,
                                      "error": str(e)[:200]}), flush=True)
                    break
                print(json.dumps({
                    "scene": key, "faces": int(scene.mesh.num_faces),
                    "impl": impl, "depth": depth,
                    "ms_per_frame": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
