"""Compile-only probe of the mesh BVH kernel for a given scene/mesh size.

The tunneled backend defers Pallas/Mosaic compilation; a compile failure
can surface as FAILED_PRECONDITION at first execution, indistinguishable
from a runtime fault — but `.lower().compile()` forces the compile WITHOUT
executing, so a compile-stage root cause produces a real error message and
leaves the backend healthy.

    timeout 900 python tools/hw_mk_compile.py <scene-or-faces> [lanes]

<scene-or-faces>: a scene path, or an integer face count for a synthetic
triangle-soup mesh (ops/bvh build, same tables as a real scene).
"""
import os
import pathlib
import sys
import time

import numpy as np

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
os.chdir(_REPO)

T0 = time.perf_counter()


def log(m):
    print(f"[mk_compile +{time.perf_counter() - T0:.1f}s] {m}", flush=True)


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else "scenes/cornell_mesh_blob.txt"
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    import jax
    import jax.numpy as jnp

    from ai_path_tracer_denoiser_tpu.render import mesh_kernel as mk

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    if arg.isdigit():
        from ai_path_tracer_denoiser_tpu.ops.bvh import build_mesh_bvh
        f = int(arg)
        rng = np.random.default_rng(0)
        centers = rng.uniform(-2, 2, (f, 1, 3))
        verts = (centers + rng.uniform(-.3, .3, (f, 3, 3))).astype(np.float32)
        norms = rng.normal(size=(f, 3, 3)).astype(np.float32)
        norms /= np.linalg.norm(norms, axis=-1, keepdims=True)
        mats = rng.integers(0, 5, f).astype(np.int32)
        bvh, _ = build_mesh_bvh(verts, norms, mats)
    else:
        from ai_path_tracer_denoiser_tpu.scene import load_scene
        bvh = load_scene(arg).mesh.bvh
    log(f"bvh: faces={bvh.num_faces} H={bvh.n_hypers} S={bvh.n_supers} "
        f"K={bvh.n_clusters} packed={bvh.faces_packed.shape}")

    n_tiles = 4096 // lanes
    rays = jnp.zeros((n_tiles, 8, lanes), jnp.float32)
    log("lowering ...")
    lowered = mk._mesh_bvh_call.lower(bvh, rays, False)
    log("compiling ...")
    compiled = lowered.compile()
    log(f"COMPILE OK (memory: {compiled.memory_analysis()})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
