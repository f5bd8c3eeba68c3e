"""Quick binned-impl probe: time one scene under the binned pipeline only.

Usage: python tools/hw_binned_probe.py <scene_key> [depth]
Cap knobs via env (APTD_BINNED_CA / APTD_BINNED_CB — import-time).
Depth-8 frames, 4 reps, one JSON line.  Companion to hw_mesh_sweep.py
for fast knob iteration (the full sweep times every impl and takes
minutes per scene).
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from hw_mesh_sweep import SCENES


def main():
    from ai_path_tracer_denoiser_tpu.config import RenderOptions
    from ai_path_tracer_denoiser_tpu.scene.parser import load_scene

    key = sys.argv[1]
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    scene = load_scene(SCENES[key])
    scene = dataclasses.replace(scene, trace_depth=depth)
    opts = RenderOptions(mesh_kernel_impl="binned", backend="xla")

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
    for _ in range(4):
        t0 = time.perf_counter()
        st = stepf(st)
        float(fence(st.accum.x))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({
        "scene": key, "depth": depth, "impl": "binned",
        "ca": os.environ.get("APTD_BINNED_CA", "12"),
        "cb": os.environ.get("APTD_BINNED_CB", "20"),
        "ms_per_frame": round(float(np.median(ts)) * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
