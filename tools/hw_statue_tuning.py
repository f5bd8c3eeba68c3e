"""Statue traversal tuning matrix on hardware: kernel lanes x octant sort.

The r2 kernel gates tree descent per grid program; incoherent secondary
bounces at 1024-ray granularity degenerate to a near-serial cluster walk
(r2: 6,568 ms/frame).  This measures the two levers that shrink the
descent granule: ``mesh_kernel_lanes`` (1024 -> 128) and
``mesh_octant_sort`` (direction-coherent subtiles).  Results are
bitwise-invariant by construction (tests/test_bvh.py); this is purely a
wall-clock matrix.  Prints one JSON line.
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


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(_REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ai_path_tracer_denoiser_tpu.config import RenderOptions
    from ai_path_tracer_denoiser_tpu.render import render
    from ai_path_tracer_denoiser_tpu.scene import load_scene

    assert jax.default_backend() != "cpu"
    statue = load_scene("scenes/cornell_mesh_statue.txt")
    results = {}
    configs = [("l1024", 1024, False, "v2", 0),
               ("l128", 128, False, "v2", 0),
               ("l128_oct", 128, True, "v2", 0),
               ("l1024_oct", 1024, True, "v2", 0),
               ("v3", 128, False, "v3", 0),
               ("v3_oct", 128, True, "v3", 0),
               ("v2p", 1024, False, "v2p", 0),
               ("v2p_oct", 1024, True, "v2p", 0),
               ("v2p_oct_l128", 128, True, "v2p", 0),
               ("v2p_cell4", 1024, True, "v2p", 4),
               ("v2p_cell8", 1024, True, "v2p", 8),
               ("v2p_cell4_l128", 128, True, "v2p", 4),
               ("v2p_cell8_l128", 128, True, "v2p", 8),
               ("v2_cell8", 1024, True, "v2", 8),
               ("v2_cell8_l128", 128, True, "v2", 8)]
    only = os.environ.get("APTD_STATUE_CONFIGS")
    if only:
        names = set(only.split(","))
        configs = [c for c in configs if c[0] in names]
    iters = int(os.environ.get("APTD_STATUE_ITERS", "4"))
    for name, lanes, octant, impl, cells in configs:
        opts = RenderOptions(mesh_kernel_lanes=lanes,
                             mesh_octant_sort=octant,
                             mesh_kernel_impl=impl,
                             mesh_sort_cells=cells)
        t0 = time.perf_counter()
        _, _, state = render(statue, opts, num_iterations=1)
        np.asarray(state.accum.x[:1])
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        _, _, state = render(statue, opts, num_iterations=iters, state=state)
        np.asarray(state.accum.x[:1])
        ms = (time.perf_counter() - t0) / iters * 1e3
        results[name] = round(ms, 2)
        print(f"{name}: {ms:.1f} ms/frame", file=sys.stderr, flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
