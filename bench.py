"""Benchmark: 1-spp path-trace rate on the Cornell box (800x800, depth 8).

Headline metric (BASELINE.json): Mrays/s/chip — camera paths launched per
second at 1 spp.  Reference: GTX 1080Ti traces the same config in 0.072 s
per frame => 8.89 Mpaths/s (BASELINE.md).  vs_baseline is ours/reference
(>1 = faster).

Runs on whatever backend the environment provides (the real TPU chip under
the driver); the auto backend dispatch picks the Pallas megakernel there.
Prints exactly one JSON line.
"""
import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: the megakernel's first compile is ~2 min.
_CACHE = pathlib.Path(__file__).parent / ".jax_cache"
_CACHE.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE_SECONDS_PER_FRAME = 0.072  # README.md:55-59, imgs/results/infer.png
WIDTH = HEIGHT = 800
WARMUP_ITERS = 4
TIMED_ITERS = 64


def main():
    import dataclasses

    from ai_path_tracer_denoiser_tpu.config import RenderOptions
    from ai_path_tracer_denoiser_tpu.render import render
    from ai_path_tracer_denoiser_tpu.scene import load_scene
    from ai_path_tracer_denoiser_tpu.scene.camera import derive_camera

    scene = load_scene("scenes/cornell_box.txt")
    if scene.camera.resolution != (WIDTH, HEIGHT):
        cam = derive_camera((WIDTH, HEIGHT), 45.0,
                            np.asarray(scene.camera.position),
                            np.asarray(scene.camera.look_at),
                            np.asarray(scene.camera.up))
        scene = dataclasses.replace(scene, camera=cam)
    options = RenderOptions()

    # warmup + compile; fence with a host transfer (block_until_ready can
    # return early over tunneled device backends)
    _, _, state = render(scene, options, num_iterations=WARMUP_ITERS)
    np.asarray(state.accum.x)

    t0 = time.perf_counter()
    _, _, state = render(scene, options, num_iterations=TIMED_ITERS,
                         state=state)
    np.asarray(state.accum.x)
    dt = time.perf_counter() - t0

    seconds_per_frame = dt / TIMED_ITERS
    mrays = (WIDTH * HEIGHT) / seconds_per_frame / 1e6
    baseline_mrays = (WIDTH * HEIGHT) / REFERENCE_SECONDS_PER_FRAME / 1e6
    print(json.dumps({
        "metric": "pt_1spp_Mrays_per_s_per_chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline_mrays, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
