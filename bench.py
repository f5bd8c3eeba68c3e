"""Benchmark: path-trace rate, denoiser latency, and train-step time.

Headline metric (BASELINE.json): Mrays/s/chip — camera paths launched per
second at 1 spp, 800x800, depth 8 Cornell.  Reference: GTX 1080Ti traces the
same config in 0.072 s per frame => 8.89 Mpaths/s (BASELINE.md).
vs_baseline is ours/reference (>1 = faster).

Robustness (VERDICT r1 weak #6): the render is timed over REPS back-to-back
windows and the MEDIAN is reported, with min/max spread in "extra".  The
denoiser-inference and train-step times (the other two reference headline
numbers: 153.8 ms infer, 797.7 ms/train-iter — BASELINE.md) ride along in
"extra" so BENCH_r* tracks all three axes.

Prints exactly one JSON line.

Isolation (VERDICT r3 weak #5): every subsystem after the headline render
runs in its OWN subprocess (``--section NAME``), each with a fresh backend
client — a Pallas fault that wedges the tunneled TPU backend nulls only its
own row instead of every row after it.  Cheap/safe rows run first; the
fault-prone mesh rows run last.
"""
import json
import os
import pathlib
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: the megakernel's first compile is ~2 min.
# Configured inside the entry points, NOT at import: importing this
# module (tests/test_bench_isolation.py) must not mutate global jax
# config — it silently re-enabled compile-cache writes under pytest,
# where serializing some executables segfaults (tests/conftest.py note).
_CACHE = pathlib.Path(__file__).parent / ".jax_cache"


def _setup_cache():
    _CACHE.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(_CACHE))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE_SECONDS_PER_FRAME = 0.072  # README.md:55-59, imgs/results/infer.png
REFERENCE_DENOISE_SECONDS = 0.1538   # README.md:201 (optimized TorchScript)
REFERENCE_TRAIN_STEP_SECONDS = 0.7977  # imgs/results/cpuvgpu.png
WIDTH = HEIGHT = 800
WARMUP_ITERS = 4
TIMED_ITERS = 64
REPS = 3


_fence_sum = None


def _fence(x):
    """Completion fence: a device-side scalar reduce fetched to host (4
    bytes over the tunnel).  block_until_ready can return early over the
    tunneled backend, and np.asarray of the full output would ship MBs
    through the relay per window — measuring the tunnel, not the chip."""
    global _fence_sum
    if _fence_sum is None:
        _fence_sum = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))
    float(_fence_sum(x))


def bench_render():
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

    _, _, state = render(scene, options, num_iterations=WARMUP_ITERS)
    _fence(state.accum.x)

    rates = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        _, _, state = render(scene, options, num_iterations=TIMED_ITERS,
                             state=state)
        _fence(state.accum.x)
        dt = time.perf_counter() - t0
        rates.append((WIDTH * HEIGHT) * TIMED_ITERS / dt / 1e6)
    return sorted(rates)


def bench_denoiser():
    """Full-frame deployed-inference latency at 800x800 padded to 832.

    Measures the BN-folded bf16 deployment path (models/inference.py) —
    the analogue of the reference's deployed TorchScript module
    (main.cpp:107-111, 153.8 ms) rather than its training graph.
    """
    from ai_path_tracer_denoiser_tpu.models import (apply_frame_fast,
                                                    init_autoencoder,
                                                    init_hidden,
                                                    prepare_inference)
    from ai_path_tracer_denoiser_tpu.config import ModelOptions

    opts = ModelOptions()
    params, bn_state = init_autoencoder(jax.random.PRNGKey(0), opts)
    folded = prepare_inference(params, bn_state, opts)
    h = w = 832
    x = jnp.zeros((1, h, w, 10), jnp.float32)
    hidden = init_hidden(1, h, w, opts, dtype=jnp.bfloat16)

    fn = jax.jit(lambda f, xx, hd: apply_frame_fast(f, xx, hd, opts))
    y, hidden_out = fn(folded, x, hidden)
    _fence(y)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(8):
            y, _ = fn(folded, x, hidden)
        _fence(y)
        times.append((time.perf_counter() - t0) / 8)

    # 1080p row (BASELINE.json's named resolution): 1920x1080 through the
    # pad-and-crop wrapper (H pads 1080 -> 1088, models/inference.py).
    from ai_path_tracer_denoiser_tpu.models import (apply_frame_fast_padded,
                                                    padded_resolution)
    h2, w2 = 1080, 1920
    hp, wp = padded_resolution(h2, w2)
    x2 = jnp.zeros((1, h2, w2, 10), jnp.float32)
    hidden2 = init_hidden(1, hp, wp, opts, dtype=jnp.bfloat16)
    fn2 = jax.jit(lambda f, xx, hd: apply_frame_fast_padded(f, xx, hd, opts))
    y2, _ = fn2(folded, x2, hidden2)
    _fence(y2)
    times_1080 = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(4):
            y2, _ = fn2(folded, x2, hidden2)
        _fence(y2)
        times_1080.append((time.perf_counter() - t0) / 4)
    return sorted(times), sorted(times_1080)


def _bench_scene_frames(scene, options, iters):
    """Median seconds per 1-spp frame for a prepared scene."""
    from ai_path_tracer_denoiser_tpu.render import render

    _, _, state = render(scene, options, num_iterations=2)
    _fence(state.accum.x)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        _, _, state = render(scene, options, num_iterations=iters,
                             state=state)
        _fence(state.accum.x)
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)


def bench_mesh_bvh():
    """Bunny-class mesh rates through the cluster-BVH Pallas kernel
    (ops/bvh.py, render/mesh_kernel.py) — the reference's brute-force
    per-ray loop (pathtrace.cu:258-281) cannot render meshes at this
    scale.  Three rows so traversal-scaling regressions are visible in the
    BENCH record (r2 VERDICT weak #8): the 81,920-face statue at full
    depth 8 (incoherent secondary rays — the hard case), the same scene at
    depth 1 (coherent primary rays only), and the 5,120-face blob."""
    import dataclasses

    from ai_path_tracer_denoiser_tpu.config import RenderOptions
    from ai_path_tracer_denoiser_tpu.scene import load_scene

    options = RenderOptions()
    statue = load_scene("scenes/cornell_mesh_statue.txt")
    rows = {}
    rows["statue"] = _bench_scene_frames(statue, options, 8)
    rows["statue_d1"] = _bench_scene_frames(
        dataclasses.replace(statue, trace_depth=1), options, 8)
    rows["blob"] = _bench_scene_frames(
        load_scene("scenes/cornell_mesh_blob.txt"), options, 8)
    return rows


def bench_mesh_mid():
    """Mid-size meshes (icosphere 320 / torus 800 faces): the >64-face
    megakernel-bake cliff made these invisible in earlier BENCH records
    (VERDICT r4 weak #2/#6); tracked rows keep the crossover honest."""
    from ai_path_tracer_denoiser_tpu.config import RenderOptions
    from ai_path_tracer_denoiser_tpu.scene import load_scene

    options = RenderOptions()
    return {
        "icosphere": _bench_scene_frames(
            load_scene("scenes/cornell_mesh_icosphere.txt"), options, 8),
        "torus": _bench_scene_frames(
            load_scene("scenes/cornell_mesh_torus.txt"), options, 8),
    }


def bench_interactive(scene_path="scenes/cornell_box.txt"):
    """End-to-end interactive frame: 1-spp 800^2 trace + G-buffer assembly
    + BN-folded bf16 denoise, per frame (the runCuda + denoise loop,
    main.cpp:120-168; reference ~0.072 s trace + 0.1538 s denoise).

    Called twice: on the meshless Cornell box (the megakernel fast path)
    and on a mesh scene (VERDICT r4 weak #5 — "interactive with a mesh"
    is the bar the mesh work chases; that row must exist to be tracked)."""
    import jax
    import dataclasses

    from ai_path_tracer_denoiser_tpu.config import ModelOptions, RenderOptions
    from ai_path_tracer_denoiser_tpu.models import (apply_frame_fast,
                                                    init_autoencoder,
                                                    init_hidden,
                                                    prepare_inference)
    from ai_path_tracer_denoiser_tpu.render import render_gbuffer_frame
    from ai_path_tracer_denoiser_tpu.scene import load_scene
    from ai_path_tracer_denoiser_tpu.scene.camera import derive_camera

    scene = load_scene(scene_path)
    if scene.camera.resolution != (WIDTH, HEIGHT):
        cam = derive_camera((WIDTH, HEIGHT), 45.0,
                            np.asarray(scene.camera.position),
                            np.asarray(scene.camera.look_at),
                            np.asarray(scene.camera.up))
        scene = dataclasses.replace(scene, camera=cam)
    options = RenderOptions()
    mopts = ModelOptions()
    params, bn_state = init_autoencoder(jax.random.PRNGKey(0), mopts)
    folded = prepare_inference(params, bn_state, mopts)
    # gbuffer transform inside the denoise program: 2 dispatches/frame
    denoise = jax.jit(lambda gbuf, hd: apply_frame_fast(
        folded, jnp.moveaxis(gbuf, 0, -1)[None], hd, mopts))
    hidden = init_hidden(1, HEIGHT, WIDTH, mopts, dtype=jnp.bfloat16)

    def frame(hidden):
        _, gbuf, _ = render_gbuffer_frame(scene, options)
        return denoise(gbuf, hidden)

    y, hidden = frame(hidden)
    _fence(y)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(4):
            y, hidden = frame(hidden)
        _fence(y)
        times.append((time.perf_counter() - t0) / 4)
    return sorted(times)


def bench_train_step():
    """Reference config: one 7-frame 256^2 sequence per step (train.py:50)."""
    from ai_path_tracer_denoiser_tpu.config import ModelOptions, TrainOptions
    from ai_path_tracer_denoiser_tpu.train import init_train_state, train_step

    topt = TrainOptions()
    state = init_train_state(jax.random.PRNGKey(0), ModelOptions(), topt)
    x = jnp.zeros((7, 1, 256, 256, 10), jnp.float32)
    y = jnp.zeros((7, 1, 256, 256, 3), jnp.float32)
    fn = jax.jit(lambda s, a, b: train_step(s, a, b, topt))
    state, m = fn(state, x, y)
    _fence(m["total"])
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(4):
            state, m = fn(state, x, y)
        _fence(m["total"])
        times.append((time.perf_counter() - t0) / 4)
    return sorted(times)


def _selftest_fault():
    raise RuntimeError("deliberate bench selftest fault")


SECTIONS = {
    "render": lambda: {"rates": bench_render()},
    "denoiser": lambda: dict(zip(("den", "den_1080"), bench_denoiser())),
    "train": lambda: {"tr": bench_train_step()},
    "interactive": lambda: {"inter": bench_interactive()},
    "interactive_mesh": lambda: {"inter_mesh": bench_interactive(
        "scenes/cornell_mesh_icosphere.txt")},
    "mesh_mid": lambda: {"mid": bench_mesh_mid()},
    "mesh": lambda: {"mesh": bench_mesh_bvh()},
    # test-only hooks (tests/test_bench_isolation.py): prove one faulting
    # section cannot null its siblings' rows
    "selftest_ok": lambda: {"ok": [1.0]},
    "selftest_fault": _selftest_fault,
}
# Cheap, fault-safe rows first; the Pallas mesh rows (the only known
# backend-wedge source) last so a wedge can null nothing downstream.
SECTION_ORDER = ("render", "denoiser", "train", "interactive",
                 "interactive_mesh", "mesh_mid", "mesh")
SECTION_TIMEOUT_S = {"render": 900, "denoiser": 1200, "train": 900,
                     "interactive": 1200, "interactive_mesh": 1500,
                     "mesh_mid": 1800, "mesh": 2400,
                     "selftest_ok": 300, "selftest_fault": 300}


def run_section(name):
    """Child-process entry: run one subsystem, print its raw result as the
    final stdout line."""
    _setup_cache()
    res = SECTIONS[name]()
    print("APTD_BENCH " + json.dumps(res))


def _spawn_section(name):
    """Run a section in a fresh process/backend-client; None on any
    failure (fault, timeout, unparsable output)."""
    try:
        proc = subprocess.run(
            [sys.executable, "-u", __file__, "--section", name],
            capture_output=True, text=True, cwd=str(_CACHE.parent),
            timeout=SECTION_TIMEOUT_S[name], env=os.environ.copy())
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith("APTD_BENCH "):
                return json.loads(line[len("APTD_BENCH "):])
        sys.stderr.write(f"[bench] section {name} produced no result "
                         f"(rc={proc.returncode}):\n{proc.stderr[-2000:]}\n")
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"[bench] section {name} timed out\n")
    return None


def main():
    _setup_cache()
    nan = [float("nan")]
    # Probe device identity BEFORE any section can wedge the backend.
    dev = jax.devices()[0]
    dev_kind = getattr(dev, "device_kind", str(dev))
    backend = jax.default_backend()

    def get(sec, key, default):
        res = _spawn_section(sec)
        return res[key] if res is not None else default

    # Headline render: no fallback — a dead renderer SHOULD fail loudly.
    render_res = _spawn_section("render")
    if render_res is None:
        raise SystemExit("headline render section failed")
    rates = render_res["rates"]
    mrays = rates[len(rates) // 2]
    baseline_mrays = (WIDTH * HEIGHT) / REFERENCE_SECONDS_PER_FRAME / 1e6
    den_res = _spawn_section("denoiser")
    den = den_res["den"] if den_res else nan
    den_1080 = den_res["den_1080"] if den_res else nan
    tr = get("train", "tr", nan)
    inter = get("interactive", "inter", nan)
    inter_mesh = get("interactive_mesh", "inter_mesh", nan)
    mid = get("mesh_mid", "mid", {k: nan for k in ("icosphere", "torus")})
    mesh = get("mesh", "mesh",
               {k: nan for k in ("statue", "statue_d1", "blob")})

    def med_ms(ts):
        v = ts[len(ts) // 2] * 1e3
        return None if v != v else round(v, 3)

    def ratio(ref_s, ts):
        v = ref_s / ts[len(ts) // 2]
        return None if v != v else round(v, 2)

    # Enough provenance to tell measurement noise from real drift
    # (VERDICT r3 weak #4): device kind, backend, iteration counts.
    print(json.dumps({
        "metric": "pt_1spp_Mrays_per_s_per_chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline_mrays, 3),
        "extra": {
            "device_kind": dev_kind,
            "backend": backend,
            "timed_iters": TIMED_ITERS,
            "render_Mrays_min_max": [round(rates[0], 3), round(rates[-1], 3)],
            "denoise_832sq_ms_median": med_ms(den),
            "denoise_vs_baseline": ratio(REFERENCE_DENOISE_SECONDS, den),
            "denoise_1080p_ms_median": med_ms(den_1080),
            "interactive_800sq_ms_median": med_ms(inter),
            "interactive_vs_baseline": ratio(
                REFERENCE_SECONDS_PER_FRAME + REFERENCE_DENOISE_SECONDS,
                inter),
            "train_step_ms_median": med_ms(tr),
            "train_step_vs_baseline": ratio(REFERENCE_TRAIN_STEP_SECONDS, tr),
            "interactive_mesh_icosphere_ms_median": med_ms(inter_mesh),
            "icosphere_320faces_1spp_ms_median": med_ms(mid["icosphere"]),
            "torus_800faces_1spp_ms_median": med_ms(mid["torus"]),
            "statue_81920faces_1spp_ms_median": med_ms(mesh["statue"]),
            "statue_depth1_ms_median": med_ms(mesh["statue_d1"]),
            "blob_5120faces_1spp_ms_median": med_ms(mesh["blob"]),
            "reps": REPS,
        },
    }))


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--section":
        sys.exit(run_section(sys.argv[2]))
    sys.exit(main())
