"""Reproduce the reference's optimization-flag timing matrix.

The reference's one quantitative performance study (data/metrics.xlsx,
mirrored in BASELINE.md rows 10-15) times 500-iteration renders of two
mesh scenes under each optimization flag in isolation:

  none / +stream compaction / +material sorting / +first-bounce cache /
  +AABB ray culling / best combination

on cornell_timing_code.txt (great dodecicosacron — 60 star faces; the
reference checkout ships no Models/ dir, so ours is a 60-face spiked
icosahedron, assets/star.obj) and cornell_timing_code_2.txt (cube
mesh), 800x800, depth 8, GTX 1080Ti.

This driver runs the same matrix through the TPU framework's runtime
flags (config.RenderOptions — every reference #define is a field) on the
equivalent scenes (scenes/cornell_timing_1.txt, cornell_timing_2.txt) and
writes ``BENCH_MATRIX.md`` beside BASELINE.md with both datasets.

Methodology notes (also written into the table):
  * antialias=False for every row — the first-bounce cache asserts
    against AA (pathtrace.cu:435-436), and one AA setting across rows
    keeps the column comparable;
  * backend="xla" (the wavefront path) for every row — the Pallas
    megakernel does not implement sort/cache and would make rows
    incomparable; the default auto backend is faster than every row here;
  * "best" = compaction + cache + culling (the reference's winning trio;
    sorting lost badly on both its scenes, metrics.xlsx row 4).

Usage (on the TPU host):  python tools/bench_matrix.py [--iters 500]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("none", dict(stream_compaction=False, sort_material=False,
                  cache_first_bounce=False, ray_culling=False)),
    ("+ stream compaction", dict(stream_compaction=True, sort_material=False,
                                 cache_first_bounce=False, ray_culling=False)),
    ("+ material sorting", dict(stream_compaction=False, sort_material=True,
                                cache_first_bounce=False, ray_culling=False)),
    ("+ first-bounce cache", dict(stream_compaction=False, sort_material=False,
                                  cache_first_bounce=True, ray_culling=False)),
    ("+ AABB ray culling", dict(stream_compaction=False, sort_material=False,
                                cache_first_bounce=False, ray_culling=True)),
    ("best combination", dict(stream_compaction=True, sort_material=False,
                              cache_first_bounce=True, ray_culling=True)),
]

# metrics.xlsx rows (scene1 dodecicosacron, scene2 cube), milliseconds
REFERENCE_MS = {
    "none": (24304.2, 13104.8),
    "+ stream compaction": (30860.8, 14333.6),
    "+ material sorting": (73029.4, 64059.5),
    "+ first-bounce cache": (20462.8, 12239.5),
    "+ AABB ray culling": (19214.6, 9821.8),
    "best combination": (15668.1, 9283.2),
}

SCENES = ("scenes/cornell_timing_1.txt", "scenes/cornell_timing_2.txt")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_MATRIX.md"))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from ai_path_tracer_denoiser_tpu.config import RenderOptions
    from ai_path_tracer_denoiser_tpu.render import render
    from ai_path_tracer_denoiser_tpu.scene import load_scene

    scenes = [load_scene(os.path.join(REPO, p)) for p in SCENES]
    rows = {}
    for name, flags in CONFIGS:
        opts = RenderOptions(backend="xla", antialias=False, **flags)
        ms = []
        for scene in scenes:
            # warm the exact chunk-sized program the timed loop runs
            _, _, st = render(scene, opts, num_iterations=10)
            np.asarray(st.accum.x)
            t0 = time.perf_counter()
            # CHUNKED: one device program per <=10 iterations.  A single
            # 500-iteration program runs ~12 min on the BVH scene and the
            # tunneled TPU worker's watchdog kills it ('worker crashed or
            # restarted', reproduced twice r4).  state chaining keeps the
            # accumulation identical.
            done = 0
            st = None
            while done < args.iters:
                n = min(10, args.iters - done)
                _, _, st = render(scene, opts, num_iterations=n, state=st)
                done += n
            np.asarray(st.accum.x)                             # fence
            # normalize to the reference's 500-iteration budget: every
            # iteration is statistically identical work, so the scale is
            # exact up to noise (noted in the table when iters != 500)
            ms.append((time.perf_counter() - t0) * 1e3 * 500.0 / args.iters)
        rows[name] = ms
        print(f"{name:24s} {ms[0]:9.1f} ms  {ms[1]:9.1f} ms", flush=True)

    dev = jax.devices()[0].device_kind
    with open(args.out, "w") as f:
        f.write(f"""# BENCH_MATRIX — reproduced optimization-flag study

Reproduction of the reference's data/metrics.xlsx (BASELINE.md rows 10-15):
500-iteration renders, 800x800, depth 8, per optimization flag in
isolation.  Reference hardware: GTX 1080Ti; ours: {dev} (1 chip), XLA
wavefront backend, antialias off for every row (the cache asserts against
AA, pathtrace.cu:435-436).  Scene 1 = scenes/cornell_timing_1.txt
(mesh-heavy), scene 2 = scenes/cornell_timing_2.txt (cube mesh) — the
equivalents of cornell_timing_code{{,_2}}.txt.  "best" = compaction +
cache + culling (the reference's winning trio; sorting lost on both its
scenes).  Generated by tools/bench_matrix.py; measured over
iters={args.iters} and scaled to the 500-iteration budget (each
iteration is statistically identical work).

| Configuration | Scene 1 (TPU) | Scene 2 (TPU) | Scene 1 (1080Ti ref) | Scene 2 (1080Ti ref) | TPU speedup (s1) |
|---|---|---|---|---|---|
""")
        for name, _ in CONFIGS:
            m = rows[name]
            r = REFERENCE_MS[name]
            f.write(f"| {name} | {m[0]:,.0f} ms | {m[1]:,.0f} ms "
                    f"| {r[0]:,.1f} ms | {r[1]:,.1f} ms "
                    f"| {r[0] / m[0]:.1f}x |\n")
        base = rows["none"]
        f.write(f"""
## Where TPU behavior diverges from the GPU data

* **Material sorting** costs the reference 3-5x (thrust sort dominating,
  metrics.xlsx row 4) and costs even more here
  ({rows['+ material sorting'][0] / base[0]:.1f}x scene-1 baseline): TPU
  shading is branch-free full-width vector math, so material coherence
  buys *nothing*, while the permutation itself is pure loss — one stable
  argsort plus per-ray gathers of every carry plane, and gathers are the
  TPU's weakest memory op.  Directionally the same conclusion as the
  reference (sorting loses; it is off by default in both), amplified by
  the hardware.
* **Stream compaction** hurt the reference at 800x800 (row 3) and is a
  mask + early-exit here ({rows['+ stream compaction'][0] / base[0]:.2f}x
  scene-1 baseline): XLA's static shapes make *data movement* compaction
  pointless, but the early bounce-loop exit pays when most lanes die.
* **First-bounce cache** is parity-only under static shapes
  (render/wavefront.py): the fresh intersection is still computed and a
  select reproduces the cached values, so unlike the reference's skipped
  kernel launch ({REFERENCE_MS['+ first-bounce cache'][0] / REFERENCE_MS['none'][0]:.2f}x)
  it cannot win ({rows['+ first-bounce cache'][0] / base[0]:.2f}x).
* **Ray culling** gates the per-ray mesh work in both designs; on TPU the
  cluster-BVH kernel already seeds its traversal with the analytic-geom
  hit, so the whole-mesh AABB flag mostly helps the dense-scan fallback.
* These rows force the XLA wavefront backend for comparability; the
  default auto backend (Pallas megakernel on eligible scenes, cluster-BVH
  mesh kernel) is faster than every row in this table.
""")
    print(f"wrote {args.out}")
    print(json.dumps({k: [round(v, 1) for v in ms] for k, ms in rows.items()}))


if __name__ == "__main__":
    main()
