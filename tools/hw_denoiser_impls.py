"""Hardware timing of the deployed denoiser per conv_impl at 832^2 (+1080p).

Scalar-fenced (device-side reduce; full-array readbacks measure the
tunnel, not the chip).  Prints one JSON line.
"""
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
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(_REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ai_path_tracer_denoiser_tpu.config import ModelOptions
    from ai_path_tracer_denoiser_tpu.models import (apply_frame_fast,
                                                    init_autoencoder,
                                                    init_hidden,
                                                    prepare_inference)

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)
    opts = ModelOptions()
    params, bn_state = init_autoencoder(jax.random.PRNGKey(0), opts)
    folded = prepare_inference(params, bn_state, opts)
    fence = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))
    results = {}

    def bench(name, impl, h, w, reps=3, inner=16):
        x = jnp.zeros((1, h, w, 10), jnp.float32)
        hidden = init_hidden(1, h, w, opts, dtype=jnp.bfloat16)
        fn = jax.jit(lambda f, xx, hd: apply_frame_fast(
            f, xx, hd, opts, conv_impl=impl))
        t0 = time.perf_counter()
        y, _ = fn(folded, x, hidden)
        float(fence(y))
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(inner):
                y, _ = fn(folded, x, hidden)
            float(fence(y))
            times.append((time.perf_counter() - t0) / inner)
        ms = sorted(times)[len(times) // 2] * 1e3
        results[name] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms", file=sys.stderr, flush=True)

    bench("matmul_832", "matmul", 832, 832)
    bench("pallas2_832", "pallas2", 832, 832)
    bench("native_832", "native", 832, 832)
    bench("im2row_832", "im2row", 832, 832)
    try:
        # experimental: needs 128-aligned channel DMA (models/conv_kernel)
        bench("pallas_832", "pallas", 832, 832)
    except Exception as e:
        results["pallas_832"] = f"error: {type(e).__name__}"
        print(f"pallas_832 failed: {e}", file=sys.stderr, flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
