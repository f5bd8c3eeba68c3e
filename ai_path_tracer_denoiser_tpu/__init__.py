"""ai_path_tracer_denoiser_tpu — a TPU-native path-tracing + recurrent-denoising framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CUDA/libtorch project (Black-Phoenix/Ai-Path-Tracer-Denoiser):

  * a wavefront Monte-Carlo path tracer producing 1-spp frames plus a
    10-channel G-buffer (RGB, normal, depth, albedo), written as fully
    vectorized JAX with ``lax.scan`` bounce loops and optional Pallas kernels
    for the hot ray/triangle intersection stage,
  * a recurrent denoising autoencoder (U-Net with per-stage hidden states)
    trained on 7-frame temporal sequences with an L1 + HFEN + temporal loss,
  * a training/data-generation pipeline that keeps the G-buffer on device
    end-to-end (the reference round-trips device->host->device per frame,
    see /root/reference/Inference/src/main.cpp:101-118),
  * multi-chip scaling via ``jax.sharding`` meshes: data-parallel training,
    tile-sharded rendering, and halo-exchanged spatial sharding for the
    denoiser.

The public API mirrors the reference's component inventory (SURVEY.md §2)
but every piece is designed TPU-first rather than translated.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compile_cache():
    """Persistent XLA compile cache for every entry point.

    The megakernel's cold compile is minutes; the cache turns repeat runs
    (CLI invocations, the training pipeline, bench) into ~100 ms loads.
    Opt out with APTD_NO_COMPILE_CACHE=1; an explicit user-configured cache
    dir (env or jax.config) is never overridden.
    """
    if _os.environ.get("APTD_NO_COMPILE_CACHE") == "1":
        return
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    import jax
    cache = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), ".jax_cache")
    try:
        if jax.config.jax_compilation_cache_dir:
            return
        _os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except (OSError, AttributeError):  # read-only install dir, old jax
        pass


_enable_compile_cache()

from . import config as config  # noqa: E402,F401
