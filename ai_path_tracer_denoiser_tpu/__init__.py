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

from . import config as config  # noqa: F401
