"""Decompose denoiser latency: where do the ~40 ms go?

The r2 profile (tools/profile_denoiser.py) showed bf16 ~= f32 ~= padded
variants ~= 40 ms — latency insensitive to arithmetic intensity, so the
convs' MACs are NOT the cost.  This harness times each piece in isolation
on the ambient backend (the TPU):

  * every distinct conv shape in the U-Net (per level, per layer), alone;
  * pool / upsample / concat ops, alone;
  * one full encoder level and one full decoder level;
  * the same 3x3 conv expressed as 9 shifted matmuls (im2row-free MXU
    lowering) — if XLA's native conv lowering is the pathology, this
    wins and becomes the replacement.

Prints a table + one JSON line.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    H = W = 832
    results = {}

    # Fence: a device-side scalar reduce fetched to host — 4 bytes over
    # the tunnel.  (np.asarray of the full output would ship tens of MB
    # per iteration through the relay and swamp every measurement;
    # block_until_ready alone can return early over this backend.)
    fence_sum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))

    def _fence(y):
        leaf = jax.tree_util.tree_leaves(y)[0]
        float(fence_sum(leaf))

    def timeit(name, fn, *args, inner=8):
        y = fn(*args)
        _fence(y)
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(inner):
                y = fn(*args)
            _fence(y)
            best.append((time.perf_counter() - t0) / inner)
        ms = sorted(best)[1] * 1e3
        results[name] = round(ms, 3)
        print(f"{name:42s} {ms:8.3f} ms", flush=True)
        return ms

    key = jax.random.PRNGKey(0)

    def conv_native(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jax.nn.leaky_relu(y + b, 0.1).astype(x.dtype)

    def conv_mm(x, w, b):
        """3x3 SAME conv as 9 shifted (HW, Cin) @ (Cin, Cout) matmuls."""
        n, h, ww, c = x.shape
        co = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((n, h, ww, co), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                xs = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (n, h, ww, c))
                acc = acc + jax.lax.dot_general(
                    xs, w[dy, dx], (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        return jax.nn.leaky_relu(acc + b, 0.1).astype(x.dtype)

    # conv shapes of the reference-width U-Net (level, cin, cout, res)
    widths = [32, 43, 57, 76, 101]
    shapes = []
    cin = 10
    res = H
    for i, c in enumerate(widths):
        shapes += [(f"enc{i+1}.conv1", res, cin, c),
                   (f"enc{i+1}.conv2", res, 2 * c, c),
                   (f"enc{i+1}.conv3", res, c, c)]
        cin = c
        res //= 2
    shapes += [("bottleneck.conv2", res, 2 * 101, 101)]
    dec_in = widths[::-1]
    dec_out = widths[:4][::-1] + [3]
    for j, i in enumerate(range(5, 0, -1)):
        r = H // (2 ** (4 - j))
        shapes += [(f"dec{i}.conv1", r, 2 * dec_in[j], dec_out[j]),
                   (f"dec{i}.conv2", r, dec_out[j], dec_out[j])]

    dtype = jnp.bfloat16
    total_native = 0.0
    for name, r, ci, co in shapes:
        x = jax.random.normal(key, (1, r, r, ci), dtype)
        w = jax.random.normal(key, (3, 3, ci, co), dtype)
        b = jnp.zeros((co,), jnp.float32)
        f = jax.jit(conv_native)
        total_native += timeit(f"native {name} {r}x{r} {ci}->{co}", f, x, w, b)
    results["SUM_native_convs"] = round(total_native, 3)
    print(f"{'SUM native convs':42s} {total_native:8.3f} ms", flush=True)

    # matmul lowering for the three heaviest full-res convs
    for name, r, ci, co in [s for s in shapes if s[1] == H][:4]:
        x = jax.random.normal(key, (1, r, r, ci), dtype)
        w = jax.random.normal(key, (3, 3, ci, co), dtype)
        b = jnp.zeros((co,), jnp.float32)
        f = jax.jit(conv_mm)
        timeit(f"matmul {name} {r}x{r} {ci}->{co}", f, x, w, b)

    # structural ops
    from ai_path_tracer_denoiser_tpu.models.layers import (max_pool_2x2,
                                                           upsample_nearest_2x)
    x32 = jax.random.normal(key, (1, H, W, 32), dtype)
    timeit("maxpool 832^2 x32", jax.jit(max_pool_2x2), x32)
    x64h = jax.random.normal(key, (1, H // 2, W // 2, 64), dtype)
    timeit("upsample 416->832 x64", jax.jit(upsample_nearest_2x), x64h)
    timeit("concat 832^2 32+32",
           jax.jit(lambda a, b: jnp.concatenate([a, b], -1)), x32, x32)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
