"""Denoiser latency profiling harness (VERDICT r1 weak #1: ~2% MFU).

Times the denoiser variants back-to-back on the ambient backend (the real
TPU chip by default) and prints a table + one JSON line:

  train-graph   apply_frame(train=False, bf16=True)   — what bench r1 timed
  folded        apply_frame_fast (BN-folded, bf16 end-to-end)
  folded-f32    apply_frame_fast with f32 activations (isolate bf16 gain)
  tpu-widths    folded with ModelOptions.tpu_friendly() channel plan

Optionally dumps a jax.profiler trace for xprof inspection:
  python tools/profile_denoiser.py --trace /tmp/tb
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_fence_fn = None


def _fence(x):
    """Device-side scalar reduce + 4-byte fetch.  (np.asarray of the full
    output ships MBs through the tunnel per window and used to inflate
    every number here ~2.5x — r3's "40 ms denoiser" was really ~15.)"""
    global _fence_fn
    import jax
    import jax.numpy as jnp
    if _fence_fn is None:
        _fence_fn = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))
    float(_fence_fn(x))


def time_fn(fn, *args, reps=3, inner=8):
    y = fn(*args)
    _fence(y[0] if isinstance(y, tuple) else y)
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            y = fn(*args)
        _fence(y[0] if isinstance(y, tuple) else y)
        best.append((time.perf_counter() - t0) / inner)
    return sorted(best)[len(best) // 2], min(best), max(best)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=832)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--trace", default=None,
                    help="dump a jax.profiler trace of the folded variant")
    ap.add_argument("--skip-train-graph", action="store_true")
    ap.add_argument("--pad", type=int, nargs="*", default=[],
                    help="also time channel-padded variants (multiples)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from ai_path_tracer_denoiser_tpu.config import ModelOptions
    from ai_path_tracer_denoiser_tpu.models import (
        apply_frame, apply_frame_fast, init_autoencoder, init_hidden,
        prepare_inference)

    h = w = args.res
    x = jnp.zeros((1, h, w, 10), jnp.float32)
    results = {}

    def flops(widths):
        """Conv MACs/frame * 2 (10->w1->..->3 U-Net at res h*w)."""
        cs = [10] + list(widths)
        total = 0
        px = h * w
        for i in range(5):
            c_in, c = cs[i], cs[i + 1]
            total += 9 * px * (c_in * c + 2 * c * c + c * c)
            px //= 4
        total += 9 * px * (cs[5] * cs[5] * 3 + cs[5] * cs[5])
        px = h * w
        dec_out = list(widths[:4][::-1]) + [3]
        dec_in = list(widths[::-1])
        for i in range(5):
            pxd = (h // 2 ** (4 - i)) * (w // 2 ** (4 - i))
            total += 9 * pxd * (2 * dec_in[i] * dec_out[i]
                                + dec_out[i] * dec_out[i])
        return 2 * total

    for name, opts in (("ref-widths", ModelOptions()),
                       ("tpu-widths", ModelOptions.tpu_friendly())):
        params, bn_state = init_autoencoder(jax.random.PRNGKey(0), opts)
        folded = prepare_inference(params, bn_state, opts)
        hidden_bf = init_hidden(1, h, w, opts, dtype=jnp.bfloat16)
        hidden_f32 = init_hidden(1, h, w, opts)

        if not args.skip_train_graph:
            fn = jax.jit(lambda p, s, xx, hd, o=opts: apply_frame(
                p, s, xx, hd, train=False, bf16=True, options=o)[0])
            med, lo, hi = time_fn(fn, params, bn_state, x, hidden_f32)
            results[f"{name}/train-graph"] = med

        fn = jax.jit(lambda f, xx, hd, o=opts: apply_frame_fast(f, xx, hd, o))
        med, lo, hi = time_fn(fn, folded, x, hidden_bf)
        results[f"{name}/folded-bf16"] = med
        if args.trace and name == "ref-widths":
            with jax.profiler.trace(args.trace):
                for _ in range(4):
                    y = fn(folded, x, hidden_bf)
                _fence(y[0])
            print(f"trace -> {args.trace}", file=sys.stderr)

        fn32 = jax.jit(lambda f, xx, hd, o=opts: apply_frame_fast(
            f, xx, hd, o, compute_dtype=jnp.float32))
        folded32 = prepare_inference(params, bn_state, opts,
                                     compute_dtype=jnp.float32)
        med, lo, hi = time_fn(fn32, folded32, x, hidden_f32)
        results[f"{name}/folded-f32"] = med

        import dataclasses as _dc
        for mult in args.pad:
            fp = prepare_inference(params, bn_state, opts, pad_multiple=mult)
            wp = tuple(fp[f"enc{i}"]["conv1"]["w"].shape[-1]
                       for i in range(1, 6))
            opts_p = _dc.replace(opts, widths=wp)
            hid_p = init_hidden(1, h, w, opts_p, dtype=jnp.bfloat16)
            fnp = jax.jit(lambda f, xx, hd, o=opts_p: apply_frame_fast(
                f, xx, hd, o))
            med, lo, hi = time_fn(fnp, fp, x, hid_p)
            results[f"{name}/folded-pad{mult}"] = med

        gf = flops(opts.widths) / 1e9
        for k in list(results):
            if k.startswith(name):
                ms = results[k] * 1e3
                print(f"{k:28s} {ms:8.2f} ms   {gf / results[k] / 1e3:6.1f} "
                      f"TFLOP/s ({gf:.0f} GFLOP)", file=sys.stderr)

    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
