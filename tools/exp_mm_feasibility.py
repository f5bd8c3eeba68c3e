"""Hardware feasibility probes for the matmul-MT mesh redesign (r5).

Three questions, each answered with a measured number on the real chip:

  1. Does an f32 ``dot_general`` contracting dim 0 — coeffs (16, 128)
     against features (16, LANES) -> (128, LANES) — lower in a Pallas TPU
     kernel, and what does one "visit" (DMA + matmul + epilogue + state
     update) cost vs the current VPU Moller-Trumbore visit?
  2. What does an XLA argsort cost at ray-cluster-pair scale (5-10M
     int32 keys) — the price of the phase-2 binning inversion?
  3. What does a winning-face row gather cost — (F, 128)[idx] for 640k
     indices — the price of the exact-recompute pass?

Run:  python tools/exp_mm_feasibility.py
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

LANES = 1024
CLUSTER = 32
FANOUT = 8


_fence_sum = jax.jit(
    lambda v: jnp.sum(jax.tree_util.tree_leaves(v)[0].astype(jnp.float32)))


def _fence(x):
    """Device-side scalar reduce fetched to host: block_until_ready can
    return early over the tunnel (bench.py methodology)."""
    float(_fence_sum(x))


def timed(fn, *args, reps=5):
    _fence(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _fence(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


# ---------------------------------------------------------------------------
# 1. per-visit cost: VPU MT loop vs MXU coeff-matmul loop
# ---------------------------------------------------------------------------

def build_vpu_kernel(n_visits):
    from ai_path_tracer_denoiser_tpu.ops.intersect import _triangle_t
    from ai_path_tracer_denoiser_tpu.ops.vec3 import Vec3

    def kernel(rays_ref, faces_ref, out_ref, state, fscratch, fsem):
        o = Vec3(rays_ref[0:1, :], rays_ref[1:2, :], rays_ref[2:3, :])
        d = Vec3(rays_ref[3:4, :], rays_ref[4:5, :], rays_ref[5:6, :])
        state[0:1, :] = jnp.full_like(rays_ref[0:1, :], 3e38)
        for r in range(1, 8):
            state[r:r + 1, :] = jnp.zeros_like(rays_ref[0:1, :])

        def body(k, _):
            dma = pltpu.make_async_copy(
                faces_ref.at[pl.ds((k % 64) * CLUSTER, CLUSTER), :],
                fscratch, fsem)
            dma.start()
            dma.wait()
            vb = fscratch[:]
            v0 = Vec3(vb[:, 0:1], vb[:, 1:2], vb[:, 2:3])
            v1 = Vec3(vb[:, 3:4], vb[:, 4:5], vb[:, 5:6])
            v2 = Vec3(vb[:, 6:7], vb[:, 7:8], vb[:, 8:9])
            t, u, w_, hit = _triangle_t(v0, v1, v2, o, d)
            t = jnp.where(hit & (t > 0.0), t, 3e38)
            tmin = jnp.min(t, axis=0, keepdims=True)
            ismin = t == tmin
            rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
            cand = jnp.where(ismin, rows, jnp.int32(CLUSTER))
            first = rows == jnp.min(cand, axis=0, keepdims=True)
            better = tmin < state[0:1, :]
            n0 = Vec3(vb[:, 9:10], vb[:, 10:11], vb[:, 11:12])
            n1 = Vec3(vb[:, 12:13], vb[:, 13:14], vb[:, 14:15])
            n2 = Vec3(vb[:, 15:16], vb[:, 16:17], vb[:, 17:18])
            v = 1.0 - u - w_
            p_full = v0 * u + v1 * w_ + v2 * v
            n_full = n0 * v + n1 * u + n2 * w_

            def sel(a):
                return jnp.sum(jnp.where(first, a, 0.0), axis=0,
                               keepdims=True)

            news = (tmin, sel(p_full.x), sel(p_full.y), sel(p_full.z),
                    sel(n_full.x), sel(n_full.y), sel(n_full.z),
                    sel(vb[:, 18:19] * jnp.ones_like(t)))
            for r, val in enumerate(news):
                state[r:r + 1, :] = jnp.where(better, val, state[r:r + 1, :])
            return 0

        jax.lax.fori_loop(0, n_visits, body, 0)
        out_ref[:] = state[:]

    return kernel


def build_mxu_kernel(n_visits, precision):
    def kernel(rays_ref, coeffs_ref, out_ref, state, feats, mm, cscratch,
               fsem):
        # features rows: [dx dy dz mx my mz ox oy oz 1 0...] (16, LANES)
        o = (rays_ref[0:1, :], rays_ref[1:2, :], rays_ref[2:3, :])
        d = (rays_ref[3:4, :], rays_ref[4:5, :], rays_ref[5:6, :])
        m = (o[1] * d[2] - o[2] * d[1],
             o[2] * d[0] - o[0] * d[2],
             o[0] * d[1] - o[1] * d[0])
        for i in range(3):
            feats[i:i + 1, :] = d[i]
            feats[3 + i:4 + i, :] = m[i]
            feats[6 + i:7 + i, :] = o[i]
        feats[9:10, :] = jnp.ones_like(o[0])
        for i in range(10, 16):
            feats[i:i + 1, :] = jnp.zeros_like(o[0])

        state[0:1, :] = jnp.full_like(rays_ref[0:1, :], 3e38)
        state[1:2, :] = jnp.zeros_like(rays_ref[0:1, :]) - 1.0

        def body(k, _):
            dma = pltpu.make_async_copy(
                coeffs_ref.at[pl.ds((k % 64), 1)], cscratch, fsem)
            dma.start()
            dma.wait()
            # (16,128) coeffs ^T-contract (16,LANES) feats -> (128, LANES)
            mm[:] = jax.lax.dot_general(
                cscratch[0], feats[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)
            den = mm[0:32, :]
            un = mm[32:64, :]
            wn = mm[64:96, :]
            tn = mm[96:128, :]
            eps = np.float32(1.1920929e-07)
            hit = ((den >= eps) & (un >= 0.0) & (un <= den) & (wn >= 0.0)
                   & (un + wn <= den) & (tn >= 0.0))
            t = jnp.where(hit, tn / den, 3e38)
            tmin = jnp.min(t, axis=0, keepdims=True)
            ismin = t == tmin
            rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
            cand = jnp.where(ismin, rows, jnp.int32(CLUSTER))
            fidx = jnp.min(cand, axis=0, keepdims=True) + (k % 64) * CLUSTER
            better = tmin < state[0:1, :]
            state[0:1, :] = jnp.where(better, tmin, state[0:1, :])
            state[1:2, :] = jnp.where(better, fidx.astype(jnp.float32),
                                      state[1:2, :])
            return 0

        jax.lax.fori_loop(0, n_visits, body, 0)
        out_ref[0:1, :] = state[0:1, :]
        out_ref[1:2, :] = state[1:2, :]
        for r in range(2, 8):
            out_ref[r:r + 1, :] = jnp.zeros_like(state[0:1, :])

    return kernel


def run_visit_bench():
    rng = np.random.default_rng(0)
    n_visits = 32768
    faces = jnp.asarray(rng.normal(size=(64 * CLUSTER, 128)).astype(np.float32))
    coeffs = jnp.asarray(rng.normal(size=(64, 16, 128)).astype(np.float32))
    rays = jnp.asarray(rng.normal(size=(8, LANES)).astype(np.float32))

    @jax.jit
    def vpu(rays, faces):
        return pl.pallas_call(
            build_vpu_kernel(n_visits),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, LANES), jnp.float32),
                            pltpu.VMEM((CLUSTER, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
        )(rays, faces)

    def mxu_fn(precision):
        @jax.jit
        def mxu(rays, coeffs):
            return pl.pallas_call(
                build_mxu_kernel(n_visits, precision),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
                scratch_shapes=[pltpu.VMEM((8, LANES), jnp.float32),
                                pltpu.VMEM((16, LANES), jnp.float32),
                                pltpu.VMEM((128, LANES), jnp.float32),
                                pltpu.VMEM((1, 16, 128), jnp.float32),
                                pltpu.SemaphoreType.DMA(())],
            )(rays, coeffs)
        return mxu

    t_vpu = timed(vpu, rays, faces)
    print(f"[visit] VPU MT loop: {t_vpu*1e3:.3f} ms total, "
          f"{t_vpu/n_visits*1e6:.3f} us/visit")
    for prec in ("DEFAULT", "HIGHEST"):
        p = getattr(jax.lax.Precision, prec)
        try:
            fn = mxu_fn(p)
            t_mxu = timed(fn, rays, coeffs)
            print(f"[visit] MXU coeff loop ({prec}): {t_mxu*1e3:.3f} ms "
                  f"total, {t_mxu/n_visits*1e6:.3f} us/visit "
                  f"({t_vpu/t_mxu:.2f}x vs VPU)")
        except Exception as e:  # noqa
            print(f"[visit] MXU ({prec}) FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")


# ---------------------------------------------------------------------------
# 2. argsort at pair scale
# ---------------------------------------------------------------------------

def run_sort_bench():
    rng = np.random.default_rng(1)
    for n in (2_000_000, 5_000_000, 10_000_000):
        keys = jnp.asarray(rng.integers(0, 4096, size=n).astype(np.int32))

        @jax.jit
        def srt(k):
            return jnp.argsort(k)

        t = timed(srt, keys)
        print(f"[sort] argsort {n/1e6:.0f}M int32: {t*1e3:.2f} ms")

        @jax.jit
        def srt_val(k):
            return jax.lax.sort((k, jnp.arange(k.shape[0], dtype=jnp.int32)),
                                num_keys=1)

        t = timed(srt_val, keys)
        print(f"[sort] lax.sort kv {n/1e6:.0f}M: {t*1e3:.2f} ms")


# ---------------------------------------------------------------------------
# 3. row gather
# ---------------------------------------------------------------------------

def run_gather_bench():
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(size=(81920, 128)).astype(np.float32))
    table19 = jnp.asarray(rng.normal(size=(81920, 19)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 81920, size=640_000).astype(np.int32))

    @jax.jit
    def g128(t, i):
        return jnp.take(t, i, axis=0)

    @jax.jit
    def g19(t, i):
        return jnp.take(t, i, axis=0)

    t = timed(g128, table, idx)
    print(f"[gather] (82k,128)[640k]: {t*1e3:.2f} ms")
    t = timed(g19, table19, idx)
    print(f"[gather] (82k,19)[640k]: {t*1e3:.2f} ms")
    # 18 separate plane gathers (the documented slow path) for reference
    planes = [jnp.asarray(rng.normal(size=(81920,)).astype(np.float32))
              for _ in range(4)]

    @jax.jit
    def gplanes(ps, i):
        return [p[i] for p in ps]

    t = timed(gplanes, planes, idx)
    print(f"[gather] 4x (82k,)[640k] plane gathers: {t*1e3:.2f} ms")


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    run_visit_bench()
    run_sort_bench()
    run_gather_bench()
