"""Price the device-side data-movement primitives for pair binning (r5).

The per-ray binning redesign needs, per bounce: build ~0.8M (cluster,
ray) pairs, group them by cluster, intersect grouped tiles, and merge
results back per ray.  Every step is a sort / permute / segment-reduce.
This measures each primitive at the exact sizes involved, with the
device fence (bench.py methodology — block_until_ready lies over the
tunnel).

Run: python tools/exp_sort_prims.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_fence_sum = jax.jit(
    lambda v: jnp.sum(jax.tree_util.tree_leaves(v)[0].astype(jnp.float32)))


def timed(fn, *args, reps=5):
    float(_fence_sum(fn(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(_fence_sum(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    n = 640_000
    p = 800_000
    keys_n = jnp.asarray(rng.integers(0, 4096, size=n).astype(np.int32))
    keys_p = jnp.asarray(rng.integers(0, 2560, size=p).astype(np.int32))
    plane = jnp.asarray(rng.normal(size=n).astype(np.float32))
    planes7 = [jnp.asarray(rng.normal(size=n).astype(np.float32))
               for _ in range(7)]
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    seg_sorted = jnp.sort(jnp.asarray(
        rng.integers(0, n, size=p).astype(np.int32)))
    vals_p = jnp.asarray(rng.normal(size=p).astype(np.float32))

    print(f"[argsort 640k] {timed(jax.jit(jnp.argsort), keys_n)*1e3:.2f} ms")

    @jax.jit
    def sort_multi(k, ps):
        pm = jnp.argsort(k, stable=True)
        return [x[pm] for x in ps] + [jnp.argsort(pm)]

    print(f"[argsort + 7 permutes + inverse argsort 640k] "
          f"{timed(sort_multi, keys_n, planes7)*1e3:.2f} ms  "
          f"(the per-bounce cost ALREADY paid by octant/cell sorting)")

    @jax.jit
    def perm1(x, pm):
        return x[pm]

    print(f"[single 640k f32 permute-gather] "
          f"{timed(perm1, plane, perm)*1e3:.2f} ms")

    @jax.jit
    def sortp(k):
        return jax.lax.sort((k, jnp.arange(p, dtype=jnp.int32)), num_keys=1)

    print(f"[pair sort 800k kv] {timed(sortp, keys_p)*1e3:.2f} ms")

    @jax.jit
    def seg_min(ids, v):
        return jax.ops.segment_min(v, ids, num_segments=n,
                                   indices_are_sorted=True)

    print(f"[segment_min 800k -> 640k sorted ids] "
          f"{timed(seg_min, seg_sorted, vals_p)*1e3:.2f} ms")

    @jax.jit
    def scatter_min(ids, v):
        out = jnp.full((n,), np.float32(np.inf))
        return out.at[ids].min(v, indices_are_sorted=True)

    print(f"[at[].min scatter 800k -> 640k] "
          f"{timed(scatter_min, seg_sorted, vals_p)*1e3:.2f} ms")

    # cummin-based segment boundary trick: sorted segments allow a
    # reverse cummin + boundary pick without any scatter
    @jax.jit
    def seg_min_scan(ids, v):
        rev_v = v[::-1]
        cm = jax.lax.associative_scan(jnp.minimum, rev_v)[::-1]
        is_start = jnp.concatenate(
            [jnp.array([True]), ids[1:] != ids[:-1]])
        return jnp.where(is_start, cm, np.float32(np.inf)), is_start

    print(f"[assoc-scan cummin 800k] "
          f"{timed(seg_min_scan, seg_sorted, vals_p)*1e3:.2f} ms")

    cnt = jnp.asarray(rng.integers(0, 16, size=n).astype(np.int32))

    @jax.jit
    def cumsum_n(c):
        return jnp.cumsum(c)

    print(f"[cumsum 640k i32] {timed(cumsum_n, cnt)*1e3:.2f} ms")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    main()
