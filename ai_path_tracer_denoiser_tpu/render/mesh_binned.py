"""Binned (pair-packed) mesh intersection — the r5 traversal redesign.

Why.  The per-tile BVH kernels (mesh_kernel*.py) visit a cluster whenever
ANY of a tile's 1024 rays subscribes to it.  Measured on the statue
(tools/exp_visit_stats.py): rays subscribe to ~8 clusters each but a
sorted tile's union is ~300 — so ~97% of every Moller-Trumbore block is
dead lanes, and the frame does ~1M tile-visits at ~2.5 us.  The per-RAY
pair count is 171x smaller than the tile-granularity work.  All
scheduling knobs around that union were measured flat (docs/MESH_TUNING
.md) — the only remaining lever is packing lanes by *pair*, not by tile.

What.  A three-phase, bitwise-exact pipeline (one XLA+Pallas program):

  1. **Subscribe** (XLA): every ray slab-tests every BIN (= one "super" of
     FANOUT x CLUSTER Morton-ordered faces, 256 at defaults) against its
     analytic-geom cull t.  Liveness packs into per-ray uint32 bitmask
     words; a count comes from popcount.  Cost ~N*K*20 flops — dense VPU
     math XLA is good at, no data-dependent control flow.
  2. **Pack** (XLA): rays with any live bin are compacted to a static
     prefix (one multi-operand lax.sort — measured ~2.3 ms at 640k for
     any payload width).  Each packed ray emits its live bin ids in
     ascending order (lowest-set-bit peeling on the mask words) into
     fixed slots: C_A (8) slots for every ray plus C_B (24) more for the
     overflow rays (again compacted by one sort).  Slots flatten into one
     (bin, ox, oy, oz, dx, dy, dz, slotpos) pair table, sorted by bin —
     the cluster-major inversion the VERDICT asked for.
  3. **Intersect** (Pallas): each 1024-lane grid tile covers 1024
     consecutive pairs — a run of at most a few distinct bins.  Per-tile
     (k_lo, k_hi) ride a scalar-prefetch table; the kernel walks that
     range, DMAs each bin's (BIN, 128) face slab once, and runs one
     full-width MT block in which ~100% of lanes want the bin (vs ~3%
     in the tile-granular kernels).  Only (t, face_id) come back; pairs
     unsort by slotpos (one more lax.sort), slots min-reduce per ray with
     the scan's tie-break, and the winner's point/normal/material are
     recomputed exactly from its gathered face row.

Exactness.  Every MT evaluation is `_triangle_t` on the same f32 inputs
as the dense scan; a face that can win (t < t_cull) always subscribes its
bin (widened conservative bounds, ops/bvh.py), and the merge is the
scan's first-minimal-face rule (bins ascend per ray; rows ascend per
bin), so results are bitwise-equal to mesh_intersect_v — the same
acceptance bar the per-tile kernels carry (tests/test_bvh_hw.py).

Overflow rays (> C_A + C_B live bins) and ray batches whose live count
exceeds the packing prefix fall back to the v2p kernel for the whole
call via lax.cond — never wrong, merely slower; both caps are knobs.

Reference anchor: replaces the brute per-ray triangle loop,
/root/reference/Inference/src/pathtrace.cu:258-281.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.bvh import CLUSTER, FANOUT, MeshBVH, _DEAD_ROW
from ..ops.intersect import _triangle_t
from ..ops.vec3 import Vec3

LANES = 1024
BIN = FANOUT * CLUSTER          # faces per bin = one "super" (256 default)
C_A = int(os.environ.get("APTD_BINNED_CA", "12"))   # slots for every ray
C_B = int(os.environ.get("APTD_BINNED_CB", "20"))   # extra overflow slots
_INF = np.float32(np.inf)
_DEADKEY = 1 << 20              # sorts past every real bin id


# ---------------------------------------------------------------------------
# Phase 1 (oracle): XLA subscription bitmasks
# ---------------------------------------------------------------------------
#
# Independent formulation kept as the Pallas kernel's test oracle
# (tests/test_binned.py::test_phase1_kernel_matches_xla_oracle).  Not the
# production path: XLA materializes a plane per intermediate x bin
# (measured 41 + 26 ms/bounce on the statue vs the kernel's ~8 ms).

def _subscribe_bits(o: Vec3, d: Vec3, t_cull: jnp.ndarray,
                    bounds: jnp.ndarray, n_words: int):
    """Per-ray live-bin bitmask words + counts.

    ``bounds``: (n_words*32, 8) padded bin AABB rows (padding rows carry
    the dead-box encoding and can never test live).  Returns
    (words (n_words, N) uint32, counts (N,) int32).  The liveness formula
    is exactly the kernels' `_slab_live` (conservative, NaN-safe) so a
    face with t < t_cull always subscribes.
    """
    inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
    chunks = bounds.reshape(n_words, 32, 8)

    def word_of(rows):
        w = jnp.zeros(o.x.shape, jnp.uint32)
        for b in range(32):
            tmin = jnp.full_like(t_cull, -_INF)
            tmax = jnp.full_like(t_cull, _INF)
            for axis, (oc, ic) in enumerate(
                    ((o.x, inv.x), (o.y, inv.y), (o.z, inv.z))):
                t1 = (rows[b, axis] - oc) * ic
                t2 = (rows[b, axis + 3] - oc) * ic
                lo = jnp.minimum(t1, t2)
                hi = jnp.maximum(t1, t2)
                lo = jnp.where(jnp.isnan(lo), -_INF, lo)
                hi = jnp.where(jnp.isnan(hi), _INF, hi)
                tmin = jnp.maximum(tmin, lo)
                tmax = jnp.minimum(tmax, hi)
            live = ((tmax >= tmin) & (tmax >= 0.0)
                    & (jnp.maximum(tmin, 0.0) < t_cull))
            w = w | (live.astype(jnp.uint32) << np.uint32(b))
        return w

    if n_words == 1:
        words = word_of(chunks[0])[None]
    else:
        words = jax.lax.map(word_of, chunks)          # (n_words, N)
    counts = jnp.sum(jax.lax.population_count(words), axis=0).astype(jnp.int32)
    return words, counts


def _peel_slots(words: jnp.ndarray, n_slots: int):
    """Pop the ``n_slots`` lowest set bits per ray -> ascending bin ids.

    Returns (slots (n_slots, N) int32 — _DEADKEY when exhausted — and the
    peeled words).  Bit index = popcount(low - 1) with low the isolated
    lowest bit; ascending order gives the dense scan's earliest-bin
    tie-break for free.
    """
    n_words = words.shape[0]
    slots = []
    for _ in range(n_slots):
        found = jnp.zeros(words.shape[1], bool)
        bin_id = jnp.full(words.shape[1], _DEADKEY, jnp.int32)
        new_words = []
        for wi in range(n_words):
            w = words[wi]
            has = w != 0
            take = has & ~found
            low = w & (~w + np.uint32(1))
            idx = jax.lax.population_count(low - np.uint32(1)).astype(jnp.int32)
            bin_id = jnp.where(take, np.int32(wi * 32) + idx, bin_id)
            new_words.append(jnp.where(take, w & (w - np.uint32(1)), w))
            found = found | has
        words = jnp.stack(new_words)
        slots.append(bin_id)
    return jnp.stack(slots), words


# ---------------------------------------------------------------------------
# Phase 1 (fast path): Pallas subscription kernel
# ---------------------------------------------------------------------------
#
# The XLA formulation above (_subscribe_bits/_peel_slots) materializes a
# (N,)-plane to HBM for every one of ~15 intermediates x Kb bins — measured
# 41 ms + 26 ms per bounce on the statue.  The bounds table is tiny (32 B/
# bin), so a Pallas kernel holds it VMEM-resident and runs the whole
# subscribe-and-emit per ray tile in registers: ~2 ms for the same work.

def _build_phase1_kernel(kb: int, skip: int, c_out: int):
    def kernel(rays_ref, bounds_ref, out_ref):
        # components live as (8, LANES) blocks — full-sublane vregs (a
        # (1, N) row layout leaves 7/8 of every vreg masked and measured
        # 8x slower)
        blk = lambda c: rays_ref[0, 8 * c:8 * c + 8, :]
        o = Vec3(blk(0), blk(1), blk(2))
        d = Vec3(blk(3), blk(4), blk(5))
        t_cull = blk(6)
        inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)

        dead = jnp.full_like(t_cull, np.float32(_DEADKEY))

        def visit(k, carry):
            cnt, slots = carry
            row = bounds_ref[pl.ds(k, 1), :]
            tmin = jnp.full_like(t_cull, -_INF)
            tmax = jnp.full_like(t_cull, _INF)
            for axis, (oc, ic) in enumerate(((o.x, inv.x), (o.y, inv.y),
                                             (o.z, inv.z))):
                t1 = (row[0, axis] - oc) * ic
                t2 = (row[0, axis + 3] - oc) * ic
                lo = jnp.minimum(t1, t2)
                hi = jnp.maximum(t1, t2)
                lo = jnp.where(jnp.isnan(lo), -_INF, lo)
                hi = jnp.where(jnp.isnan(hi), _INF, hi)
                tmin = jnp.maximum(tmin, lo)
                tmax = jnp.minimum(tmax, hi)
            live = ((tmax >= tmin) & (tmax >= 0.0)
                    & (jnp.maximum(tmin, 0.0) < t_cull))   # (8, LANES)
            # append bin k into slot (cnt - skip) for live lanes; slots
            # ride the fori carry (registers), not out_ref — a per-bin
            # VMEM read-modify-write chain halved throughput
            kf = k.astype(jnp.float32)
            slots = tuple(
                jnp.where(live & (cnt == np.float32(skip + j)), kf, sl)
                for j, sl in enumerate(slots))
            return cnt + jnp.where(live, 1.0, 0.0), slots

        cnt, slots = jax.lax.fori_loop(
            0, kb, visit,
            (jnp.zeros_like(t_cull), (dead,) * c_out))
        for j in range(c_out):
            out_ref[0, 8 * j:8 * j + 8, :] = slots[j]
        out_ref[0, 8 * c_out:8 * c_out + 8, :] = cnt

    return kernel


@functools.partial(jax.jit, static_argnames=("kb", "skip", "c_out",
                                             "interpret"))
def _phase1_call(rays, bounds, kb: int, skip: int, c_out: int,
                 interpret: bool):
    """rays (nT, 64, LANES) — component c as rows [8c, 8c+8), i.e. 8192
    rays/tile — -> (nT, (c_out+1)*8, LANES) f32: c_out ascending bin-id
    blocks (_DEADKEY when exhausted) then the count block."""
    n_tiles = rays.shape[0]
    rows_out = (c_out + 1) * 8
    kernel = _build_phase1_kernel(kb, skip, c_out)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 64, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bounds: 32 B/bin
        ],
        out_specs=pl.BlockSpec((1, rows_out, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, rows_out, LANES),
                                       jnp.float32),
        interpret=interpret,
    )(rays, bounds)


_TILE_RAYS = 8 * LANES


def _phase1(o: Vec3, d: Vec3, t_cull, bounds, kb: int, skip: int,
            c_out: int, interpret: bool):
    """Tile + run the subscription kernel; returns (slots (c_out, N) i32,
    counts (N,) i32) in input-ray order."""
    n = o.x.shape[0]
    n_tiles = -(-n // _TILE_RAYS)
    pad = n_tiles * _TILE_RAYS - n

    def padded(x, fill):
        x = x.astype(jnp.float32)
        x = jnp.pad(x, (0, pad), constant_values=fill) if pad else x
        return x.reshape(n_tiles, 8, LANES)

    rays = jnp.concatenate([
        padded(o.x, 0.0), padded(o.y, 0.0), padded(o.z, 0.0),
        padded(d.x, 1.0), padded(d.y, 1.0), padded(d.z, 1.0),
        padded(t_cull, -_INF),
        jnp.zeros((n_tiles, 8, LANES), jnp.float32),
    ], axis=1)
    out = _phase1_call(rays, bounds, kb, skip, c_out, interpret)

    def unblk(j):
        return out[:, 8 * j:8 * j + 8, :].reshape(-1)[:n]

    slots = jnp.stack([unblk(j).astype(jnp.int32) for j in range(c_out)])
    counts = unblk(c_out).astype(jnp.int32)
    return slots, counts


# ---------------------------------------------------------------------------
# Phase 3: the pair kernel
# ---------------------------------------------------------------------------

def _pair_kernel(meta_ref, pairs_ref, faces_ref, out_ref, state,
                 slab0, slab1, sem0, sem1):
    """One grid tile = 1024 bin-sorted pairs; walk bins [k_lo, k_hi].

    Slab DMAs are double-buffered: bin k+1's fetch is issued before bin
    k's MT block runs, hiding the ~1.5 us HBM latency that a serial
    start->wait pays per visit.  The fetch is unconditional per bin in
    range (gap bins waste one slab — rare since pairs are bin-dense); the
    MT block masks lanes on key match.  Identical `_triangle_t` math to
    the dense scan; only (t, face_id) leave the kernel.
    """
    r = jax.lax.rem(pl.program_id(0), 8)    # row within the (8, 2) block
    k_lo = meta_ref[r, 0]
    k_hi = meta_ref[r, 1]

    o = Vec3(pairs_ref[0, 0:1, :], pairs_ref[0, 1:2, :], pairs_ref[0, 2:3, :])
    d = Vec3(pairs_ref[0, 3:4, :], pairs_ref[0, 4:5, :], pairs_ref[0, 5:6, :])
    key = pairs_ref[0, 6:7, :]

    state[0:1, :] = jnp.full_like(key, _INF)     # best t
    state[1:2, :] = jnp.zeros_like(key) - 1.0    # best face id

    def dma(k, slab, sem):
        return pltpu.make_async_copy(
            faces_ref.at[pl.ds(k * BIN, BIN), :], slab, sem)

    def mt(k, slab):
        vb = slab[:]
        v0 = Vec3(vb[:, 0:1], vb[:, 1:2], vb[:, 2:3])
        v1 = Vec3(vb[:, 3:4], vb[:, 4:5], vb[:, 5:6])
        v2_ = Vec3(vb[:, 6:7], vb[:, 7:8], vb[:, 8:9])
        t, _u, _w, hit = _triangle_t(v0, v1, v2_, o, d)      # (BIN, 1024)
        match = key == k.astype(jnp.float32)
        t = jnp.where(hit & (t > 0.0) & match, t, _INF)
        tmin = jnp.min(t, axis=0, keepdims=True)
        rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        cand = jnp.where(t == tmin, rows, jnp.int32(BIN))
        first = jnp.min(cand, axis=0, keepdims=True)         # (1, 1024)
        better = tmin < state[0:1, :]     # strict: earlier bin keeps ties
        fid = (k * BIN + first).astype(jnp.float32)
        state[0:1, :] = jnp.where(better, tmin, state[0:1, :])
        state[1:2, :] = jnp.where(better, fid, state[1:2, :])

    @pl.when(k_hi >= k_lo)
    def _():
        dma(k_lo, slab0, sem0).start()

    def visit(k, _):
        par = jax.lax.rem(k - k_lo, 2)

        @pl.when(par == 0)
        def _():
            dma(k, slab0, sem0).wait()

            @pl.when(k < k_hi)
            def _():
                dma(k + 1, slab1, sem1).start()
            mt(k, slab0)

        @pl.when(par != 0)
        def _():
            dma(k, slab1, sem1).wait()

            @pl.when(k < k_hi)
            def _():
                dma(k + 1, slab0, sem0).start()
            mt(k, slab1)

        return 0

    jax.lax.fori_loop(k_lo, k_hi + 1, visit, 0)

    out_ref[0, 0:1, :] = state[0:1, :]
    miss = state[0:1, :] == _INF
    out_ref[0, 1:2, :] = jnp.where(miss, -1.0, state[1:2, :])
    for r2 in range(2, 8):
        out_ref[0, r2:r2 + 1, :] = jnp.zeros_like(key)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pair_call(meta, pairs, faces_packed, interpret: bool):
    n_tiles = pairs.shape[0]
    return pl.pallas_call(
        _pair_kernel,
        grid=(n_tiles,),
        in_specs=[
            # per-tile (k_lo, k_hi) as SMEM scalars (a whole-table scalar
            # prefetch exceeds the 1 MB SMEM budget at frame scale); the
            # 8-row blocking satisfies Mosaic's sublane-divisibility rule
            pl.BlockSpec((8, 2), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, LANES), jnp.float32),
            pltpu.VMEM((BIN, 128), jnp.float32),
            pltpu.VMEM((BIN, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(meta, pairs, faces_packed)


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------

def _sortN(key, *ops):
    out = jax.lax.sort((key,) + ops, num_keys=1)
    return out[1:]


def _binned_core(bvh: MeshBVH, po: Vec3, pd: Vec3, ptc, pidx, slots_a,
                 pcnt, bounds, n: int, lcap: int, lcapb: int,
                 c_a: int, c_b: int, interpret: bool):
    """The packed pipeline on the pre-packed live prefix; caller
    guarantees live <= lcap and overflow <= lcapb (the cond in
    mesh_intersect_binned)."""
    kb = bvh.n_supers_real

    if c_b > 0:
        # overflow rays (count > c_a): compact, subscribe again with skip
        over = pcnt > c_a
        pa = jnp.arange(lcap, dtype=jnp.int32)
        opacked = _sortN((~over).astype(jnp.int32),
                         po.x, po.y, po.z, pd.x, pd.y, pd.z, ptc, pa)
        bo = Vec3(opacked[0][:lcapb], opacked[1][:lcapb],
                  opacked[2][:lcapb])
        bd = Vec3(opacked[3][:lcapb], opacked[4][:lcapb],
                  opacked[5][:lcapb])
        btc = opacked[6][:lcapb]
        b_pa = opacked[7][:lcapb]                     # packed-prefix position
        slots_b, _ = _phase1(bo, bd, btc, bounds, kb, c_a, c_b, interpret)

    # ---- flatten both tiers into one pair table --------------------------
    def tier(slots, to, td, base):
        # slots is (c, m): flatten ray-major so slotpos = r*c + j
        c, m = slots.shape
        key = slots.T.reshape(-1)
        rep = lambda x: jnp.broadcast_to(x[:, None], (m, c)).reshape(-1)
        spos = base + jnp.arange(m * c, dtype=jnp.int32)
        return (key, rep(to.x), rep(to.y), rep(to.z),
                rep(td.x), rep(td.y), rep(td.z), spos)

    ta = tier(slots_a, po, pd, 0)
    if c_b > 0:
        tb = tier(slots_b, bo, bd, lcap * c_a)
        flat = [jnp.concatenate([a, b]) for a, b in zip(ta, tb)]
    else:
        flat = list(ta)
    s_total = flat[0].shape[0]
    n_tiles = -(-s_total // LANES)
    pad = n_tiles * LANES - s_total
    if pad:
        fill = (int(_DEADKEY),) + (0.0,) * 6 + (s_total,)
        flat = [jnp.pad(x, (0, pad), constant_values=v)
                for x, v in zip(flat, fill)]

    srt = _sortN(flat[0], flat[0], *flat[1:])
    keys_s = srt[0]

    # per-tile bin range for the kernel (empty tiles get the empty range
    # (1, 0)); k_hi must be the max REAL key — the last live tile's tail
    # is _DEADKEY padding, which must not widen its range to all of [k_lo,
    # kb)
    krows = keys_s.reshape(n_tiles, LANES)
    k_lo = krows[:, 0]
    k_hi = jnp.max(jnp.where(krows < kb, krows, -1), axis=1)
    empty = k_hi < 0
    meta = jnp.stack([jnp.where(empty, 1, k_lo),
                      jnp.where(empty, 0, k_hi)], axis=1)
    mpad = -(-n_tiles // 8) * 8 - n_tiles
    if mpad:                       # SMEM block rows come in groups of 8
        meta = jnp.concatenate(
            [meta, jnp.tile(jnp.array([[1, 0]], jnp.int32), (mpad, 1))])

    # kernel rows: [ox oy oz dx dy dz key pad]
    pairs = jnp.stack([
        srt[1], srt[2], srt[3], srt[4], srt[5], srt[6],
        keys_s.astype(jnp.float32),
        jnp.zeros_like(srt[1]),
    ]).reshape(8, n_tiles, LANES).swapaxes(0, 1)

    out = _pair_call(meta, pairs, bvh.faces_packed, interpret)
    flatout = out.swapaxes(0, 1).reshape(8, -1)
    t_pair, f_pair = flatout[0], flatout[1]

    # unsort pairs back to slotpos order, then per-ray slot min
    spos_s = srt[7]
    t_u, f_u = _sortN(spos_s, t_pair, f_pair)
    t_u, f_u = t_u[:s_total], f_u[:s_total]

    def slot_min(t2, f2):
        """(m, c) slot results -> per-ray (t, fid), earliest slot ties."""
        tb_, fb_ = t2[:, 0], f2[:, 0]
        for j in range(1, t2.shape[1]):
            better = t2[:, j] < tb_
            tb_ = jnp.where(better, t2[:, j], tb_)
            fb_ = jnp.where(better, f2[:, j], fb_)
        return tb_, fb_

    na = lcap * c_a
    t_a, f_a = slot_min(t_u[:na].reshape(lcap, c_a),
                        f_u[:na].reshape(lcap, c_a))
    if c_b > 0:
        t_b, f_b = slot_min(t_u[na:].reshape(lcapb, c_b),
                            f_u[na:].reshape(lcapb, c_b))
        # merge tier B into tier A positions (tier A bins are earlier, so
        # A keeps ties — the scan's lowest-face-index rule)
        t_m = t_a.at[b_pa].min(t_b)
        tb_wins = (t_b < _INF) & (t_b == t_m[b_pa]) & (t_b < t_a[b_pa])
        f_m = f_a.at[b_pa].set(jnp.where(tb_wins, f_b, f_a[b_pa]))
    else:
        t_m, f_m = t_a, f_a

    # winner recompute: exact per-face MT on the gathered face row
    safe = jnp.maximum(f_m, 0.0).astype(jnp.int32)
    row = jnp.take(bvh.faces_packed[:, :19], safe, axis=0)   # (lcap, 19)
    # 2-D (1, lcap) planes: the scan evaluates _triangle_t on rank-2
    # blocks, and XLA:CPU's FMA contraction is rank-sensitive — a 1-D
    # recompute drifts by 1 ulp off-TPU.  Same rank -> bitwise.
    c2 = lambda j: row[:, j][None, :]
    v0 = Vec3(c2(0), c2(1), c2(2))
    v1 = Vec3(c2(3), c2(4), c2(5))
    v2_ = Vec3(c2(6), c2(7), c2(8))
    n0 = Vec3(c2(9), c2(10), c2(11))
    n1 = Vec3(c2(12), c2(13), c2(14))
    n2 = Vec3(c2(15), c2(16), c2(17))
    po2 = Vec3(po.x[None, :], po.y[None, :], po.z[None, :])
    pd2 = Vec3(pd.x[None, :], pd.y[None, :], pd.z[None, :])
    _t, u, w_, _hit = _triangle_t(v0, v1, v2_, po2, pd2)
    v = 1.0 - u - w_
    # v2p seeds its running t with t_cull, so it never reports hits at or
    # beyond it; apply the same strict-< rule for an identical contract
    hitm = t_m < ptc
    # authoritative t = the recompute (identical code path to the scan's
    # chunked MT); the kernel's copy only steers selection
    t_m = jnp.where(hitm, _t[0], _INF)

    def sel(a):
        return jnp.where(hitm, a[0], 0.0)

    point = Vec3(sel(v0.x * u + v1.x * w_ + v2_.x * v),
                 sel(v0.y * u + v1.y * w_ + v2_.y * v),
                 sel(v0.z * u + v1.z * w_ + v2_.z * v))
    normal = Vec3(sel(n0.x * v + n1.x * u + n2.x * w_),
                  sel(n0.y * v + n1.y * u + n2.y * w_),
                  sel(n0.z * v + n1.z * u + n2.z * w_)).normalized_safe()
    mat = jnp.where(hitm, row[:, 18], -1.0)

    # restore input order: results for the packed prefix, misses elsewhere
    def full(x, fill):
        return jnp.concatenate(
            [x, jnp.full((n - lcap,), fill, x.dtype)])

    res = _sortN(pidx,
                 full(t_m, _INF),
                 full(point.x, 0.0), full(point.y, 0.0), full(point.z, 0.0),
                 full(normal.x, 0.0), full(normal.y, 0.0),
                 full(normal.z, 0.0),
                 full(mat, -1.0))
    return (res[0], Vec3(res[1], res[2], res[3]),
            Vec3(res[4], res[5], res[6]), res[7].astype(jnp.int32))


def mesh_intersect_binned(bvh: MeshBVH, o: Vec3, d: Vec3,
                          t_cull: Optional[jnp.ndarray] = None,
                          interpret: bool = False,
                          lanes: Optional[int] = None,
                          lcap: Optional[int] = None,
                          lcapb: Optional[int] = None,
                          ) -> Tuple[jnp.ndarray, Vec3, Vec3, jnp.ndarray]:
    """Closest mesh hit via pair binning; contract of mesh_intersect_bvh.

    ``lcap``/``lcapb``: static packing prefixes (live rays / overflow
    rays).  Defaults: N/4 and N/16, floors of one lane tile.  Batches
    exceeding either cap fall back to the v2p kernel via lax.cond —
    correct for any input, packed-fast for the measured regimes
    (statue live <= 139k of 640k, overflow p99 <= 20 bins; see
    tools/exp_visit_stats.py output in the r5 commit log).
    """
    del lanes  # interface parity with the other kernels
    if getattr(bvh, "cluster", CLUSTER) != CLUSTER:
        raise ValueError(
            f"bvh built with cluster={bvh.cluster} but BIN derives from "
            f"CLUSTER={CLUSTER} (APTD_BVH_CLUSTER mismatch)")
    n = o.x.shape[0]
    if t_cull is None:
        t_cull = jnp.full((n,), _INF)
    # Defaults target the many-bin regime the auto-router sends here
    # (>= 64 bins): live rays <= N/4 and overflow (>C_A bins) <= N/16 on
    # the measured statue-class workloads; low-bin scenes with higher
    # live fractions route to v2p before these caps matter.
    lcap = int(lcap if lcap is not None
               else int(os.environ.get("APTD_BINNED_LCAP", "0")) or
               max(LANES, -(-(n // 4) // LANES) * LANES))
    lcapb = int(lcapb if lcapb is not None
                else int(os.environ.get("APTD_BINNED_LCAPB", "0")) or
                max(LANES, -(-(n // 16) // LANES) * LANES))
    lcap = min(lcap, n)
    lcapb = min(lcapb, lcap)

    kb = bvh.n_supers_real
    bounds = bvh.super_bounds        # always an 8-row multiple >= kb; the
    # kernel loops k < kb so padding rows are never read

    # Slot widths clamp to the bin count: a ray cannot subscribe to more
    # bins than exist, so small meshes carry no slot slack and (when
    # c_a + c_b == kb) can never overflow to the fallback.
    c_a = min(C_A, kb)
    c_b = min(C_B, kb - c_a)

    # Pre-pack by the cheap whole-mesh dead flag (t_cull == -inf encodes
    # AABB-miss | inactive) BEFORE the subscription kernel: live rays are
    # <= 25% of the batch on the measured scenes, so phase 1 runs on the
    # lcap prefix instead of all N — 4x cheaper (its N*Kb slab sweep is
    # the single biggest pipeline term).
    n = o.x.shape[0]
    dead0 = t_cull == -_INF
    idx = jnp.arange(n, dtype=jnp.int32)
    packed = _sortN(dead0.astype(jnp.int32),
                    o.x, o.y, o.z, d.x, d.y, d.z, t_cull, idx)
    po = Vec3(packed[0][:lcap], packed[1][:lcap], packed[2][:lcap])
    pd = Vec3(packed[3][:lcap], packed[4][:lcap], packed[5][:lcap])
    ptc = packed[6][:lcap]
    pidx = packed[7]                                  # (n,) original index
    live0 = jnp.sum((~dead0).astype(jnp.int32))

    slots_a, counts = _phase1(po, pd, ptc, bounds, kb, 0, C_A, interpret)
    n_over = jnp.sum((counts > C_A).astype(jnp.int32))
    fits = ((live0 <= lcap) & (n_over <= lcapb)
            & (jnp.max(counts) <= C_A + C_B))

    def fast(args):
        o_, d_, tc = args[:3]
        del o_, d_, tc
        po_, pd_, ptc_, pidx_, slts, cnts = args[3:]
        return _binned_core(bvh, po_, pd_, ptc_, pidx_, slts, cnts, bounds,
                            n, lcap, lcapb, c_a, c_b, interpret)

    def slow(args):
        from .mesh_kernel_v2p import mesh_intersect_bvh_v2p
        o_, d_, tc = args[:3]
        return mesh_intersect_bvh_v2p(bvh, o_, d_, tc, interpret=interpret)

    return jax.lax.cond(fits, fast, slow,
                        (o, d, t_cull, po, pd, ptc, pidx, slots_a, counts))
