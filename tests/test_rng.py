"""RNG parity: minstd LCG sequence and utilhash behavior."""
import jax.numpy as jnp
import numpy as np

from ai_path_tracer_denoiser_tpu.ops import rng


def _minstd_ref(seed, n):
    """Straight 64-bit minstd for cross-checking the Schrage int32 version."""
    out = []
    x = seed % 2147483647
    if x == 0:
        x = 1
    for _ in range(n):
        x = (48271 * x) % 2147483647
        out.append(x)
    return out


def test_lcg_matches_minstd():
    # classic known value: minstd from seed 1, first output is 48271
    state = jnp.asarray(np.array([1, 2, 12345, 2147483646], np.int32))
    expect = np.array([_minstd_ref(int(s), 1)[0] for s in np.asarray(state)])
    got = np.asarray(rng.lcg_next(state))
    np.testing.assert_array_equal(got, expect)


def test_lcg_sequence_1k():
    import jax

    @jax.jit
    def run(s):
        def step(s, _):
            s = rng.lcg_next(s)
            return s, s
        return jax.lax.scan(step, s, None, length=1000)[1]

    seq = np.asarray(run(jnp.asarray(np.int32(987654321))))
    ref = np.array(_minstd_ref(987654321, 1000))
    np.testing.assert_array_equal(seq, ref)


def test_uniform_in_range():
    # hash-seeded engines (as the renderer uses them) are well distributed
    states = rng.make_seeded_engine(1, jnp.arange(4096, dtype=jnp.uint32), 8)
    u, _ = rng.lcg_uniform(states)
    u = np.asarray(u)
    assert (u >= 0).all() and (u < 1).all()
    assert 0.45 < u.mean() < 0.55


def test_utilhash_wraps_uint32():
    # utilhash must stay in uint32 and differ across nearby inputs
    a = rng.utilhash(jnp.asarray(np.arange(100, dtype=np.uint32)))
    a = np.asarray(a)
    assert a.dtype == np.uint32
    assert len(np.unique(a)) == 100


def test_seeded_engine_depth_iter_index_sensitivity():
    e1 = rng.make_seeded_engine(1, 42, 8)
    e2 = rng.make_seeded_engine(2, 42, 8)
    e3 = rng.make_seeded_engine(1, 43, 8)
    e4 = rng.make_seeded_engine(1, 42, 7)
    vals = {int(e1), int(e2), int(e3), int(e4)}
    assert len(vals) == 4
    # engine state must be a valid LCG state
    for v in vals:
        assert 1 <= v < 2147483647


def test_draw_uniforms_shapes():
    idx = jnp.arange(64, dtype=jnp.uint32)
    for mode in ("parity", "fast"):
        u = rng.draw_uniforms(3, idx, 2, 2, mode)
        assert u.shape == (2, 64)
        u = np.asarray(u)
        assert (u >= 0).all() and (u < 1).all()


def test_lcg_fold_matches_schrage():
    """Division-free minstd step == Schrage over random + edge states."""
    import numpy as np
    import jax.numpy as jnp
    from ai_path_tracer_denoiser_tpu.ops.rng import (
        lcg_next, lcg_next_schrage, mod_mersenne31)
    rng = np.random.default_rng(7)
    states = rng.integers(1, 2**31 - 1, size=200_000).astype(np.int32)
    edges = np.array([1, 2, 48271, 65535, 65536, 2**30, 2**31 - 2], np.int32)
    states = np.concatenate([states, edges])
    a = np.asarray(lcg_next(jnp.asarray(states)))
    b = np.asarray(lcg_next_schrage(jnp.asarray(states)))
    np.testing.assert_array_equal(a, b)
    h = rng.integers(0, 2**32, size=200_000, dtype=np.uint64).astype(np.uint32)
    np.testing.assert_array_equal(
        np.asarray(mod_mersenne31(jnp.asarray(h))),
        (h % (2**31 - 1)).astype(np.uint32))
