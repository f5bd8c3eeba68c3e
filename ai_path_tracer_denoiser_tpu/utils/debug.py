"""Numerics checking + profiling helpers.

The reference's runtime verification is ERRORCHECK-gated
cudaDeviceSynchronize/cudaGetLastError after every kernel launch
(pathtrace.cu:27, 32-50) plus cudaEvent timers (common.h).  TPU equivalents:
a per-iteration finite-ness sweep over every render-state plane (detects the
iteration at which a NaN/Inf first appeared, like the post-launch error
check), and ``jax.profiler`` traces for per-kernel timing.

(`jax.experimental.checkify` with float_checks would give per-op source
locations, but instrumenting the bounce while_loop makes XLA compilation
take tens of minutes even at 32x32 — unusable in practice.)
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


def _finite_fraction(state):
    leaves = [x for x in jax.tree_util.tree_leaves(state)
              if jnp.issubdtype(x.dtype, jnp.floating)]
    return jnp.stack([jnp.isfinite(x).all() for x in leaves]).all()


def assert_render_finite(scene, options, num_iterations: int = 1):
    """Raise if any iteration produces NaN/Inf in any render-state plane.

    ERRORCHECK=1 equivalent: checks after every iteration so the failing
    iteration index is reported.
    """
    from ..render.wavefront import init_render_state, trace_iteration

    state = init_render_state(scene)
    step = jax.jit(lambda st: trace_iteration(scene, options, st))
    check = jax.jit(_finite_fraction)
    for i in range(num_iterations):
        state = step(state)
        if not bool(check(state)):
            raise FloatingPointError(
                f"non-finite value in render state after iteration {i + 1} "
                f"(scene {scene.image_name!r})")
    return state


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context (PerformanceTimer/TIME-flag equivalent).

    View with TensorBoard's profile plugin or xprof on the written log_dir.
    """
    with jax.profiler.trace(log_dir):
        yield
