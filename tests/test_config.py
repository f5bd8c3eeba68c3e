"""Every ModelOptions/RenderOptions knob is consumed by code (VERDICT r1 #6).

The reference's knobs are compile-time #defines; ours are dataclass fields.
These tests pin each previously-dead field to an observable behavior change.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_path_tracer_denoiser_tpu.config import ModelOptions, RenderOptions
from ai_path_tracer_denoiser_tpu.models import (apply_frame, init_autoencoder,
                                                init_hidden)
from ai_path_tracer_denoiser_tpu.models.layers import group_norm


SMALL = ModelOptions(widths=(8, 8, 8, 8, 8))


def _frame(opts=SMALL, seed=0, h=32, w=32):
    key = jax.random.PRNGKey(seed)
    params, bn_state = init_autoencoder(key, opts)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (1, h, w, 10))
    hidden = init_hidden(1, h, w, opts)
    return params, bn_state, x, hidden


def test_leaky_slope_is_consumed():
    params, bn_state, x, hidden = _frame()
    y1, _, _ = apply_frame(params, bn_state, x, hidden,
                           options=dataclasses.replace(SMALL, leaky_slope=0.1))
    y2, _, _ = apply_frame(params, bn_state, x, hidden,
                           options=dataclasses.replace(SMALL, leaky_slope=0.9))
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_bn_eps_is_consumed():
    params, bn_state, x, hidden = _frame()
    y1, _, _ = apply_frame(params, bn_state, x, hidden, train=True,
                           options=dataclasses.replace(SMALL, bn_eps=1e-5))
    y2, _, _ = apply_frame(params, bn_state, x, hidden, train=True,
                           options=dataclasses.replace(SMALL, bn_eps=10.0))
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_bn_momentum_is_consumed():
    params, bn_state, x, hidden = _frame()
    # momentum=1.0: running stats jump straight to the batch statistics;
    # momentum=0.0: running stats never move (torch convention).
    _, _, s_full = apply_frame(params, bn_state, x, hidden, train=True,
                               options=dataclasses.replace(SMALL, bn_momentum=1.0))
    _, _, s_frozen = apply_frame(params, bn_state, x, hidden, train=True,
                                 options=dataclasses.replace(SMALL, bn_momentum=0.0))
    frozen_mean = np.asarray(s_frozen["enc1"]["bn1"]["mean"])
    np.testing.assert_allclose(frozen_mean,
                               np.asarray(bn_state["enc1"]["bn1"]["mean"]))
    assert not np.allclose(np.asarray(s_full["enc1"]["bn1"]["mean"]),
                           frozen_mean)


def test_group_norm_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    c, groups = 16, 8
    x = np.random.RandomState(0).randn(2, 8, 8, c).astype(np.float32)
    params = {"scale": jnp.asarray(np.linspace(0.5, 1.5, c, dtype=np.float32)),
              "bias": jnp.asarray(np.linspace(-1, 1, c, dtype=np.float32))}
    ours = np.asarray(group_norm(params, jnp.asarray(x), groups=groups))
    gn = torch.nn.GroupNorm(groups, c)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(np.asarray(params["scale"])))
        gn.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))
        ref = gn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_norm_group_runs_and_leaves_bn_state_untouched():
    # Reference widths are NOT multiples of 8 — gcd grouping must handle them.
    opts = ModelOptions(norm="group")
    params, bn_state, x, hidden = _frame(opts)
    y, new_hidden, new_state = apply_frame(params, bn_state, x, hidden,
                                           train=True, options=opts)
    assert y.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(y)).all()
    for a, b in zip(jax.tree_util.tree_leaves(bn_state),
                    jax.tree_util.tree_leaves(new_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and it differs from the batch-norm forward
    y_bn, _, _ = apply_frame(params, bn_state, x, hidden, train=True,
                             options=dataclasses.replace(opts, norm="batch"))
    assert not np.allclose(np.asarray(y), np.asarray(y_bn))


def test_norm_group_gradients_flow():
    opts = ModelOptions(norm="group", widths=(8, 8, 8, 8, 8))
    params, bn_state, x, hidden = _frame(opts)

    def loss(p):
        y, _, _ = apply_frame(p, bn_state, x, hidden, train=True, options=opts)
        return jnp.mean(jnp.square(y))

    g = jax.grad(loss)(params)
    norms = [float(jnp.linalg.norm(v)) for v in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(norms))
    assert max(norms) > 0


def test_accum_dtype_bfloat16(cornell_scene_small):
    from ai_path_tracer_denoiser_tpu.render import render
    opts = RenderOptions(accum_dtype="bfloat16")
    image, gbuf, state = render(cornell_scene_small, opts, num_iterations=2)
    assert state.accum.x.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(image)).all()
    # f32 render agrees loosely (bf16 has ~3 decimal digits)
    image32, _, _ = render(cornell_scene_small, RenderOptions(), num_iterations=2)
    np.testing.assert_allclose(np.asarray(image), np.asarray(image32),
                               atol=0.05)


def test_invalid_knobs_rejected():
    with pytest.raises(AssertionError):
        ModelOptions(norm="layer")
    with pytest.raises(AssertionError):
        RenderOptions(accum_dtype="float16")
