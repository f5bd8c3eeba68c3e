"""BN-folded fast inference path (models/inference.py) vs the train graph.

The fold is exact in real arithmetic, so in float32 the folded conv-only
network must reproduce ``apply_frame(train=False)`` to rounding error —
including the downsample block's LReLU-before-bn2 quirk
(recurrent_autoencoder_model.py:31-32) that forces the forward fold of bn2
into conv3.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_path_tracer_denoiser_tpu.config import ModelOptions
from ai_path_tracer_denoiser_tpu.models import (
    apply_frame, apply_frame_fast, apply_sequence, apply_sequence_fast,
    fold_batchnorm, init_autoencoder, init_hidden, prepare_inference)

OPTS = ModelOptions(widths=(8, 11, 13, 16, 24))   # small but odd, like 43/57


def _nontrivial_model(key=0):
    """Params + bn_state with non-default running stats (as after training)."""
    params, bn_state = init_autoencoder(jax.random.PRNGKey(key), OPTS)
    k = jax.random.PRNGKey(key + 1)
    def perturb(path, a):
        nonlocal k
        k, sub = jax.random.split(k)
        leaf = path[-1].key
        if leaf == "mean":
            return jax.random.normal(sub, a.shape) * 0.3
        if leaf == "var":
            return jnp.abs(jax.random.normal(sub, a.shape)) * 0.5 + 0.7
        if leaf in ("scale", "bias"):
            return a + jax.random.normal(sub, a.shape) * 0.2
        return a
    bn_state = jax.tree_util.tree_map_with_path(perturb, bn_state)
    params = jax.tree_util.tree_map_with_path(perturb, params)
    return params, bn_state


def test_folded_matches_eval_mode_f32():
    params, bn_state = _nontrivial_model()
    folded = fold_batchnorm(params, bn_state, OPTS)
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 64, 64, 10))
    hidden = init_hidden(1, 64, 64, OPTS)
    # second frame too: carried hidden exercises the conv2 concat path
    y_ref, hid_ref, _ = apply_frame(params, bn_state, x, hidden,
                                    train=False, options=OPTS)
    y_ref2, _, _ = apply_frame(params, bn_state, x * 0.5, hid_ref,
                               train=False, options=OPTS)
    y, hid = apply_frame_fast(folded, x, hidden, OPTS,
                              compute_dtype=jnp.float32)
    y2, _ = apply_frame_fast(folded, x * 0.5, hid, OPTS,
                             compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y_ref2),
                               rtol=1e-4, atol=1e-4)
    for name in hid:
        np.testing.assert_allclose(np.asarray(hid[name]),
                                   np.asarray(hid_ref[name]),
                                   rtol=1e-4, atol=1e-4)


def test_folded_bf16_close():
    """bf16 compute tracks the f32 eval output to bf16 tolerance."""
    params, bn_state = _nontrivial_model(3)
    folded = prepare_inference(params, bn_state, OPTS)
    x = jax.random.uniform(jax.random.PRNGKey(9), (1, 64, 64, 10))
    hidden = init_hidden(1, 64, 64, OPTS, dtype=jnp.bfloat16)
    y_ref, _, _ = apply_frame(params, bn_state, x, hidden, train=False,
                              bf16=True, options=OPTS)
    y, _ = apply_frame_fast(folded, x, hidden, OPTS)
    assert y.dtype == jnp.float32
    err = np.max(np.abs(np.asarray(y) - np.asarray(y_ref)))
    scale = np.max(np.abs(np.asarray(y_ref))) + 1e-6
    assert err / scale < 0.12, (err, scale)


def test_sequence_fast_matches_sequence():
    params, bn_state = _nontrivial_model(5)
    folded = fold_batchnorm(params, bn_state, OPTS)
    x_seq = jax.random.normal(jax.random.PRNGKey(11), (3, 1, 32, 32, 10))
    y_ref, _, _ = apply_sequence(params, bn_state, x_seq, train=False,
                                 options=OPTS)
    y = apply_sequence_fast(folded, x_seq, OPTS, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_fold_rejects_groupnorm():
    params, bn_state = _nontrivial_model(1)
    with pytest.raises(ValueError, match="GroupNorm|norm="):
        fold_batchnorm(params, bn_state,
                       dataclasses.replace(OPTS, norm="group"))


def test_prepare_inference_casts_weights_only():
    params, bn_state = _nontrivial_model(2)
    folded = prepare_inference(params, bn_state, OPTS)
    assert folded["enc1"]["conv1"]["w"].dtype == jnp.bfloat16
    assert folded["enc1"]["conv1"]["b"].dtype == jnp.float32


def test_pad_channels_exact():
    """Channel padding is numerically exact: padded lanes carry hard zeros."""
    from ai_path_tracer_denoiser_tpu.models.inference import pad_channels
    params, bn_state = _nontrivial_model(7)
    folded = fold_batchnorm(params, bn_state, OPTS)
    x = jax.random.normal(jax.random.PRNGKey(21), (1, 64, 64, 10))
    hidden = init_hidden(1, 64, 64, OPTS)
    y_ref, hid_ref = apply_frame_fast(folded, x, hidden, OPTS,
                                      compute_dtype=jnp.float32)
    for mult in (8, 32):
        padded = pad_channels(folded, mult)
        wp = tuple(padded[f"enc{i}"]["conv1"]["w"].shape[-1]
                   for i in range(1, 6))
        assert all(c % mult == 0 for c in wp), wp
        opts_p = dataclasses.replace(OPTS, widths=wp)
        hid_p = init_hidden(1, 64, 64, opts_p)
        y, hid_out = apply_frame_fast(padded, x, hid_p, opts_p,
                                      compute_dtype=jnp.float32)
        assert y.shape == y_ref.shape
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)
        # real lanes of the padded hidden match; padded lanes are zero
        for name in hid_ref:
            c = hid_ref[name].shape[-1]
            np.testing.assert_allclose(np.asarray(hid_out[name][..., :c]),
                                       np.asarray(hid_ref[name]),
                                       rtol=2e-5, atol=2e-5)
            assert np.all(np.asarray(hid_out[name][..., c:]) == 0.0)


def test_pad_channels_with_carried_hidden():
    """Second frame (non-zero hidden) also exact under padding."""
    from ai_path_tracer_denoiser_tpu.models.inference import pad_channels
    params, bn_state = _nontrivial_model(8)
    folded = fold_batchnorm(params, bn_state, OPTS)
    padded = pad_channels(folded, 16)
    wp = tuple(padded[f"enc{i}"]["conv1"]["w"].shape[-1] for i in range(1, 6))
    opts_p = dataclasses.replace(OPTS, widths=wp)
    x = jax.random.uniform(jax.random.PRNGKey(22), (1, 32, 32, 10))
    _, hid = apply_frame_fast(folded, x, init_hidden(1, 32, 32, OPTS), OPTS,
                              compute_dtype=jnp.float32)
    _, hid_p = apply_frame_fast(padded, x, init_hidden(1, 32, 32, opts_p),
                                opts_p, compute_dtype=jnp.float32)
    y2, _ = apply_frame_fast(folded, x * 0.7, hid, OPTS,
                             compute_dtype=jnp.float32)
    y2p, _ = apply_frame_fast(padded, x * 0.7, hid_p, opts_p,
                              compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y2p), np.asarray(y2),
                               rtol=2e-5, atol=2e-5)


def test_padded_inference_non_divisible_resolution():
    """1080p-class frames (H not divisible by 32) run through the
    pad-and-crop wrapper: interior pixels must match the same network run
    at a natively-/32 resolution containing the frame, and the output crop
    must be exactly (h, w)."""
    from ai_path_tracer_denoiser_tpu.models import (
        apply_frame_fast_padded, padded_resolution)

    params, bn_state = _nontrivial_model()
    folded = prepare_inference(params, bn_state, OPTS,
                               compute_dtype=jnp.float32)
    h, w = 60, 96                       # h % 32 != 0 (pads to 64)
    hp, wp = padded_resolution(h, w)
    assert (hp, wp) == (64, 96)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, h, w, 10))
    hidden = init_hidden(1, hp, wp, OPTS)
    y, new_hidden = apply_frame_fast_padded(folded, x, hidden, OPTS,
                                            compute_dtype=jnp.float32)
    assert y.shape == (1, h, w, 3)
    # hidden comes back at the padded resolution for streaming
    assert new_hidden["enc1"].shape[1:3] == (hp, wp)
    # reference: run the padded frame through the unwrapped network
    xp = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)), mode="edge")
    y_ref, _ = apply_frame_fast(folded, xp, hidden, OPTS,
                                compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref)[:, :h, :w])


def test_matmul_conv_impl_matches_native():
    """conv_impl="matmul" (the 9-tap dot_general MXU path used on TPU)
    reproduces conv_impl="native" through the whole folded network to
    accumulation-order rounding."""
    params, bn_state = _nontrivial_model()
    folded = prepare_inference(params, bn_state, OPTS,
                               compute_dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 10))
    hidden = init_hidden(1, 64, 64, OPTS)
    y_nat, _ = apply_frame_fast(folded, x, hidden, OPTS,
                                compute_dtype=jnp.float32,
                                conv_impl="native")
    y_mm, _ = apply_frame_fast(folded, x, hidden, OPTS,
                               compute_dtype=jnp.float32,
                               conv_impl="matmul")
    np.testing.assert_allclose(np.asarray(y_mm), np.asarray(y_nat),
                               rtol=2e-4, atol=2e-4)


def test_conv_impl_im2row_matches_matmul():
    """The single-contraction im2row lowering computes the same conv as
    the 9-tap shifted-matmul lowering (f32: tight)."""
    import jax
    import jax.numpy as jnp

    from ai_path_tracer_denoiser_tpu.models.inference import _conv_act

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 24, 6), jnp.float32)
    conv = {"w": jax.random.normal(jax.random.PRNGKey(1), (3, 3, 6, 8),
                                   jnp.float32) * 0.2,
            "b": jax.random.normal(jax.random.PRNGKey(2), (8,), jnp.float32)}
    a = _conv_act(conv, x, 0.1, jnp.float32, impl="matmul")
    b = _conv_act(conv, x, 0.1, jnp.float32, impl="im2row")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                               atol=2e-6)
