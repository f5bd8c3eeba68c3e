"""Fused Pallas conv3x3 kernel vs the XLA lowerings (interpret mode).

The kernel must be a drop-in for models/inference.py's _conv_act: same
SAME-padding semantics, f32 accumulation, bias + LeakyReLU (+ affine)
epilogue.  f32 inputs make the comparison tight (the only reordering is
the dy/dx accumulation order).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_path_tracer_denoiser_tpu.models.conv_kernel import (
    TH, conv3x3_act, conv_input_pad, pack_weights, supported_height)


def _ref_conv(x, w, b, slope):
    y = jax.lax.conv_general_dilated(
        x[None], w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)[0]
    y = y + b
    return jnp.where(y >= 0, y, y * slope)


@pytest.mark.parametrize("h,w,ci,co", [(16, 24, 10, 32), (32, 32, 64, 32),
                                       (16, 16, 32, 3)])
def test_kernel_matches_native(h, w, ci, co):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (h, w, ci), jnp.float32)
    wt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, ci, co),
                           jnp.float32) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (co,), jnp.float32)
    ref = np.asarray(_ref_conv(x, wt, b, 0.1))
    got = np.asarray(conv3x3_act(x, wt, b, 0.1, interpret=True))
    # f32 accumulation in a different dy/dx order (+ FMA contraction in
    # the XLA reference) -> ulp-scale noise, not bitwise
    np.testing.assert_allclose(got, ref.astype(got.dtype), rtol=1e-3,
                               atol=1e-5)
    assert float(np.abs(got - ref).mean()) < 1e-6


def test_kernel_affine_epilogue():
    x = jax.random.normal(jax.random.PRNGKey(3), (16, 16, 8), jnp.float32)
    wt = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 8, 16),
                           jnp.float32) * 0.1
    b = jnp.zeros((16,), jnp.float32)
    s = jnp.linspace(0.5, 2.0, 16)
    t = jnp.linspace(-1.0, 1.0, 16)
    ref = _ref_conv(x, wt, b, 0.1) * s + t
    got = np.asarray(conv3x3_act(x, wt, b, 0.1, affine={"s": s, "t": t},
                                 interpret=True))
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-6, atol=2e-6)


def test_kernel_pre_padded_skips_pad():
    x = jax.random.normal(jax.random.PRNGKey(5), (16, 16, 4), jnp.float32)
    wt = jax.random.normal(jax.random.PRNGKey(6), (3, 3, 4, 8),
                           jnp.float32)
    b = jnp.zeros((8,), jnp.float32)
    a = conv3x3_act(x, wt, b, 0.1, interpret=True)
    bb = conv3x3_act(conv_input_pad(x), wt, b, 0.1, interpret=True,
                     pre_padded=True, width=16)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_pack_weights_layout():
    w = jnp.arange(3 * 3 * 2 * 4, dtype=jnp.float32).reshape(3, 3, 2, 4)
    wall = pack_weights(w)
    assert wall.shape == (6, 12)
    for dy in range(3):
        for dx in range(3):
            np.testing.assert_array_equal(
                np.asarray(wall[dy * 2:(dy + 1) * 2, dx * 4:(dx + 1) * 4]),
                np.asarray(w[dy, dx]))


def test_supported_height():
    assert supported_height(832) and supported_height(416)
    assert supported_height(104) and not supported_height(52)
    assert TH == 8


def test_apply_frame_fast_pallas_impl_matches():
    """The conv_impl="pallas" deployment path (interpret mode here) agrees
    with the XLA path through the full folded network."""
    import jax

    from ai_path_tracer_denoiser_tpu.config import ModelOptions
    from ai_path_tracer_denoiser_tpu.models import (apply_frame_fast,
                                                    init_autoencoder,
                                                    init_hidden,
                                                    prepare_inference)

    opts = ModelOptions()
    params, bn_state = init_autoencoder(jax.random.PRNGKey(0), opts)
    folded = prepare_inference(params, bn_state, opts,
                               compute_dtype=jnp.float32)
    h = w = 64
    x = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 10), jnp.float32)
    hidden = init_hidden(1, h, w, opts, dtype=jnp.float32)
    y_ref, hid_ref = apply_frame_fast(folded, x, hidden, opts,
                                      compute_dtype=jnp.float32,
                                      conv_impl="native")
    y_pal, hid_pal = apply_frame_fast(folded, x, hidden, opts,
                                      compute_dtype=jnp.float32,
                                      conv_impl="pallas")
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=2e-3, atol=2e-4)
    for k in hid_ref:
        np.testing.assert_allclose(np.asarray(hid_pal[k]),
                                   np.asarray(hid_ref[k]),
                                   rtol=2e-3, atol=2e-4, err_msg=k)


# ---------------------------------------------------------------------------
# v2 CHW-packed kernel (the shipping TPU path: conv_impl="pallas2")
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("h,w,ci,co", [(16, 200, 10, 32), (8, 128, 3, 3),
                                       (16, 256, 64, 32), (24, 130, 43, 57)])
def test_chw_kernel_matches_native(h, w, ci, co):
    """The W=128 case exercises the lane-rotate wrap: without a spare
    zero column past W the +-1 dx rotates would wrap real data."""
    from ai_path_tracer_denoiser_tpu.models.conv_kernel import conv3x3_act_chw

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (h, w, ci), jnp.float32)
    wgt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, ci, co),
                            jnp.float32) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (co,), jnp.float32)
    y = conv3x3_act_chw(x, wgt, b, 0.1, interpret=True)
    ref = _ref_conv(x, wgt, b, 0.1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_chw_kernel_affine_epilogue():
    from ai_path_tracer_denoiser_tpu.models.conv_kernel import conv3x3_act_chw

    x = jax.random.normal(jax.random.PRNGKey(3), (8, 144, 32), jnp.float32)
    wgt = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 32, 32),
                            jnp.float32) * 0.1
    b = jnp.zeros((32,), jnp.float32)
    aff = {"s": jax.random.normal(jax.random.PRNGKey(5), (32,), jnp.float32),
           "t": jax.random.normal(jax.random.PRNGKey(6), (32,), jnp.float32)}
    y = conv3x3_act_chw(x, wgt, b, 0.1, affine=aff, interpret=True)
    ref = _ref_conv(x, wgt, b, 0.1) * aff["s"] + aff["t"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_apply_frame_fast_pallas2_impl_matches():
    """conv_impl="pallas2" (the TPU auto default) through the full folded
    network, interpret mode, f32: agrees with the native path."""
    from ai_path_tracer_denoiser_tpu.config import ModelOptions
    from ai_path_tracer_denoiser_tpu.models import (apply_frame_fast,
                                                    init_autoencoder,
                                                    init_hidden,
                                                    prepare_inference)

    opts = ModelOptions()
    params, bn_state = init_autoencoder(jax.random.PRNGKey(0), opts)
    folded = prepare_inference(params, bn_state, opts,
                               compute_dtype=jnp.float32)
    h = w = 64
    x = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 10), jnp.float32)
    hidden = init_hidden(1, h, w, opts, dtype=jnp.float32)
    y_ref, hid_ref = apply_frame_fast(folded, x, hidden, opts,
                                      compute_dtype=jnp.float32,
                                      conv_impl="native")
    y_pal, hid_pal = apply_frame_fast(folded, x, hidden, opts,
                                      compute_dtype=jnp.float32,
                                      conv_impl="pallas2")
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=2e-3, atol=2e-4)
    for k in hid_ref:
        np.testing.assert_allclose(np.asarray(hid_pal[k]),
                                   np.asarray(hid_ref[k]),
                                   rtol=2e-3, atol=2e-4, err_msg=k)


def test_conv2d_pallas2_grad_matches_native():
    """Training-path conv (layers.conv2d impl='pallas2', custom VJP:
    fwd+dgrad on the CHW kernel, wgrad on XLA) — value and grads agree
    with the native conv to f32 rounding."""
    from ai_path_tracer_denoiser_tpu.models.layers import conv2d

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 24, 5), jnp.float32)
    p = {"w": jax.random.normal(jax.random.PRNGKey(1), (3, 3, 5, 7),
                                jnp.float32) * 0.2,
         "b": jax.random.normal(jax.random.PRNGKey(2), (7,), jnp.float32)}

    def loss(p, impl):
        return jnp.sum(jnp.sin(conv2d(p, x, impl=impl)))

    va, ga = jax.value_and_grad(loss)(p, "native")
    vb, gb = jax.value_and_grad(loss)(p, "pallas2")
    assert abs(float(va - vb)) < 1e-4
    np.testing.assert_allclose(np.asarray(ga["w"]), np.asarray(gb["w"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga["b"]), np.asarray(gb["b"]),
                               rtol=1e-4, atol=1e-4)
