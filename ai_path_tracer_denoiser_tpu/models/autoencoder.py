"""Recurrent denoising autoencoder — pure-JAX, time axis via ``lax.scan``.

Architecture port of recurrent_autoencoder_model.py:8-142: a 5-stage U-Net
with per-stage recurrent hidden states.

  encoder_i : RecurrentBlock(downsample) + MaxPool2d(2)
              layer1 = Conv3x3 -> BN -> LReLU(0.1)                  (:23-27)
              layer2 = Conv3x3(cat(out1, hidden)) -> LReLU -> BN
                       -> Conv3x3 -> BN -> LReLU                    (:29-36)
              hidden <- layer2 output (pre-pool)                    (:64-70)
  bottleneck: like encoder block but layer2 order Conv->BN->LReLU x2 (:49-62)
  decoder_i : Upsample(nearest x2) -> Conv3x3(2*in -> out) -> BN -> LReLU
              -> Conv3x3 -> BN -> LReLU                             (:38-47)
  skips     : cat(decoder_in, encoder_out_same_scale)               (:136-140)

Channel plan 10 -> 32/43/57/76/101 -> ... -> 3 (:98-115).  The non-standard
op order inside the downsample layer2 (LReLU *before* BN) is preserved.

Differences by design (documented, deliberate):
  * NHWC layout and optional bf16 conv compute (TPU-native) instead of NCHW;
  * hidden states are explicit function arguments threaded through
    ``lax.scan`` instead of module attributes — which also fixes the
    reference's traced-export bug where ``torch.jit.trace`` bakes in the
    j==0 hidden re-init (convert_to_torchscript.py:29, SURVEY.md §7);
  * BatchNorm statistics can be averaged across a data-parallel axis.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelOptions
from .layers import (batch_norm, bn_init, bn_state_init, conv2d, conv_init,
                     group_norm, leaky_relu, max_pool_2x2, upsample_nearest_2x)


def _norm(opts: ModelOptions, params, state, x, train, axis_name,
          spatial_axis):
    """Normalization dispatch: BatchNorm (reference parity) or GroupNorm(8).

    GroupNorm is stateless — the bn running-stat state passes through
    untouched so checkpoints keep one structure across both modes.
    """
    if opts.norm == "group":
        y = group_norm(params, x, groups=8, eps=opts.bn_eps,
                       spatial_axis=spatial_axis)
        return y, state
    return batch_norm(params, state, x, train, momentum=opts.bn_momentum,
                      eps=opts.bn_eps, axis_name=axis_name)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _down_block_init(key, c_in, c_out):
    k = jax.random.split(key, 3)
    return {
        "conv1": conv_init(k[0], 3, c_in, c_out), "bn1": bn_init(c_out),
        "conv2": conv_init(k[1], 3, 2 * c_out, c_out), "bn2": bn_init(c_out),
        "conv3": conv_init(k[2], 3, c_out, c_out), "bn3": bn_init(c_out),
    }


def _down_block_state(c_out):
    return {"bn1": bn_state_init(c_out), "bn2": bn_state_init(c_out),
            "bn3": bn_state_init(c_out)}


def _up_block_init(key, c_in, c_out):
    k = jax.random.split(key, 2)
    return {
        "conv1": conv_init(k[0], 3, 2 * c_in, c_out), "bn1": bn_init(c_out),
        "conv2": conv_init(k[1], 3, c_out, c_out), "bn2": bn_init(c_out),
    }


def _up_block_state(c_out):
    return {"bn1": bn_state_init(c_out), "bn2": bn_state_init(c_out)}


def init_autoencoder(key, options: ModelOptions = ModelOptions()):
    """Returns (params, bn_state). Channel plan per options.widths."""
    w = options.widths
    cs = [options.in_channels] + list(w)          # 10, 32, 43, 57, 76, 101
    keys = jax.random.split(key, 11)
    params = {}
    state = {}
    for i in range(5):
        params[f"enc{i + 1}"] = _down_block_init(keys[i], cs[i], cs[i + 1])
        state[f"enc{i + 1}"] = _down_block_state(cs[i + 1])
    params["bottleneck"] = _down_block_init(keys[5], w[4], w[4])
    state["bottleneck"] = _down_block_state(w[4])
    dec_out = list(w[:4][::-1]) + [options.out_channels]   # 76,57,43,32,3
    dec_in = list(w[::-1])                                  # 101,76,57,43,32
    for i in range(5):
        name = f"dec{5 - i}"
        params[name] = _up_block_init(keys[6 + i], dec_in[i], dec_out[i])
        state[name] = _up_block_state(dec_out[i])
    return params, state


def init_hidden(batch: int, height: int, width: int,
                options: ModelOptions = ModelOptions(),
                dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Zero hidden states (init_hidden, recurrent_autoencoder_model.py:83-90).

    Stage s hidden lives at the *input* resolution of that stage:
    factors 1, 2, 4, 8, 16 for enc1..5 and 32 for the bottleneck.
    """
    w = options.widths
    hidden = {}
    for i, f in enumerate([1, 2, 4, 8, 16]):
        hidden[f"enc{i + 1}"] = jnp.zeros(
            (batch, height // f, width // f, w[i]), dtype)
    hidden["bottleneck"] = jnp.zeros(
        (batch, height // 32, width // 32, w[4]), dtype)
    return hidden


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _down_block(params, state, x, hidden, train, bf16, axis_name,
                spatial_axis=None, opts: ModelOptions = ModelOptions()):
    """Downsample RecurrentBlock forward (:64-70). Returns (out, new_state)."""
    slope = opts.leaky_slope
    out1 = conv2d(params["conv1"], x, bf16, spatial_axis)
    out1, s1 = _norm(opts, params["bn1"], state["bn1"], out1, train,
                     axis_name, spatial_axis)
    out1 = leaky_relu(out1, slope)
    h = jnp.concatenate([out1, hidden.astype(out1.dtype)], axis=-1)
    out2 = conv2d(params["conv2"], h, bf16, spatial_axis)
    out2 = leaky_relu(out2, slope)                # LReLU before BN (:31-32)
    out2, s2 = _norm(opts, params["bn2"], state["bn2"], out2, train,
                     axis_name, spatial_axis)
    out2 = conv2d(params["conv3"], out2, bf16, spatial_axis)
    out2, s3 = _norm(opts, params["bn3"], state["bn3"], out2, train,
                     axis_name, spatial_axis)
    out2 = leaky_relu(out2, slope)
    return out2, {"bn1": s1, "bn2": s2, "bn3": s3}


def _bottleneck_block(params, state, x, hidden, train, bf16, axis_name,
                      spatial_axis=None, opts: ModelOptions = ModelOptions()):
    """Bottleneck forward (:75-81); layer2 order Conv->BN->LReLU (:55-62)."""
    slope = opts.leaky_slope
    out1 = conv2d(params["conv1"], x, bf16, spatial_axis)
    out1, s1 = _norm(opts, params["bn1"], state["bn1"], out1, train,
                     axis_name, spatial_axis)
    out1 = leaky_relu(out1, slope)
    h = jnp.concatenate([out1, hidden.astype(out1.dtype)], axis=-1)
    out2 = conv2d(params["conv2"], h, bf16, spatial_axis)
    out2, s2 = _norm(opts, params["bn2"], state["bn2"], out2, train,
                     axis_name, spatial_axis)
    out2 = leaky_relu(out2, slope)
    out2 = conv2d(params["conv3"], out2, bf16, spatial_axis)
    out2, s3 = _norm(opts, params["bn3"], state["bn3"], out2, train,
                     axis_name, spatial_axis)
    out2 = leaky_relu(out2, slope)
    return out2, {"bn1": s1, "bn2": s2, "bn3": s3}


def _up_block(params, state, x, train, bf16, axis_name, spatial_axis=None,
              opts: ModelOptions = ModelOptions()):
    """Upsample RecurrentBlock forward (:38-47, :72-73)."""
    slope = opts.leaky_slope
    x = upsample_nearest_2x(x)
    y = conv2d(params["conv1"], x, bf16, spatial_axis)
    y, s1 = _norm(opts, params["bn1"], state["bn1"], y, train,
                  axis_name, spatial_axis)
    y = leaky_relu(y, slope)
    y = conv2d(params["conv2"], y, bf16, spatial_axis)
    y, s2 = _norm(opts, params["bn2"], state["bn2"], y, train,
                  axis_name, spatial_axis)
    y = leaky_relu(y, slope)
    return y, {"bn1": s1, "bn2": s2}


def apply_frame(params, bn_state, x: jnp.ndarray, hidden: Dict,
                train: bool = False, bf16: bool = False,
                axis_name: Optional[str] = None,
                spatial_axis: Optional[str] = None,
                options: Optional[ModelOptions] = None
                ) -> Tuple[jnp.ndarray, Dict, Dict]:
    """One frame through the autoencoder (AutoEncoder.forward, :120-142).

    Args:
      x: (N, H, W, 10) G-buffer frame; H, W divisible by 32.
      hidden: dict from ``init_hidden`` (or the previous frame's output).
      options: norm choice / leaky slope / bn eps+momentum; defaults to the
        reference configuration (BatchNorm, slope 0.1, eps 1e-5, momentum 0.1).
    Returns:
      (denoised (N, H, W, 3), new_hidden, new_bn_state)
    """
    opts = options if options is not None else ModelOptions()
    _, h, w, _ = x.shape
    if h % 32 or w % 32:
        raise ValueError(
            f"input {h}x{w} must be divisible by 32 (5 pool/upsample stages, "
            "recurrent_autoencoder_model.py:98-117); pad or crop the frame")
    new_hidden = {}
    new_state = {}
    skips = []
    y = x
    for i in range(1, 6):
        name = f"enc{i}"
        out, new_state[name] = _down_block(
            params[name], bn_state[name], y, hidden[name], train, bf16,
            axis_name, spatial_axis, opts)
        new_hidden[name] = out
        y = max_pool_2x2(out)
        # the reference's skip tensors are the *pooled* encoder outputs —
        # encoderN = Sequential(RecurrentBlock, MaxPool2d) (:98-107, 136-140)
        skips.append(y)

    out, new_state["bottleneck"] = _bottleneck_block(
        params["bottleneck"], bn_state["bottleneck"], y, hidden["bottleneck"],
        train, bf16, axis_name, spatial_axis, opts)
    new_hidden["bottleneck"] = out
    y = out

    for i in range(5, 0, -1):
        name = f"dec{i}"
        y = jnp.concatenate([y, skips[i - 1].astype(y.dtype)], axis=-1)
        y, new_state[name] = _up_block(params[name], bn_state[name], y,
                                       train, bf16, axis_name, spatial_axis,
                                       opts)
    return y, new_hidden, new_state


def apply_sequence(params, bn_state, x_seq: jnp.ndarray,
                   train: bool = False, bf16: bool = False,
                   axis_name: Optional[str] = None,
                   spatial_axis: Optional[str] = None,
                   remat: bool = False,
                   options: Optional[ModelOptions] = None):
    """A whole temporal sequence via ``lax.scan`` (train.py:70-75 loop).

    Args:
      x_seq: (T, N, H, W, 10) time-major G-buffer sequence.
      remat: rematerialize each frame's activations in the backward pass
        (``jax.checkpoint`` around the scan step).  BPTT otherwise keeps
        every conv activation of all T frames live — at batch 8 x 256^2
        that exceeds a v5e chip's HBM; remat trades ~30% more FLOPs for
        O(T) x less residual memory.
    Returns:
      (outputs (T, N, H, W, 3), final_hidden, final_bn_state)

    Hidden states start at zero (j==0 re-init, :121-128) and persist across
    the scanned frames — BPTT differentiates through the whole scan.
    """
    t, n, h, w, _ = x_seq.shape
    widths = tuple(params[f"enc{i}"]["conv1"]["w"].shape[-1] for i in range(1, 6))
    import dataclasses as _dc
    base = options if options is not None else ModelOptions()
    # widths/channels always come from the params themselves — `options`
    # only ever overrides behavior knobs (norm, slope, eps, momentum).
    options = _dc.replace(
        base, widths=widths, in_channels=x_seq.shape[-1],
        out_channels=params["dec1"]["conv2"]["w"].shape[-1])
    # The conv blocks always emit f32 (f64 under x64) regardless of the
    # input dtype — bf16 stays inside the MXU (layers.py:80).  The hidden
    # carry must match that output dtype, NOT x_seq's (a bf16 input batch
    # would otherwise make the scan carry dtypes disagree).
    carry_dtype = jnp.float64 if x_seq.dtype == jnp.float64 else jnp.float32
    hidden0 = init_hidden(n, h, w, options, dtype=carry_dtype)

    def step(carry, x):
        hidden, state = carry
        y, hidden, state = apply_frame(params, state, x, hidden, train, bf16,
                                       axis_name, spatial_axis, options)
        return (hidden, state), y

    if remat:
        step = jax.checkpoint(step)
    (hidden, bn_state), ys = jax.lax.scan(step, (hidden0, bn_state), x_seq)
    return ys, hidden, bn_state
