"""Three-part denoiser loss: spatial L1 + gradient-domain HFEN + temporal L1.

Port of loss.py:16-104 and the per-frame weighting of train.py:77-89, on
NHWC tensors.

Reference quirks preserved (they change the trained objective, so parity
requires them — see SURVEY.md §7):
  * The LoG "depthwise" filter is built by repeating a (1,1,3,3) kernel over
    the *input-channel* axis without conv groups (loss.py:24-31), so the
    Laplacian is summed across RGB into a single channel.
  * HFEN max-normalizes each LoG response by its global max when nonzero
    (loss.py:73-77).
  * The temporal stack's frame 0 is all zeros for both output and target
    (loss.py:86-93), contributing |0-0| to the temporal L1.
  * Gaussian kernel: 5x5, sigma=1.5, normalized to sum 1 (loss.py:33-65),
    applied depthwise per channel, with *VALID*-style torch Conv2d default
    padding=0 — the reference's nn.Conv2d has no padding argument
    (loss.py:59-60), so the blurred maps shrink by 4 px before the LoG.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# Gaussian-ramp frame weights val_j (train.py:77): exp(-(6-j)^2/8) rounded.
FRAME_RAMP = (0.011, 0.044, 0.135, 0.325, 0.607, 0.882, 1.0)


def l1_norm(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error (loss.py:82-84)."""
    return jnp.mean(jnp.abs(target - output))


def gaussian_kernel(kernel_size: int = 5, sigma: float = 1.5) -> jnp.ndarray:
    """2-D Gaussian, sum 1 (get_gaussian_kernel, loss.py:33-57)."""
    coords = jnp.arange(kernel_size, dtype=jnp.float32)
    xg, yg = jnp.meshgrid(coords, coords, indexing="xy")
    mean = (kernel_size - 1) / 2.0
    var = sigma ** 2
    g = (1.0 / (2.0 * math.pi * var)) * jnp.exp(
        -((xg - mean) ** 2 + (yg - mean) ** 2) / (2 * var))
    return g / jnp.sum(g)


def _depthwise_conv(x: jnp.ndarray, k2d: jnp.ndarray, padding) -> jnp.ndarray:
    """Depthwise 2-D conv on NHWC with a shared (kh,kw) kernel."""
    c = x.shape[-1]
    kernel = jnp.tile(k2d[:, :, None, None], (1, 1, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, preferred_element_type=_pref_dtype(x))


_LOG_KERNEL = jnp.array([[0.0, 1.0, 0.0],
                         [1.0, -4.0, 1.0],
                         [0.0, 1.0, 0.0]], jnp.float32)


def log_filter(x: jnp.ndarray) -> jnp.ndarray:
    """Channel-summed Laplacian, SAME padding (LoG, loss.py:16-31).

    Input (N,H,W,C) -> output (N,H,W,1): the reference's repeated-weight
    conv2d sums the Laplacian over input channels.
    """
    c = x.shape[-1]
    kernel = jnp.tile(_LOG_KERNEL[:, :, None, None], (1, 1, c, 1)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=_pref_dtype(x))


def hfen(output: jnp.ndarray, target: jnp.ndarray,
         axis_name=None) -> jnp.ndarray:
    """High-frequency error norm (HFEN, loss.py:68-79).

    Gaussian(5, 1.5) depthwise with no padding (torch Conv2d default), then
    channel-summed LoG, each max-normalized when its max is nonzero, then L1.
    With ``axis_name`` the normalizing max spans the data-parallel axis so
    sharded training reproduces single-device math exactly.
    """
    g = gaussian_kernel(5, 1.5)
    blurred_t = _depthwise_conv(target, g, "VALID")
    blurred_o = _depthwise_conv(output, g, "VALID")
    grad_t = log_filter(blurred_t)
    grad_o = log_filter(blurred_o)
    max_t = jnp.max(grad_t)
    max_o = jnp.max(grad_o)
    if axis_name is not None:
        # differentiable cross-device max: gather the per-device scalar
        # maxima (pmax has no VJP), then reduce
        max_t = jnp.max(jax.lax.all_gather(max_t, axis_name))
        max_o = jnp.max(jax.lax.all_gather(max_o, axis_name))
    grad_t = jnp.where(max_t != 0, grad_t / max_t, grad_t)
    grad_o = jnp.where(max_o != 0, grad_o / max_o, grad_o)
    return l1_norm(grad_o, grad_t)


def temporal_diff(seq: jnp.ndarray) -> jnp.ndarray:
    """Finite differences along the time axis, frame 0 zeroed.

    (T, ...) -> (T, ...): out[i] = seq[i] - seq[i-1], out[0] = 0
    (get_temporal_data, loss.py:86-93).
    """
    d = seq[1:] - seq[:-1]
    return jnp.concatenate([jnp.zeros_like(seq[:1]), d], axis=0)


def frame_loss(output, t_output, target, t_target, axis_name=None):
    """(ls, lg, lt) for one frame (loss_func, loss.py:99-104)."""
    return (l1_norm(output, target), hfen(output, target, axis_name),
            l1_norm(t_output, t_target))


def sequence_loss(outputs: jnp.ndarray, targets: jnp.ndarray,
                  w_spatial: float = 0.8, w_gradient: float = 0.1,
                  w_temporal: float = 0.1,
                  frame_ramp: Tuple[float, ...] = FRAME_RAMP,
                  axis_name=None):
    """Total BPTT loss over a (T, N, H, W, 3) sequence (train.py:76-89).

    total = sum_j (ws + r_j)*ls_j + (wg + r_j)*lg_j + (wt + r_j)*lt_j

    Returns (total, dict of summed components).
    """
    # Targets may arrive bf16 off the host pipeline (trainer._device_prefetch);
    # compute every loss term in the output dtype (f32).
    targets = targets.astype(outputs.dtype)
    t_out = temporal_diff(outputs)
    t_tgt = temporal_diff(targets)
    t = outputs.shape[0]
    assert len(frame_ramp) >= t, "frame_ramp shorter than sequence"

    def per_frame(j):
        return frame_loss(outputs[j], t_out[j], targets[j], t_tgt[j],
                          axis_name)

    total = jnp.zeros(())
    ls_sum = jnp.zeros(())
    lg_sum = jnp.zeros(())
    lt_sum = jnp.zeros(())
    for j in range(t):
        ls, lg, lt = per_frame(j)
        r = frame_ramp[j]
        total = total + (w_spatial + r) * ls + (w_gradient + r) * lg + (w_temporal + r) * lt
        ls_sum, lg_sum, lt_sum = ls_sum + ls, lg_sum + lg, lt_sum + lt
    return total, {"total": total, "l1": ls_sum, "hfen": lg_sum,
                   "temporal": lt_sum}


def _pref_dtype(x):
    """f32 accumulation, widened when inputs are f64 (x64 debugging mode)."""
    return jnp.float64 if x.dtype == jnp.float64 else jnp.float32
