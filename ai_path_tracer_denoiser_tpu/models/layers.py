"""Primitive NN layers — NHWC, explicit param pytrees, TPU-native dtypes.

Everything the reference builds from torch.nn (recurrent_autoencoder_model.py)
re-expressed as pure functions over parameter dicts:

  conv3x3 SAME      <- nn.Conv2d(k=3, padding=1)
  batch_norm        <- nn.BatchNorm2d (eps 1e-5, momentum 0.1, batch stats in
                       train mode, running stats in eval — torch semantics,
                       including unbiased variance for the running estimate)
  leaky_relu(0.1)   <- nn.LeakyReLU(negative_slope=0.1)
  max_pool_2x2      <- nn.MaxPool2d(2)
  upsample_nearest  <- nn.Upsample(scale_factor=2, mode='nearest')

Convs optionally run in bfloat16 with float32 accumulation (MXU-friendly);
parameters and normalization stay float32.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def conv_init(key, k: int, c_in: int, c_out: int):
    """Kaiming-normal fan_in (train.py:32-35): std = sqrt(2 / (k*k*c_in)),
    bias = 0.01."""
    fan_in = k * k * c_in
    std = (2.0 / fan_in) ** 0.5
    w = jax.random.normal(key, (k, k, c_in, c_out), jnp.float32) * std
    b = jnp.full((c_out,), 0.01, jnp.float32)
    return {"w": w, "b": b}


def bn_init(c: int):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def bn_state_init(c: int):
    return {"mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32)}


def _conv_sum_taps(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """kxk SAME conv as k² shifted (N·H·W, Cin) @ (Cin, Cout) matmuls.

    The MXU path: this toolchain lowers `lax.conv_general_dilated` with
    NHWC and sub-128 channel counts to direct convolution on the VPU
    (~2.7 TFLOPS ceiling — tools/denoiser_breakdown.py); expressed as
    dot_generals the same MACs ride the systolic array.  One zero-pad,
    then k² static slices of the SAME padded buffer.  Partials round to
    the operand dtype per tap (the channel reduction inside each dot still
    accumulates f32 on the MXU) and sum in f32 — under AD each tap's
    transpose is another dot_general, so the backward pass is MXU-bound
    too.
    """
    n, h, ww, c = x.shape
    kh, kw = w.shape[0], w.shape[1]
    ph, pw = kh // 2, kw // 2
    acc_dt = jnp.promote_types(x.dtype, jnp.float32)   # f32; f64 under x64
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            xs = jax.lax.slice(xp, (0, dy, dx, 0), (n, dy + h, dx + ww, c))
            part = jax.lax.dot_general(
                xs, w[dy, dx], (((3,), (0,)), ((), ()))).astype(acc_dt)
            acc = part if acc is None else acc + part
    return acc


@jax.custom_vjp
def _conv3x3_pallas_nb(x, w):
    """Batched pure 3x3 SAME conv via the CHW-packed Pallas kernel.

    Forward AND input-gradient ride models/conv_kernel.py (slope=1.0
    turns its LReLU epilogue into identity; zero bias); the weight
    gradient stays on XLA shifted dot_generals (a big-K contraction the
    MXU already handles well).  f32-accumulated, returns x.dtype.
    """
    return _conv3x3_pallas_fwd(x, w)[0]


def _conv3x3_pallas_fwd(x, w):
    from .conv_kernel import conv3x3_act_chw
    zb = jnp.zeros((w.shape[-1],), jnp.float32)
    # out_dtype f32: hand the f32 accumulator to the bias add below even
    # under bf16 inputs — matches _conv_sum_taps numerics (r4 advisor)
    y = jnp.stack([conv3x3_act_chw(x[n], w, zb, 1.0, out_dtype="float32")
                   for n in range(x.shape[0])])
    return y, (x, w)


def _conv3x3_pallas_bwd(res, g):
    from .conv_kernel import conv3x3_act_chw
    x, w = res
    g = g.astype(x.dtype)
    # dx: correlate g with the spatially-flipped, io-transposed weights —
    # itself a 3x3 SAME conv, so it rides the same fast kernel.
    wt = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    zb = jnp.zeros((w.shape[2],), jnp.float32)
    dx = jnp.stack([conv3x3_act_chw(g[n], wt.astype(x.dtype), zb, 1.0)
                    for n in range(g.shape[0])])
    # dw[dy,dx,ci,co] = sum_{n,h,w} xpad[n,h+dy,w+dx,ci] * g[n,h,w,co]
    n, h, ww, ci = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = []
    for dy in range(3):
        row = []
        for dxi in range(3):
            xs = jax.lax.slice(xp, (0, dy, dxi, 0), (n, dy + h, dxi + ww, ci))
            row.append(jax.lax.dot_general(
                xs, g, (((0, 1, 2), (0, 1, 2)), ((), ())),
                preferred_element_type=jnp.float32))
        taps.append(jnp.stack(row))
    dw = jnp.stack(taps).astype(w.dtype)
    return dx.astype(x.dtype), dw


_conv3x3_pallas_nb.defvjp(_conv3x3_pallas_fwd, _conv3x3_pallas_bwd)


def conv2d(params, x: jnp.ndarray, bf16: bool = False,
           spatial_axis: Optional[str] = None,
           impl: str = "auto") -> jnp.ndarray:
    """3x3 (or kxk) SAME conv, NHWC/HWIO.

    With ``spatial_axis`` set (inside shard_map, H sharded over that mesh
    axis), a halo exchange via ppermute supplies the neighbor rows so the
    sharded result is bitwise-equivalent to the unsharded SAME conv — the
    context-parallel analogue for conv nets (SURVEY.md §2 SP row).

    ``impl``: "matmul" = shifted-dot_general MXU path (`_conv_sum_taps`),
    "native" = lax.conv, "auto" = matmul on TPU (where native conv runs on
    the VPU at ~2.7 TFLOPS), native elsewhere.
    """
    w = params["w"]
    if bf16:
        # bf16 in / bf16 out (the MXU still accumulates f32 internally);
        # preferred_element_type=f32 here would make the conv *transpose*
        # rule see mixed bf16/f32 operands and fail under AD. The explicit
        # f32 upcast happens at the bias add below.
        x = x.astype(jnp.bfloat16)
        w = w.astype(jnp.bfloat16)
        pref = None
    else:
        pref = _pref_dtype(x)
    if impl == "auto":
        import os
        impl = os.environ.get(
            "APTD_CONV_IMPL",
            "pallas2" if jax.default_backend() == "tpu" else "native")
    if (spatial_axis is None and impl == "pallas2"
            and w.shape[0] == 3 and w.shape[1] == 3
            and x.shape[1] % 8 == 0):
        # CHW-packed Pallas kernel for fwd + dgrad (custom VJP above) —
        # the TPU default (batch-4 train step 112.5 -> 86.0 ms, r4).
        # Gradient parity vs the native path is f32-rounding-level
        # (tests/test_model.py grad check); the kernel hands back the f32
        # accumulator, so the bias add matches _conv_sum_taps bit-for-bit
        # in both bf16 and full-precision modes.  The r4/r5 campaigns ran
        # the matmul path (APTD_CONV_IMPL=matmul to reproduce).
        return _conv3x3_pallas_nb(x, w) + params["b"]
    if spatial_axis is None and impl in ("matmul", "pallas2"):
        # _conv_sum_taps already yields the f32 (f64 under x64) accumulator
        # the bias add below expects in both bf16 and full-precision modes
        return _conv_sum_taps(x, w) + params["b"]
    if spatial_axis is None:
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pref)
    else:
        kh = w.shape[0]
        halo = kh // 2
        x = _halo_exchange_rows(x, halo, spatial_axis)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1),
            padding=((0, 0), (w.shape[1] // 2, w.shape[1] // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pref)
    if bf16:
        y = y.astype(jnp.float32)
    return y + params["b"]


def _halo_exchange_rows(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Concat ``halo`` rows from H-axis neighbors (zeros at global edges).

    ppermute rides the ICI ring; each shard sends its boundary rows both
    ways, replacing the zero padding XLA would apply at shard-local edges.
    """
    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, i + 1) for i in range(n_dev - 1)]    # send down
    bwd = [(i + 1, i) for i in range(n_dev - 1)]    # send up
    from_above = jax.lax.ppermute(x[:, -halo:], axis_name, fwd)
    from_below = jax.lax.ppermute(x[:, :halo], axis_name, bwd)
    zeros = jnp.zeros_like(x[:, :halo])
    top = jnp.where(idx == 0, zeros, from_above)
    bottom = jnp.where(idx == n_dev - 1, zeros, from_below)
    return jnp.concatenate([top, x, bottom], axis=1)


def batch_norm(params, state, x: jnp.ndarray, train: bool,
               momentum: float = 0.1, eps: float = 1e-5,
               axis_name: Optional[str] = None):
    """BatchNorm over (N, H, W). Returns (y, new_state).

    In train mode, normalizes with biased batch statistics and updates the
    running estimates with the unbiased variance (torch convention).  When
    ``axis_name`` is given (data-parallel shard_map/pmap), statistics are
    averaged across devices so sharded training matches single-device math.
    """
    # bf16 activations normalize in f32; f32/f64 pass through unchanged
    x32 = x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x
    if train:
        mean = jnp.mean(x32, axis=(0, 1, 2))
        sqmean = jnp.mean(jnp.square(x32), axis=(0, 1, 2))
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            sqmean = jax.lax.pmean(sqmean, axis_name)
        var = sqmean - jnp.square(mean)
        n = x32.shape[0] * x32.shape[1] * x32.shape[2]
        if axis_name is not None:
            n = n * jax.lax.psum(jnp.ones(()), axis_name)
        unbiased = var * (n / jnp.maximum(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x32 - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]
    return y, new_state


def group_norm(params, x: jnp.ndarray, groups: int = 8, eps: float = 1e-5,
               spatial_axis: Optional[str] = None) -> jnp.ndarray:
    """GroupNorm over (H, W, C/groups) per sample — the batch-1-recurrence-
    friendly alternative to BatchNorm (ModelOptions.norm="group").

    The effective group count is gcd(groups, C) so channel plans that are
    not multiples of ``groups`` (the reference's 43/57/76/101, the decoder's
    3-channel output) still normalize cleanly — matching torch.nn.GroupNorm
    semantics for the divisible case.  Stateless: no running estimates.

    Under spatial sharding (H split over ``spatial_axis``) the statistics are
    psum'd across shards so the sharded output equals the unsharded one.
    """
    import math as _math
    n, h, w, c = x.shape
    g = _math.gcd(groups, c)
    x32 = x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x
    xg = x32.reshape(n, h, w, g, c // g)
    mean = jnp.mean(xg, axis=(1, 2, 4))            # (N, g)
    sqmean = jnp.mean(jnp.square(xg), axis=(1, 2, 4))
    if spatial_axis is not None:
        mean = jax.lax.pmean(mean, spatial_axis)
        sqmean = jax.lax.pmean(sqmean, spatial_axis)
    var = sqmean - jnp.square(mean)
    mean = mean[:, None, None, :, None]
    inv = jax.lax.rsqrt(var + eps)[:, None, None, :, None]
    y = ((xg - mean) * inv).reshape(n, h, w, c)
    return y * params["scale"] + params["bias"]


def leaky_relu(x: jnp.ndarray, slope: float = 0.1) -> jnp.ndarray:
    return jnp.where(x >= 0, x, slope * x)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1), padding="VALID")


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def _pref_dtype(x):
    """f32 accumulation, widened when inputs are f64 (x64 debugging mode)."""
    return jnp.float64 if x.dtype == jnp.float64 else jnp.float32
