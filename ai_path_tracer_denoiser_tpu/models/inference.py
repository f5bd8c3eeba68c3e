"""Inference-optimized denoiser path: BatchNorm folded into conv weights.

At inference BatchNorm is a per-channel affine map with *fixed* running
statistics (main.cpp:107-111 runs the TorchScript module in eval mode), so
every BN in the network can be absorbed into an adjacent convolution once,
offline.  The deployed network is then a pure conv+LeakyReLU graph:

  * 12 fewer elementwise normalization passes per frame,
  * activations stay bfloat16 end-to-end (f32 only inside the MXU
    accumulator and the conv bias/LReLU epilogue, which XLA fuses into the
    conv), halving activation HBM traffic vs the f32-normalized train graph.

Folding rules (exact in real arithmetic):

  conv -> BN   (backward fold):  BN(Wx+b) = (W*g)x + (b-m)*g + beta,
               g = gamma/sqrt(var+eps), applied per *output* channel.
               Padding-safe: the affine acts after the conv.

The reference's downsample-block quirk — LeakyReLU *precedes* bn2
(recurrent_autoencoder_model.py:31-32) — blocks the backward fold of bn2
into conv2, and a forward fold into conv3 would be wrong under SAME
zero-padding (the fold's constant shift is absent in the padded border
ring, and with 5 pooling levels that border error contaminates the whole
image).  bn2 therefore stays as an explicit per-channel affine (x*s + t),
which XLA fuses into the preceding conv's epilogue — zero extra HBM passes.

The recurrent hidden states carried between frames are bfloat16 in this
path; ``fold_batchnorm`` + ``apply_frame_fast`` reproduce
``apply_frame(train=False)`` to f32 rounding error (tests/test_inference.py).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelOptions
from .autoencoder import init_hidden
from .layers import leaky_relu, max_pool_2x2, upsample_nearest_2x


# ---------------------------------------------------------------------------
# Folding
# ---------------------------------------------------------------------------

def _fold_back(conv, bn, st, eps):
    """conv followed by BN -> single conv (per-output-channel rescale)."""
    g = bn["scale"] / jnp.sqrt(st["var"] + eps)
    return {"w": conv["w"] * g, "b": (conv["b"] - st["mean"]) * g + bn["bias"]}


def _affine(bn, st, eps):
    """Eval-mode BN as a bare per-channel affine: x*s + t."""
    s = bn["scale"] / jnp.sqrt(st["var"] + eps)
    return {"s": s, "t": bn["bias"] - st["mean"] * s}


def fold_batchnorm(params: Dict, bn_state: Dict,
                   options: Optional[ModelOptions] = None) -> Dict:
    """Absorb every BatchNorm into its neighbor conv. Returns conv-only params.

    Only valid for ``options.norm == "batch"`` (running statistics are data-
    independent); GroupNorm recomputes statistics per sample and cannot fold.
    """
    opts = options if options is not None else ModelOptions()
    if opts.norm != "batch":
        raise ValueError(f"cannot fold norm={opts.norm!r}; only BatchNorm's "
                         "fixed eval-mode statistics are foldable")
    eps = opts.bn_eps
    out = {}
    for i in range(1, 6):
        name = f"enc{i}"
        p, s = params[name], bn_state[name]
        # downsample block: lrelu sits between conv2 and bn2
        # (recurrent_autoencoder_model.py:31-32) -> bn2 survives as an
        # affine (see module docstring), bn1/bn3 fold backward.
        out[name] = {
            "conv1": _fold_back(p["conv1"], p["bn1"], s["bn1"], eps),
            "conv2": dict(p["conv2"]),
            "affine2": _affine(p["bn2"], s["bn2"], eps),
            "conv3": _fold_back(p["conv3"], p["bn3"], s["bn3"], eps),
        }
    p, s = params["bottleneck"], bn_state["bottleneck"]
    out["bottleneck"] = {
        f"conv{j}": _fold_back(p[f"conv{j}"], p[f"bn{j}"], s[f"bn{j}"], eps)
        for j in (1, 2, 3)}
    for i in range(1, 6):
        name = f"dec{i}"
        p, s = params[name], bn_state[name]
        out[name] = {
            f"conv{j}": _fold_back(p[f"conv{j}"], p[f"bn{j}"], s[f"bn{j}"], eps)
            for j in (1, 2)}
    return out


# ---------------------------------------------------------------------------
# Fast apply
# ---------------------------------------------------------------------------

def _conv3x3_mm(x, w):
    """3x3 SAME conv as 9 shifted matmuls — the MXU path.

    On this TPU toolchain `lax.conv_general_dilated` with NHWC and small
    channel counts lowers to *direct convolution on the VPU*: the whole
    denoiser plateaus at ~2.7 TFLOPS (the VPU's f32 peak) regardless of
    dtype or widths (tools/denoiser_breakdown.py).  Expressing each tap as
    a (H·W, Cin) @ (Cin, Cout) contraction routes the MACs onto the MXU:
    one zero-pad, then 9 static slices of the SAME padded buffer feeding
    `dot_general` accumulations in f32.
    """
    n, h, ww, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.slice(xp, (0, dy, dx, 0), (n, dy + h, dx + ww, c))
            part = jax.lax.dot_general(
                xs, w[dy, dx], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    return acc


def _conv3x3_im2row(x, w):
    """3x3 SAME conv as ONE (H·W, 9Cin) @ (9Cin, Cout) contraction.

    Trades one materialized 9x-wide shifted-concat buffer for a single
    dense MXU matmul with K=9·Cin (e.g. 576 for the 64->32 conv vs nine
    K=64 partial contractions in _conv3x3_mm).  Which wins is an HBM-vs-
    MXU tradeoff — measured per-toolchain (tools/hw_denoiser_impls.py).
    """
    n, h, ww, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [jax.lax.slice(xp, (0, dy, dx, 0), (n, dy + h, dx + ww, c))
            for dy in range(3) for dx in range(3)]
    big = jnp.concatenate(taps, axis=-1)                 # (N, H, W, 9C)
    wk = w.reshape(9 * c, w.shape[-1])                   # HWIO -> (9C, Co)
    return jax.lax.dot_general(big, wk, (((3,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _conv_act(conv, x, slope, compute_dtype, impl: str = "auto",
              affine=None):
    """conv3x3 SAME + bias + LeakyReLU [+ affine x*s+t], in ``compute_dtype``.

    ``impl``: "matmul" = 9-tap dot_general (MXU), "native" =
    lax.conv_general_dilated, "auto" = matmul on TPU backends, native
    elsewhere (CPU XLA's native conv is fine and keeps tests fast);
    "pallas" = the fused single-matmul-per-row kernel
    (models/conv_kernel.py) — EXPERIMENTAL: this toolchain requires
    rank-3 HBM DMA slices 128-aligned in the channel dim, so it cannot
    compile for the network's C<128 widths on real TPUs (interpret mode
    and future toolchains only; falls back per-shape otherwise).
    The contraction accumulates f32; bias add + LReLU (+ the folded-BN
    affine, when given) run f32 and fuse into the epilogue, so only the
    ``compute_dtype`` result is ever materialized in HBM.
    """
    if impl == "auto":
        # TPU: the CHW-packed fused Pallas kernel — full-net 832^2 latency
        # 5.9 ms vs 14.8 (matmul lowering) vs 17.2 (native conv), measured
        # r4 (tools/hw_denoiser_impls.py); per-shape fallback to matmul
        # inside.  CPU/tests: native conv.
        impl = "pallas2" if jax.default_backend() == "tpu" else "native"
    if impl == "pallas2":
        # CHW-packed fused Pallas kernel (models/conv_kernel.py v2):
        # W on 128-aligned lanes, C padded to 16 sublanes — the layout
        # this toolchain's DMA constraints actually allow.  Requires
        # H % 8 == 0; other shapes fall back to the matmul lowering.
        from .conv_kernel import conv3x3_act_chw
        n, h, _, _ = x.shape
        if n == 1 and h % 8 == 0:
            y = conv3x3_act_chw(x[0].astype(compute_dtype),
                                conv["w"], conv["b"], slope, affine=affine,
                                interpret=jax.default_backend() != "tpu")
            return y[None]
        impl = "matmul" if jax.default_backend() == "tpu" else "native"
    if impl == "pallas":
        from .conv_kernel import conv3x3_act, supported_height
        n, h, _, _ = x.shape
        if n == 1 and supported_height(h):
            y = conv3x3_act(x[0].astype(compute_dtype),
                            conv["w"], conv["b"], slope, affine=affine,
                            interpret=jax.default_backend() != "tpu")
            return y[None]
        impl = "matmul" if jax.default_backend() == "tpu" else "native"
    xc = x.astype(compute_dtype)
    wc = conv["w"].astype(compute_dtype)
    if impl == "matmul":
        y = _conv3x3_mm(xc, wc)
    elif impl == "im2row":
        y = _conv3x3_im2row(xc, wc)
    else:
        y = jax.lax.conv_general_dilated(
            xc, wc, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
    y = leaky_relu(y + conv["b"], slope)
    if affine is not None:
        y = y * affine["s"] + affine["t"]
    return y.astype(compute_dtype)


def apply_frame_fast(folded: Dict, x: jnp.ndarray, hidden: Dict,
                     options: Optional[ModelOptions] = None,
                     compute_dtype=jnp.bfloat16,
                     conv_impl: str = "auto"
                     ) -> Tuple[jnp.ndarray, Dict]:
    """One frame through the folded conv+LReLU network.

    Args:
      folded: output of ``fold_batchnorm``.
      x: (N, H, W, 10) G-buffer frame, H and W divisible by 32.
      hidden: dict from ``init_hidden`` (``compute_dtype`` tensors) or the
        previous frame's returned hidden.
    Returns:
      (denoised (N, H, W, 3) float32, new_hidden in ``compute_dtype``)
    """
    opts = options if options is not None else ModelOptions()
    slope = opts.leaky_slope
    _, h, w, _ = x.shape
    if h % 32 or w % 32:
        raise ValueError(f"input {h}x{w} must be divisible by 32")
    ca = lambda p_, y_, aff=None: _conv_act(p_, y_, slope, compute_dtype,
                                            conv_impl, affine=aff)
    new_hidden = {}
    skips = []
    y = x.astype(compute_dtype)
    for i in range(1, 6):
        p = folded[f"enc{i}"]
        out1 = ca(p["conv1"], y)
        hcat = jnp.concatenate(
            [out1, hidden[f"enc{i}"].astype(compute_dtype)], axis=-1)
        # bn2's surviving affine fuses into conv2's epilogue
        out2 = ca(p["conv2"], hcat, aff=p["affine2"])
        out3 = ca(p["conv3"], out2)
        new_hidden[f"enc{i}"] = out3
        y = max_pool_2x2(out3)
        skips.append(y)

    p = folded["bottleneck"]
    out1 = ca(p["conv1"], y)
    hcat = jnp.concatenate(
        [out1, hidden["bottleneck"].astype(compute_dtype)], axis=-1)
    out2 = ca(p["conv2"], hcat)
    y = ca(p["conv3"], out2)
    new_hidden["bottleneck"] = y

    for i in range(5, 0, -1):
        p = folded[f"dec{i}"]
        y = jnp.concatenate([y, skips[i - 1]], axis=-1)
        y = upsample_nearest_2x(y)
        y = ca(p["conv1"], y)
        y = ca(p["conv2"], y)
    return y.astype(jnp.float32), new_hidden


def padded_resolution(h: int, w: int, multiple: int = 32) -> Tuple[int, int]:
    """Smallest (H, W) >= (h, w) divisible by ``multiple`` (5 pool stages)."""
    up = lambda v: -(-v // multiple) * multiple
    return up(h), up(w)


def apply_frame_fast_padded(folded: Dict, x: jnp.ndarray, hidden: Dict,
                            options: Optional[ModelOptions] = None,
                            compute_dtype=jnp.bfloat16,
                            conv_impl: str = "auto"
                            ) -> Tuple[jnp.ndarray, Dict]:
    """``apply_frame_fast`` for resolutions NOT divisible by 32 (e.g. the
    BASELINE north-star 1920x1080: H pads 1080 -> 1088).

    The frame is edge-replicate padded on the bottom/right up to the next
    multiple of 32, denoised, and the output cropped back to (h, w).
    Edge padding (not zeros) keeps the border statistics in-distribution so
    the crop boundary stays artifact-free.  ``hidden`` must be built at the
    PADDED resolution (``init_hidden(*padded_resolution(h, w))``) — the
    returned hidden is padded-resolution too, so streaming frames through
    this wrapper carries it transparently.
    """
    _, h, w, _ = x.shape
    hp, wp = padded_resolution(h, w)
    if (hp, wp) != (h, w):
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)),
                    mode="edge")
    y, hidden = apply_frame_fast(folded, x, hidden, options, compute_dtype,
                                 conv_impl)
    return y[:, :h, :w, :], hidden


def apply_sequence_fast(folded: Dict, x_seq: jnp.ndarray,
                        options: Optional[ModelOptions] = None,
                        compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Scan ``apply_frame_fast`` over a (T, N, H, W, 10) sequence."""
    t, n, h, w, _ = x_seq.shape
    widths = tuple(folded[f"enc{i}"]["conv1"]["w"].shape[-1]
                   for i in range(1, 6))
    base = options if options is not None else ModelOptions()
    opts = dataclasses.replace(base, widths=widths)
    hidden0 = init_hidden(n, h, w, opts, dtype=compute_dtype)

    def step(hidden, x):
        y, hidden = apply_frame_fast(folded, x, hidden, opts, compute_dtype)
        return hidden, y

    _, ys = jax.lax.scan(step, hidden0, x_seq)
    return ys


def prepare_inference(params: Dict, bn_state: Dict,
                      options: Optional[ModelOptions] = None,
                      compute_dtype=jnp.bfloat16,
                      pad_multiple: int = 0) -> Dict:
    """Fold BN and pre-cast conv weights to the compute dtype (biases stay
    f32 for the fused f32 epilogue). One-time cost at model load.
    ``pad_multiple`` > 0 additionally zero-pads channel dims (see
    ``pad_channels``)."""
    folded = fold_batchnorm(params, bn_state, options)
    if pad_multiple:
        folded = pad_channels(folded, pad_multiple)
    return jax.tree_util.tree_map_with_path(
        lambda path, a: a.astype(compute_dtype)
        if path[-1].key == "w" else a, folded)


# ---------------------------------------------------------------------------
# Channel padding (layout lever: round odd widths up for the MXU/VPU lanes)
# ---------------------------------------------------------------------------

def _pad_conv(conv, segments, in_total: int, out_p: int, out_keep: int):
    """Re-pack a conv for padded channel layouts.

    ``segments``: [(src_lo, src_hi, dst_lo), ...] placement of the original
    input-channel rows inside the padded input; all other rows are zero.
    Output channels grow to ``out_p`` (extra channels: w=0, b=0, so they
    produce exact zeros through LReLU and contribute nothing downstream).
    """
    w = conv["w"]
    k0, k1, _, c_out = w.shape
    nw = jnp.zeros((k0, k1, in_total, out_p), w.dtype)
    for lo, hi, dst in segments:
        nw = nw.at[:, :, dst:dst + (hi - lo), :c_out].set(w[:, :, lo:hi, :])
    nb = jnp.zeros((out_p,), conv["b"].dtype).at[:out_keep].set(
        conv["b"][:out_keep])
    return {"w": nw, "b": nb}


def pad_channels(folded: Dict, multiple: int) -> Dict:
    """Zero-pad every internal channel dim of a folded network up to a
    multiple of ``multiple`` — numerically exact (padded lanes carry exact
    zeros: zero weights + zero bias + LReLU(0)=0 + affine pads s=1, t=0).

    The network input (10 channels) and output (3) keep their true widths.
    Odd reference widths (43/57/76/101) map poorly onto the TPU's lane
    tiling; this trades redundant MACs for aligned layouts — measure with
    tools/profile_denoiser.py before shipping a given multiple.
    """
    def up(c):
        return -(-c // multiple) * multiple

    widths = [folded[f"enc{i}"]["conv1"]["w"].shape[-1] for i in range(1, 6)]
    wp = [up(c) for c in widths]
    out = {}
    prev_p = folded["enc1"]["conv1"]["w"].shape[2]     # network input: 10
    for i in range(1, 6):
        p = folded[f"enc{i}"]
        c, c_p = widths[i - 1], wp[i - 1]
        aff = p["affine2"]
        out[f"enc{i}"] = {
            "conv1": _pad_conv(p["conv1"], [(0, p["conv1"]["w"].shape[2], 0)],
                               prev_p, c_p, c),
            "conv2": _pad_conv(p["conv2"], [(0, c, 0), (c, 2 * c, c_p)],
                               2 * c_p, c_p, c),
            "affine2": {
                "s": jnp.ones((c_p,), aff["s"].dtype).at[:c].set(aff["s"]),
                "t": jnp.zeros((c_p,), aff["t"].dtype).at[:c].set(aff["t"]),
            },
            "conv3": _pad_conv(p["conv3"], [(0, c, 0)], c_p, c_p, c),
        }
        prev_p = c_p
    c, c_p = widths[4], wp[4]
    p = folded["bottleneck"]
    out["bottleneck"] = {
        "conv1": _pad_conv(p["conv1"], [(0, c, 0)], c_p, c_p, c),
        "conv2": _pad_conv(p["conv2"], [(0, c, 0), (c, 2 * c, c_p)],
                           2 * c_p, c_p, c),
        "conv3": _pad_conv(p["conv3"], [(0, c, 0)], c_p, c_p, c),
    }
    dec_in = widths[::-1]                       # 101, 76, 57, 43, 32
    dec_in_p = wp[::-1]
    dec_out = widths[:4][::-1] + [folded["dec1"]["conv2"]["w"].shape[-1]]
    dec_out_p = wp[:4][::-1] + [dec_out[4]]     # final 3 stays exact
    for j, i in enumerate(range(5, 0, -1)):
        p = folded[f"dec{i}"]
        ci, ci_p = dec_in[j], dec_in_p[j]
        co, co_p = dec_out[j], dec_out_p[j]
        out[f"dec{i}"] = {
            "conv1": _pad_conv(p["conv1"], [(0, ci, 0), (ci, 2 * ci, ci_p)],
                               2 * ci_p, co_p, co),
            "conv2": _pad_conv(p["conv2"], [(0, co, 0)], co_p, co_p, co),
        }
    return out
