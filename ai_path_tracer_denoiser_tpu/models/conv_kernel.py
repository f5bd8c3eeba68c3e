"""Fused Pallas 3x3 conv (+bias +LeakyReLU +optional affine) for the
denoiser's full-resolution layers.

Why (tools/denoiser_breakdown.py, committed in BENCH notes): at 832^2 the
XLA-native conv runs at 5-9 TFLOPS for the U-Net's C=10..64 channel counts
(the MXU is fed K=N<=64 contractions), and the network's real compute
concentrates in the two full-res levels (enc1 + dec1 ~ 10 of ~13 ms).
This kernel restructures each 3x3 conv so the MXU sees one big, dense
contraction per output row with zero wasted MACs:

  * the 3 dy-taps ride the CONTRACTION dim: per output row y, the operand
    B = [rows y, y+1, y+2 of the padded input] concatenated channel-wise
    -> (W+2, 3C);
  * the 3 dx-taps ride the OUTPUT dim: weights are packed block-wise as
    Wall[dy*C + c, dx*Co + o] = w[dy, dx, c, o] -> (3C, 3Co), so ONE
    matmul Z = B @ Wall (f32 accumulate) evaluates all 9 taps;
  * the dx alignment is a VPU epilogue: out[y, x, o] =
    sum_dx Z[x + dx, dx-block o] — three static slices added together,
    then bias + LeakyReLU (+ the folded-BN affine) fused before the
    bfloat16 store.

MAC count is exactly the conv's (the dx shift is postponed, not padded
into the matmul), while the MXU shapes become M=W+2 (~834), K=3C,
N=3Co — e.g. K=192, N=96 for the 64->32 conv vs K=64, N=32 natively.

The input arrives PRE-PADDED (H+2, W+2, C) — produced by
``conv_input_pad`` (or directly by the previous conv's padded store) —
and stays in HBM (explicitly pinned: lesson from render/mesh_kernel.py —
pl.ANY lets small arrays land in VMEM where manual async-copies fault);
each grid program DMAs its TH+2-row halo band into VMEM.  Output rows are
written through a normal blocked VMEM spec.

Used by models/inference.py (conv_impl="pallas") for levels whose height
is divisible by TH; everything else keeps the XLA path.  Results match
the 9-tap dot_general lowering to f32-accumulation rounding (allclose,
tests/test_conv_kernel.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8                   # output rows per grid program


def pack_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, Co) conv weights -> (3C, 3Co) block layout.

    Wall[dy*C + c, dx*Co + o] = w[dy, dx, c, o].
    """
    _, _, c, co = w.shape
    return jnp.transpose(w, (0, 2, 1, 3)).reshape(3 * c, 3 * co)


def conv_input_pad(x: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> zero-padded (H+2, Wp, C) (SAME halo).

    The width dim is padded up to a multiple of 8: it is the sublane-
    tiled dim of the rank-3 HBM array, and Mosaic requires DMA slice
    shapes 8-aligned there ("Slice shape along dimension 1 must be
    aligned to tiling (8)").  The extra zero columns sit past x+dx = W+1
    and never reach an output.
    """
    w2 = x.shape[1] + 2
    wp = -(-w2 // 8) * 8
    return jnp.pad(x, ((1, 1), (1, wp - w2 + 1), (0, 0)))


def _build_kernel(th: int, w_pix: int, c_in: int, c_out: int,
                  slope: float, out_dtype):
    def kernel(xp_ref, wall_ref, b_ref, s_ref, t_ref, out_ref, buf, sem):
        i = pl.program_id(0)
        # halo band: output rows [i*th, i*th+th) need padded rows
        # [i*th, i*th+th+2)
        dma = pltpu.make_async_copy(
            xp_ref.at[pl.ds(i * th, th + 2), :, :], buf, sem)
        dma.start()
        dma.wait()
        wall = wall_ref[:]                       # (3C, 3Co)
        bias = b_ref[:]                          # (1, Co) f32
        aff_s = s_ref[:]
        aff_t = t_ref[:]

        def row(y, _):
            # B: 3 consecutive padded rows, channel-concatenated -> the
            # contraction operand for all 9 taps at once.
            b_op = jnp.concatenate(
                [buf[y, :, :], buf[y + 1, :, :], buf[y + 2, :, :]], axis=-1)
            z = jnp.dot(b_op, wall, preferred_element_type=jnp.float32)
            # dx alignment: out[x, o] = sum_dx Z[x+dx, dx*Co+o]
            acc = (z[0:w_pix, 0:c_out]
                   + z[1:w_pix + 1, c_out:2 * c_out]
                   + z[2:w_pix + 2, 2 * c_out:3 * c_out])
            acc = acc + bias
            acc = jnp.where(acc >= 0.0, acc, acc * slope)
            acc = acc * aff_s + aff_t
            out_ref[pl.ds(y, 1), :, :] = acc.astype(out_dtype)[None]
            return 0

        jax.lax.fori_loop(0, th, row, 0, unroll=True)

    return kernel


@functools.partial(jax.jit, static_argnames=("w_pix", "slope", "interpret"))
def _conv3x3_call(xp, wall, bias, aff_s, aff_t, w_pix, slope, interpret):
    hp, wp2, c = xp.shape
    h = hp - 2
    assert wp2 % 8 == 0 and wp2 >= w_pix + 2, (wp2, w_pix)
    co = wall.shape[1] // 3
    assert h % TH == 0, (h, TH)
    out_dtype = xp.dtype
    kernel = _build_kernel(TH, w_pix, c, co, slope, out_dtype)
    return pl.pallas_call(
        kernel,
        grid=(h // TH,),
        in_specs=[
            # pre-padded input stays in HBM; the kernel DMAs halo bands
            pl.BlockSpec(memory_space=pltpu.ANY if not hasattr(pltpu, "HBM")
                         else pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TH, w_pix, co), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w_pix, co), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, wp2, c), out_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, wall, bias, aff_s, aff_t)


def conv3x3_act(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                slope: float,
                affine: Optional[dict] = None,
                interpret: Optional[bool] = None,
                pre_padded: bool = False,
                width: Optional[int] = None) -> jnp.ndarray:
    """Fused SAME conv3x3 + bias + LeakyReLU(slope) [+ affine x*s+t].

    Args:
      x: (H, W, C) activation — or the ``conv_input_pad`` layout
        (H+2, Wp, C) when ``pre_padded`` (then ``width`` = logical W).
      w: (3, 3, C, Co) weights (any float dtype; used as x.dtype).
      b: (Co,) f32 bias.
      affine: optional {"s": (Co,), "t": (Co,)} applied AFTER the LReLU
        (the folded-BN bn2 affine of models/inference.py).
    Returns (H, W, Co) in x.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if pre_padded:
        assert width is not None
        xp, w_pix = x, width
    else:
        xp, w_pix = conv_input_pad(x), x.shape[1]
    co = w.shape[-1]
    wall = pack_weights(w).astype(x.dtype)
    bias = jnp.asarray(b, jnp.float32).reshape(1, co)
    if affine is not None:
        aff_s = jnp.asarray(affine["s"], jnp.float32).reshape(1, co)
        aff_t = jnp.asarray(affine["t"], jnp.float32).reshape(1, co)
    else:
        aff_s = jnp.ones((1, co), jnp.float32)
        aff_t = jnp.zeros((1, co), jnp.float32)
    return _conv3x3_call(xp, wall, bias, aff_s, aff_t, w_pix, float(slope),
                         interpret)


def supported_height(h: int) -> bool:
    return h % TH == 0


# ---------------------------------------------------------------------------
# v2: channel-on-sublane / width-on-lane layout ("CHW-packed")
# ---------------------------------------------------------------------------
#
# The layout above (W on sublanes, C on lanes) cannot DMA on this
# toolchain: C < 128 makes the rank-3 slice's minor dim misaligned.  This
# variant flips the packing to (H+2, Cp, Wp):
#
#   * Wp = W padded to a 128 multiple -> the DMA'd slice's MINOR dim is
#     lane-aligned;
#   * Cp = C padded to a 16 multiple -> the sublane dim is bf16-tile
#     aligned;
#   * H is the untiled major dim -> halo-band DMA offsets are free.
#
# Per output row y: B = packed rows [y, y+3) reshaped (3Cp, Wp); one MXU
# contraction Z = A @ B with A[dx*Co+o, dy*Cp+c] = w[dy, dx, c, o] gives
# all 9 taps; the dx alignment is two +-1 LANE ROTATES (tpu.rotate — the
# one lane-shift primitive Mosaic does lower) whose wrapped-in columns
# are exactly zero by the packing invariant (data cols [0, W); cols
# [W, Wp) zero; matmul of zeros stays zero), plus a lane-iota mask that
# re-establishes the invariant for the columns the rotate dirtied.
# Bias / LeakyReLU / folded-BN affine ride per-channel on sublanes.

TH2 = 8                 # output rows per grid program (v2 kernel)


def pack_chw(x: jnp.ndarray, c_pad: Optional[int] = None) -> jnp.ndarray:
    """(H, W, C) -> zero-padded (H+2, Cp, Wp) bf16-tile-aligned packing.

    Data lives at rows [1, H+1), channels [0, C), cols [0, W); everything
    else is zero (the SAME-conv halo + alignment padding).
    """
    h, w, c = x.shape
    cp = c_pad if c_pad is not None else -(-c // 16) * 16
    # at least ONE zero column past W: the dx lane-rotates wrap columns
    # Wp-1 / W into the output edges and must wrap in zeros
    wp = -(-(w + 1) // 128) * 128
    y = jnp.transpose(x, (0, 2, 1))                    # (H, C, W)
    return jnp.pad(y, ((1, 1), (0, cp - c), (0, wp - w)))


def unpack_chw(y: jnp.ndarray, w_pix: int, c: int) -> jnp.ndarray:
    """(H, Cp, Wp) kernel output -> (H, W, C)."""
    return jnp.transpose(y[:, :c, :w_pix], (0, 2, 1))


def pack_weights_chw(w: jnp.ndarray, cp: int, cop: int) -> jnp.ndarray:
    """(3, 3, C, Co) -> A (3*cop, 3*cp): A[dx*cop+o, dy*cp+c]."""
    _, _, c, co = w.shape
    a = jnp.zeros((3, cop, 3, cp), w.dtype)
    a = a.at[:, :co, :, :c].set(jnp.transpose(w, (1, 3, 0, 2)))
    return a.reshape(3 * cop, 3 * cp)


def _build_kernel_chw(th: int, cp: int, cop: int, w_pix: int, slope: float,
                      out_dtype):
    def kernel(xp_ref, wall_ref, b_ref, s_ref, t_ref, out_ref, buf, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            xp_ref.at[pl.ds(i * th, th + 2), :, :], buf, sem)
        dma.start()
        dma.wait()
        wall = wall_ref[:]                       # (3Cop, 3Cp)
        bias = b_ref[:]                          # (Cop, 1) f32
        aff_s = s_ref[:]
        aff_t = t_ref[:]
        wp = buf.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (cop, wp), 1)
        mask = lane < w_pix

        for y in range(th):
            b_op = buf[y:y + 3, :, :].reshape(3 * cp, wp)
            z = jnp.dot(wall, b_op, preferred_element_type=jnp.float32)
            # dx alignment: out[o, x] = Z0[o, x-1] + Z1[o, x] + Z2[o, x+1]
            # pltpu.roll wants non-negative shifts: -1 == wp - 1
            acc = (pltpu.roll(z[0:cop, :], 1, 1)
                   + z[cop:2 * cop, :]
                   + pltpu.roll(z[2 * cop:3 * cop, :], wp - 1, 1))
            acc = acc + bias
            acc = jnp.where(acc >= 0.0, acc, acc * slope)
            acc = acc * aff_s + aff_t
            acc = jnp.where(mask, acc, 0.0)
            out_ref[y, :, :] = acc.astype(out_dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("w_pix", "slope", "interpret",
                                    "out_dtype_name"))
def _conv3x3_chw_call(xp, wall, bias, aff_s, aff_t, w_pix, slope,
                      interpret, out_dtype_name=None):
    hp, cp, wp = xp.shape
    h = hp - 2
    cop = wall.shape[0] // 3
    assert h % TH2 == 0, (h, TH2)
    # out_dtype_name: keep the f32 accumulator at kernel output (the
    # training path adds an f32 bias AFTER the kernel; rounding the
    # accumulator to bf16 first diverged from the matmul path — r4
    # advisor finding)
    out_dtype = xp.dtype if out_dtype_name is None \
        else jnp.dtype(out_dtype_name)
    kernel = _build_kernel_chw(TH2, cp, cop, w_pix, float(slope), out_dtype)
    return pl.pallas_call(
        kernel,
        grid=(h // TH2,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if not hasattr(pltpu, "HBM")
                         else pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TH2, cop, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, cop, wp), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((TH2 + 2, cp, wp), xp.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, wall, bias, aff_s, aff_t)


def conv3x3_act_chw(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                    slope: float,
                    affine: Optional[dict] = None,
                    interpret: Optional[bool] = None,
                    out_dtype: Optional[str] = None) -> jnp.ndarray:
    """Fused SAME conv3x3 + bias + LReLU [+ affine] via the CHW-packed
    kernel.  x: (H, W, C) -> (H, W, Co), H % 8 == 0."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w_pix, c = x.shape
    co = w.shape[-1]
    cp = -(-c // 16) * 16
    cop = -(-co // 16) * 16
    xp = pack_chw(x, cp)
    wall = pack_weights_chw(w, cp, cop).astype(x.dtype)
    bias = jnp.zeros((cop, 1), jnp.float32).at[:co, 0].set(
        jnp.asarray(b, jnp.float32))
    if affine is not None:
        aff_s = jnp.ones((cop, 1), jnp.float32).at[:co, 0].set(
            jnp.asarray(affine["s"], jnp.float32))
        aff_t = jnp.zeros((cop, 1), jnp.float32).at[:co, 0].set(
            jnp.asarray(affine["t"], jnp.float32))
    else:
        aff_s = jnp.ones((cop, 1), jnp.float32)
        aff_t = jnp.zeros((cop, 1), jnp.float32)
    y = _conv3x3_chw_call(xp, wall, bias, aff_s, aff_t, w_pix, float(slope),
                          interpret, out_dtype)
    return unpack_chw(y, w_pix, co)
