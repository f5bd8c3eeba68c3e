"""Loss terms vs closed-form values and a torch-built oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from ai_path_tracer_denoiser_tpu.train.loss import (
    l1_norm, gaussian_kernel, log_filter, hfen, temporal_diff, sequence_loss,
    FRAME_RAMP)


def test_l1():
    a = jnp.ones((2, 4, 4, 3))
    b = jnp.zeros((2, 4, 4, 3))
    assert float(l1_norm(a, b)) == 1.0


def test_gaussian_kernel_normalized():
    g = np.asarray(gaussian_kernel(5, 1.5))
    assert g.shape == (5, 5)
    np.testing.assert_allclose(g.sum(), 1.0, atol=1e-6)
    assert g[2, 2] == g.max()
    np.testing.assert_allclose(g, g.T, atol=1e-7)  # symmetric


def test_log_filter_channel_sum():
    # constant image -> zero Laplacian
    x = jnp.ones((1, 8, 8, 3))
    y = np.asarray(log_filter(x))
    assert y.shape == (1, 8, 8, 1)
    np.testing.assert_allclose(y[0, 2:-2, 2:-2, 0], 0.0, atol=1e-6)
    # single-pixel impulse in one channel -> -4 at center, +1 at neighbors
    x = jnp.zeros((1, 8, 8, 3)).at[0, 4, 4, 1].set(1.0)
    y = np.asarray(log_filter(x))[0, :, :, 0]
    assert y[4, 4] == -4.0 and y[4, 5] == 1.0 and y[3, 4] == 1.0


def test_temporal_diff():
    seq = jnp.arange(4, dtype=jnp.float32).reshape(4, 1, 1, 1, 1)
    d = np.asarray(temporal_diff(seq)).ravel()
    np.testing.assert_allclose(d, [0, 1, 1, 1])


def test_hfen_zero_for_identical():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 3)),
                    jnp.float32)
    assert float(hfen(x, x)) < 1e-6
    y = x + 0.5 * jnp.asarray(np.random.default_rng(1).normal(size=(1, 32, 32, 3)),
                              jnp.float32)
    assert float(hfen(x, y)) > 1e-4


def test_hfen_matches_torch_oracle():
    """Rebuild the reference HFEN pipeline in torch (CPU) and compare."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    import math

    rng = np.random.default_rng(42)
    out_np = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    tgt_np = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)

    # --- torch oracle, mirroring loss.py:16-79 semantics ---
    def torch_gaussian(ks, sigma, ch):
        coords = torch.arange(ks).float()
        xg = coords.repeat(ks).view(ks, ks)
        yg = xg.t()
        mean = (ks - 1) / 2.0
        var = sigma ** 2
        g = (1.0 / (2 * math.pi * var)) * torch.exp(
            -((xg - mean) ** 2 + (yg - mean) ** 2) / (2 * var))
        g = g / g.sum()
        return g.view(1, 1, ks, ks).repeat(ch, 1, 1, 1)

    def torch_log(img):
        w = torch.tensor([[0., 1, 0], [1, -4, 1], [0, 1, 0]]).view(1, 1, 3, 3)
        w = w.repeat(img.shape[0], img.shape[1], 1, 1)
        return F.conv2d(img, w, padding=1)

    def torch_hfen(o, t):
        gk = torch_gaussian(5, 1.5, 3)
        go = F.conv2d(o, gk, groups=3)     # padding 0, like nn.Conv2d default
        gt = F.conv2d(t, gk, groups=3)
        go, gt = torch_log(go), torch_log(gt)
        if gt.max() != 0:
            gt = gt / gt.max()
        if go.max() != 0:
            go = go / go.max()
        return F.l1_loss(gt, go)

    oracle = float(torch_hfen(torch.from_numpy(out_np), torch.from_numpy(tgt_np)))
    ours = float(hfen(jnp.asarray(out_np.transpose(0, 2, 3, 1)),
                      jnp.asarray(tgt_np.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_sequence_loss_weights():
    t = 7
    outputs = jnp.zeros((t, 1, 16, 16, 3))
    targets = jnp.ones((t, 1, 16, 16, 3))
    total, comps = sequence_loss(outputs, targets)
    # ls_j = 1 for every frame; lt: frame diffs of targets are 0, outputs 0
    # -> lt = 0. lg is nonzero even on constant images (zero-padding border
    # response of the LoG, same as the reference's F.conv2d padding=1) and
    # identical across frames.
    np.testing.assert_allclose(float(comps["l1"]), 7.0, atol=1e-6)
    np.testing.assert_allclose(float(comps["temporal"]), 0.0, atol=1e-6)
    lg_per_frame = float(comps["hfen"]) / 7.0
    expect = (sum(0.8 + r for r in FRAME_RAMP)
              + sum(0.1 + r for r in FRAME_RAMP) * lg_per_frame)
    np.testing.assert_allclose(float(total), expect, rtol=1e-5)
