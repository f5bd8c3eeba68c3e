"""Data pipeline + image IO."""
import os

import numpy as np

from ai_path_tracer_denoiser_tpu.data import (SequenceDataset, find_max,
                                              sequence_batches)
from ai_path_tracer_denoiser_tpu.utils import (save_png, save_png_scaled,
                                               save_hdr, read_png)
from ai_path_tracer_denoiser_tpu.utils.imageio import encode_png, _read_png_pure


def _make_npy_dataset(tmp_path, frames=10, h=64, w=64):
    inp = tmp_path / "input"
    gt = tmp_path / "gt"
    inp.mkdir()
    gt.mkdir()
    rng = np.random.default_rng(0)
    for f in range(frames):
        stem = f"0_0_0_{f}.npy"
        np.save(inp / stem, rng.normal(size=(h, w, 10)).astype(np.float32))
        np.save(gt / stem, rng.normal(size=(h, w, 3)).astype(np.float32))
    return str(inp), str(gt)


def test_dataset_windows_stay_inside_scene_groups(tmp_path):
    """Windows near a scene's end clamp within that scene — the reference's
    frame-number-as-global-position clamp (dataloader.py:48-49) would read
    into the next scene here."""
    inp = tmp_path / "input"
    gt = tmp_path / "gt"
    inp.mkdir()
    gt.mkdir()
    for s in range(2):
        for f in range(10):
            stem = f"{s:03d}_0_0_{f:04d}.npy"
            # encode (scene, frame) in the payload to verify window contents
            np.save(inp / stem, np.full((8, 8, 10), s * 100 + f, np.float32))
            np.save(gt / stem, np.full((8, 8, 3), s * 100 + f, np.float32))
    ds = SequenceDataset(str(inp), str(gt), sequence_length=7)
    # index 8 = scene 0 frame 8: window must clamp to scene-0 frames 3..9
    x, _ = ds[8]
    assert x[:, 0, 0, 0].tolist() == [3, 4, 5, 6, 7, 8, 9]
    # index 10 = scene 1 frame 0: window is scene-1 frames 0..6
    x, _ = ds[10]
    assert x[:, 0, 0, 0].tolist() == [100, 101, 102, 103, 104, 105, 106]
    # index 19 = scene 1 frame 9: clamps inside scene 1
    x, _ = ds[19]
    assert x[:, 0, 0, 0].tolist() == [103, 104, 105, 106, 107, 108, 109]


def test_find_max(tmp_path):
    d = tmp_path / "RGB"
    d.mkdir()
    for s in range(2):
        for f in range(5):
            (d / f"{s}_0_0_{f}.png").touch()
    m = find_max(str(d), 2, 1, 1)
    assert m[0, 0, 0] == 4 and m[1, 0, 0] == 4


def test_dataset_window_and_clamp(tmp_path):
    inp, gt = _make_npy_dataset(tmp_path, frames=10)
    m = np.zeros((1, 1, 1))
    m[0, 0, 0] = 9   # max frame index
    ds = SequenceDataset(inp, gt, m, sequence_length=7)
    x, y = ds[0]
    assert x.shape == (7, 64, 64, 10) and y.shape == (7, 64, 64, 3)
    # window starting near the end clamps (dataloader.py:48-49)
    x_end, _ = ds[9]
    x_clamped, _ = ds[3]
    np.testing.assert_array_equal(x_end, x_clamped)


def test_dataset_crop(tmp_path):
    inp, gt = _make_npy_dataset(tmp_path, frames=8)
    ds = SequenceDataset(inp, gt, None, crop=True, crop_size=32)
    x, y = ds[0]
    assert x.shape == (7, 32, 32, 10) and y.shape == (7, 32, 32, 3)


def test_sequence_batches(tmp_path):
    inp, gt = _make_npy_dataset(tmp_path, frames=8)
    ds = SequenceDataset(inp, gt, None)
    batches = list(sequence_batches(ds, batch_size=2, shuffle=False))
    assert len(batches) == 4
    x, y = batches[0]
    assert x.shape == (7, 2, 64, 64, 10) and y.shape == (7, 2, 64, 64, 3)


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    path = save_png(str(tmp_path / "x"), img)
    back = read_png(path)
    np.testing.assert_array_equal(img, back)
    # pure-python decoder agrees too
    np.testing.assert_array_equal(img, _read_png_pure(path))


def test_png_scaled(tmp_path):
    img = np.array([[[0.0, 0.5, 1.5]]], np.float32)  # clamps 1.5 -> 1.0
    path = save_png_scaled(str(tmp_path / "y"), img)
    back = read_png(path)
    assert back[0, 0].tolist() == [0, 127, 255]


def test_hdr_writer(tmp_path):
    img = np.array([[[0.5, 1.0, 2.0], [0.0, 0.0, 0.0]]], np.float32)
    path = save_hdr(str(tmp_path / "z"), img)
    data = open(path, "rb").read()
    assert data.startswith(b"#?RADIANCE")
    # decode the RGBE pixel back approximately
    header_end = data.index(b"+X 2\n") + 5
    rgbe = np.frombuffer(data[header_end:], np.uint8).reshape(1, 2, 4)
    e = rgbe[0, 0, 3].astype(np.int32) - 128
    rgb = rgbe[0, 0, :3].astype(np.float64) * (2.0 ** e) / 256.0
    np.testing.assert_allclose(rgb, [0.5, 1.0, 2.0], rtol=0.02)
    assert rgbe[0, 1].tolist() == [0, 0, 0, 0]


def test_sequence_batches_crops_deterministic_across_runs(tmp_path):
    """Crop choices are keyed on (seed, item), not on a shared generator:
    two fresh iterators with the same seed yield bit-identical batches even
    with the multi-threaded prefetch pool, and a different seed (fit()
    passes seed=epoch) reshuffles both the order and the crops."""
    inp, gt = _make_npy_dataset(tmp_path, frames=16)

    def run(seed):
        ds = SequenceDataset(inp, gt, None, crop=True, crop_size=16)
        return list(sequence_batches(ds, batch_size=2, seed=seed, workers=4))

    a = run(seed=1)
    b = run(seed=1)
    assert len(a) == len(b)
    for (xa, ya), (xb, yb) in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)
    c = run(seed=2)
    assert any(not np.array_equal(xa, xc) for (xa, _), (xc, _) in zip(a, c))


def test_psnr_ssim_metrics():
    """utils/metrics.py sanity: identity gives SSIM 1 / PSNR inf, noise
    degrades both monotonically, PSNR matches the closed form."""
    from ai_path_tracer_denoiser_tpu.utils import psnr, ssim
    rng = np.random.default_rng(0)
    img = np.clip(rng.normal(0.5, 0.2, (48, 48, 3)), 0, 1)
    assert ssim(img, img) == 1.0
    assert psnr(img, img) == float("inf")
    small = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1)
    big = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
    assert ssim(big, img) < ssim(small, img) < 1.0
    assert psnr(big, img) < psnr(small, img)
    mse = np.mean((small.astype(np.float64) - img) ** 2)
    np.testing.assert_allclose(psnr(small, img), 10 * np.log10(1.0 / mse),
                               rtol=1e-12)
    # batch axis averages frames
    stack = np.stack([img, small])
    val = ssim(stack, stack.copy())
    assert val == 1.0


def test_u8_quantized_frames_roundtrip_and_decode(tmp_path):
    """The uint8 storage regime (datagen quantize="u8" — the reference's
    8-bit PNG precision): encode/decode round-trips to within one
    quantization step on every channel group, and SequenceDataset decodes
    u8 npy files transparently with the same affines."""
    from ai_path_tracer_denoiser_tpu.data.datagen import (encode_u8_gt,
                                                          encode_u8_input)
    from ai_path_tracer_denoiser_tpu.data.dataset import (SequenceDataset,
                                                          decode_u8_gt,
                                                          decode_u8_input)

    rng = np.random.default_rng(0)
    x = np.empty((16, 16, 10), np.float32)
    x[..., 0:3] = rng.uniform(0, 1, (16, 16, 3))          # rgb
    n = rng.normal(size=(16, 16, 3)); n /= np.linalg.norm(n, axis=-1,
                                                          keepdims=True)
    x[..., 3:6] = n                                        # unit normals
    x[..., 6] = rng.uniform(0, 10, (16, 16))               # depth
    x[..., 7:10] = rng.uniform(0, 1, (16, 16, 3))          # albedo
    dec = decode_u8_input(encode_u8_input(x))
    assert np.abs(dec[..., 0:3] - x[..., 0:3]).max() <= 0.5 / 255 + 1e-6
    assert np.abs(dec[..., 3:6] - x[..., 3:6]).max() <= 1.0 / 255 + 1e-6
    assert np.abs(dec[..., 6] - x[..., 6]).max() <= 5.0 / 255 + 1e-6
    y = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    assert np.abs(decode_u8_gt(encode_u8_gt(y)) - y).max() <= 0.5 / 255 + 1e-6

    # dataset-transparent decode: u8 files come out float32 with the same
    # values the standalone decoder produces
    idir, gdir = tmp_path / "input", tmp_path / "gt"
    idir.mkdir(); gdir.mkdir()
    for frame in range(7):
        np.save(idir / f"0_0_0_{frame:04d}.npy", encode_u8_input(x))
        np.save(gdir / f"0_0_0_{frame:04d}.npy", encode_u8_gt(y))
    ds = SequenceDataset(str(idir), str(gdir))
    dx, dy = ds[0]
    assert dx.dtype == np.float32 and dy.dtype == np.float32
    np.testing.assert_array_equal(dx[0], dec)
    np.testing.assert_array_equal(dy[0], decode_u8_gt(encode_u8_gt(y)))


def test_datagen_seed_widening_reuses_gt(tmp_path, monkeypatch):
    """Widening the noise-seed axis on an existing corpus must reuse the
    per-frame ground truth (every seed shares one converged target) and
    skip already-rendered seed inputs — only the NEW seeds' 1-spp inputs
    render.  The datagen resume path that makes 3 -> 5 seed upgrades
    nearly free."""
    import dataclasses

    from ai_path_tracer_denoiser_tpu.data import datagen as dg
    from ai_path_tracer_denoiser_tpu.scene import load_scene
    from ai_path_tracer_denoiser_tpu.scene.camera import derive_camera

    scene = load_scene(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scenes", "cornell_box.txt"))
    cam = derive_camera((32, 32), 45.0, np.asarray(scene.camera.position),
                        np.asarray(scene.camera.look_at),
                        np.asarray(scene.camera.up))
    scene = dataclasses.replace(scene, camera=cam)

    real_render = dg.render
    calls = {"gt": 0, "input": 0}

    def counting_render(s, options, num_iterations, **kw):
        calls["gt" if num_iterations > 1 else "input"] += 1
        return real_render(s, options, num_iterations=num_iterations, **kw)

    monkeypatch.setattr(dg, "render", counting_render)
    out = str(tmp_path / "d")
    dg.generate_training_data([scene], out, frames_per_scene=2, gt_spp=2,
                              noise_seeds=1, movs=1, quantize="u8",
                              progress=False)
    assert calls == {"gt": 2, "input": 2}
    gt0 = (tmp_path / "d" / "gt" / "000_0_0_0000.npy").read_bytes()

    calls.update(gt=0, input=0)
    dg.generate_training_data([scene], out, frames_per_scene=2, gt_spp=2,
                              noise_seeds=3, movs=1, quantize="u8",
                              progress=False)
    # no GT re-renders; only the 2 frames x 2 NEW seeds of inputs
    assert calls == {"gt": 0, "input": 4}
    # seed-0 artifacts untouched; all seeds share one bit-identical GT
    assert (tmp_path / "d" / "gt" / "000_0_0_0000.npy").read_bytes() == gt0
    a = np.load(tmp_path / "d" / "gt" / "000_0_1_0000.npy")
    b = np.load(tmp_path / "d" / "gt" / "000_0_0_0000.npy")
    np.testing.assert_array_equal(a, b)
    # the new seeds' inputs differ (distinct RNG streams)
    i0 = np.load(tmp_path / "d" / "input" / "000_0_0_0000.npy")
    i1 = np.load(tmp_path / "d" / "input" / "000_0_1_0000.npy")
    assert not np.array_equal(i0, i1)


def test_datagen_extra_movs_have_distinct_trajectories(tmp_path):
    """movs > 2 (ADVICE r3): every pan must follow its OWN camera path —
    not duplicate pan 1's with a different RNG offset.  Checked via the
    depth channel (geometry-dependent, noise-free): frames at the same
    index from different movs must differ, and mov 0/1 keep their frozen
    r3-era formulas (resume compatibility)."""
    import dataclasses

    from ai_path_tracer_denoiser_tpu.data import datagen as dg
    from ai_path_tracer_denoiser_tpu.scene import load_scene
    from ai_path_tracer_denoiser_tpu.scene.camera import derive_camera

    scene = load_scene(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scenes", "cornell_box.txt"))
    cam = derive_camera((32, 32), 45.0, np.asarray(scene.camera.position),
                        np.asarray(scene.camera.look_at),
                        np.asarray(scene.camera.up))
    scene = dataclasses.replace(scene, camera=cam)
    out = str(tmp_path / "d")
    dg.generate_training_data([scene], out, frames_per_scene=2, gt_spp=1,
                              noise_seeds=1, movs=4, dphi=0.2,
                              progress=False)
    # frame 1 of each mov (frame 0 shares the start pose for movs 0/2)
    depth = {m: np.load(tmp_path / "d" / "input" / f"000_{m}_0_0001.npy")[..., 6]
             for m in range(4)}
    for a in range(4):
        for b in range(a + 1, 4):
            assert not np.allclose(depth[a], depth[b]), (a, b)


def test_datagen_variants_have_full_gbuffers(tmp_path):
    """REGRESSION (r3 corpus bug): every mov/noise variant frame must carry
    a real G-buffer and a real RGB average.  The old implementation bumped
    state.iteration for the RNG offset, which (a) gated out the
    iteration-1 normal/depth/albedo write and (b) divided the RGB average
    by the offset — 5/6 of the r3 training corpus was all-zero input."""
    import dataclasses

    from ai_path_tracer_denoiser_tpu.data import datagen as dg
    from ai_path_tracer_denoiser_tpu.scene import load_scene
    from ai_path_tracer_denoiser_tpu.scene.camera import derive_camera

    scene = load_scene(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scenes", "cornell_box.txt"))
    cam = derive_camera((32, 32), 45.0, np.asarray(scene.camera.position),
                        np.asarray(scene.camera.look_at),
                        np.asarray(scene.camera.up))
    scene = dataclasses.replace(scene, camera=cam)
    out = str(tmp_path / "d")
    dg.generate_training_data([scene], out, frames_per_scene=1, gt_spp=1,
                              noise_seeds=2, movs=2, progress=False)
    rgb = {}
    for m in range(2):
        for nz in range(2):
            x = np.load(tmp_path / "d" / "input" / f"000_{m}_{nz}_0000.npy")
            tag = f"mov{m}_noise{nz}"
            assert (x[..., 6] > 0).mean() > 0.5, f"{tag}: empty depth"
            assert np.abs(x[..., 3:6]).mean() > 0.1, f"{tag}: empty normals"
            assert x[..., 0:3].max() > 0.05, f"{tag}: black RGB"
            rgb[(m, nz)] = x[..., 0:3]
    # the noise axis really does vary the 1-spp sample stream
    assert not np.array_equal(rgb[(0, 0)], rgb[(0, 1)])
