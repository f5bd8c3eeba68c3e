"""Native C++ library (OBJ parser + PNG encoder) vs Python fallbacks."""
import os

import numpy as np
import pytest

from ai_path_tracer_denoiser_tpu.utils import native
from ai_path_tracer_denoiser_tpu.scene.obj_loader import parse_obj_text
from ai_path_tracer_denoiser_tpu.scene.structs import build_transformation_matrix
from ai_path_tracer_denoiser_tpu.utils.imageio import read_png

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")

OBJ = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
f 1//1 2//1 3//1
f 1//1 3//1 4//1
f 1 2 4
"""


def test_obj_matches_python(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text(OBJ)
    v_n, n_n = native.load_obj(str(p))
    v_p, n_p = parse_obj_text(OBJ)
    np.testing.assert_allclose(v_n, v_p, atol=1e-6)
    np.testing.assert_allclose(n_n, n_p, atol=1e-6)


def test_obj_transform(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text(OBJ)
    m = build_transformation_matrix((1, 2, 3), (0, 0, 90), (2, 2, 2))
    v_n, n_n = native.load_obj(str(p), m)
    v_p, n_p = parse_obj_text(OBJ, m)
    np.testing.assert_allclose(v_n, v_p, atol=1e-5)
    np.testing.assert_allclose(n_n, n_p, atol=1e-6)


def test_obj_recompute_normals(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text(OBJ)
    v_n, n_n = native.load_obj(str(p), recompute_normals=True)
    v_p, n_p = parse_obj_text(OBJ, recompute_normals=True)
    np.testing.assert_allclose(n_n, n_p, atol=1e-6)


def test_obj_missing_file():
    with pytest.raises(FileNotFoundError):
        native.load_obj("/nonexistent/file.obj")


def test_png_write_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    for c in (1, 3, 4):
        img = rng.integers(0, 256, (17, 23, c), dtype=np.uint8)
        path = str(tmp_path / f"img{c}.png")
        native.write_png(path, img)
        back = read_png(path)
        if c == 1:
            back = back[..., :1] if back.ndim == 3 else back[..., None]
        if c == 4:
            # read_png converts to RGB; compare the RGB planes
            np.testing.assert_array_equal(img[..., :3], back[..., :3])
        else:
            np.testing.assert_array_equal(img, back[..., :c])
