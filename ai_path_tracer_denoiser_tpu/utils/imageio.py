"""Image IO: PNG and Radiance HDR writers + PNG reader.

Equivalent of image.cpp:22-83 (stb-backed savePNG / savePNG_scaled /
saveHDR).  The PNG encoder is self-contained (stdlib zlib); a native C++
encoder (native/src/aptd_native.cpp) is used instead when built.  Reading
prefers the native decoder, then PIL, then a minimal pure-Python fallback
for non-interlaced RGB/RGBA.
"""
from __future__ import annotations

import struct
import zlib
from typing import Optional

import numpy as np


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(rgb: np.ndarray) -> bytes:
    """uint8 (H, W, 3|4|1) -> PNG bytes."""
    rgb = np.asarray(rgb)
    assert rgb.dtype == np.uint8 and rgb.ndim == 3
    h, w, c = rgb.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    header = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    return (b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", header)
            + _png_chunk(b"IDAT", zlib.compress(raw, 6))
            + _png_chunk(b"IEND", b""))


def save_png(path: str, pixels: np.ndarray):
    """Raw-cast save (image::savePNG, image.cpp:22-39): values taken as-is,
    cast to uint8 with wrapping semantics replaced by clipping."""
    arr = np.clip(np.asarray(pixels), 0, 255).astype(np.uint8)
    if not path.endswith(".png"):
        path = path + ".png"
    try:
        from . import native
        if native.available():
            native.write_png(path, arr)
            return path
    except Exception:
        pass
    with open(path, "wb") as f:
        f.write(encode_png(arr))
    return path


def save_png_scaled(path: str, pixels: np.ndarray):
    """clamp [0,1] then x255 (image::savePNG_scaled, image.cpp:41-58)."""
    arr = (np.clip(np.asarray(pixels, np.float32), 0.0, 1.0) * 255.0).astype(np.uint8)
    return save_png(path, arr)


def save_hdr(path: str, pixels: np.ndarray):
    """Radiance RGBE .hdr writer (image::saveHDR, image.cpp:60-64), flat
    (uncompressed) scanlines."""
    img = np.asarray(pixels, np.float32)
    h, w, _ = img.shape
    if not path.endswith(".hdr"):
        path = path + ".hdr"
    maxc = img.max(axis=-1)
    exp = np.zeros((h, w), np.int32)
    mant = np.zeros((h, w), np.float64)
    nz = maxc > 1e-32
    mant[nz], exp[nz] = np.frexp(maxc[nz])
    scale = np.where(nz, mant * 256.0 / np.maximum(maxc, 1e-32), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(nz, exp + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())
    return path


def read_png(path: str) -> np.ndarray:
    """PNG -> uint8 (H, W, C)."""
    try:
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"))
    except ImportError:
        pass
    return _read_png_pure(path)


def _read_png_pure(path: str) -> np.ndarray:
    """Minimal decoder: 8-bit, non-interlaced, RGB/RGBA/gray."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    idat = b""
    w = h = bit_depth = color_type = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload)
            assert bit_depth == 8 and interlace == 0
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(idat)
    stride = w * channels
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)], np.uint8
        ).astype(np.int32)
        cur = np.zeros(stride, np.int32)
        for i in range(stride):
            a = cur[i - channels] if i >= channels else 0
            b = prev[i]
            cc = prev[i - channels] if i >= channels else 0
            if ftype == 0:
                cur[i] = line[i]
            elif ftype == 1:
                cur[i] = line[i] + a
            elif ftype == 2:
                cur[i] = line[i] + b
            elif ftype == 3:
                cur[i] = line[i] + (a + b) // 2
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                cur[i] = line[i] + pred
        cur &= 0xFF
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, channels)
