"""Frame output: npy and PNG.

Two PNG encoders: a native C++ one (volq/native/fastpng.cc, built by
volq/native/build.sh, loaded via ctypes) for interactive-rate frame
dumping, and a portable stdlib fallback. `save_png` picks automatically.
"""
from __future__ import annotations

import ctypes
import os
import struct
import zlib

import numpy as np

_fastpng = None


def _load_fastpng():
    global _fastpng
    if _fastpng is not None:
        return _fastpng
    path = os.path.join(os.path.dirname(__file__), "..", "native",
                        "libfastpng.so")
    try:
        lib = ctypes.CDLL(os.path.abspath(path))
        lib.fastpng_encode.restype = ctypes.c_long
        lib.fastpng_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
        lib.fastpng_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        _fastpng = lib
    except OSError:
        _fastpng = False  # not built; use the Python fallback
    return _fastpng


def tonemap(rgba, gamma: float = 2.2):
    """fp32 linear RGBA -> uint8 sRGB-ish for display."""
    rgb = np.clip(np.asarray(rgba, np.float32)[..., :3], 0.0, 1.0)
    rgb = rgb ** (1.0 / gamma)
    a = np.clip(np.asarray(rgba)[..., 3:4], 0.0, 1.0)
    return (np.concatenate([rgb, a], -1) * 255.0 + 0.5).astype(np.uint8)


def save_png(path: str, rgba_u8: np.ndarray):
    """RGBA8 PNG writer: native fast path when built, stdlib fallback."""
    h, w, c = rgba_u8.shape
    assert c == 4 and rgba_u8.dtype == np.uint8

    lib = _load_fastpng()
    if lib:
        data = np.ascontiguousarray(rgba_u8).tobytes()
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = lib.fastpng_encode(data, w, h, ctypes.byref(out))
        if n > 0:
            try:
                with open(path, "wb") as f:
                    f.write(ctypes.string_at(out, n))
                return
            finally:
                lib.fastpng_free(out)
        # encode failure: fall through to the Python writer

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + rgba_u8[y].tobytes() for y in range(h))
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def save_npy(path: str, image):
    np.save(path, np.asarray(image))


def downscale_u8(img_u8: np.ndarray, max_width: int) -> np.ndarray:
    """Integer-free bilinear downscale (PIL) of a uint8 frame to at most
    ``max_width`` columns — used to keep animated demo artifacts small."""
    if max_width <= 0 or img_u8.shape[1] <= max_width:
        return img_u8
    from PIL import Image
    im = Image.fromarray(img_u8)
    h = round(im.height * max_width / im.width)
    return np.asarray(im.resize((max_width, h), Image.BILINEAR))


def save_gif(path: str, frames, fps: float = 30.0):
    """Animated GIF from a list of uint8 [H, W, 3|4] frames (the demo
    artifact format — the reference validated itself with README GIFs)."""
    from PIL import Image
    imgs = [Image.fromarray(np.asarray(f)[..., :3]) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=max(int(1000 / fps), 20), loop=0, optimize=True)
