"""Frame output: npy and PNG (stdlib-only encoder, no external deps)."""
from __future__ import annotations

import struct
import zlib

import numpy as np


def tonemap(rgba, gamma: float = 2.2):
    """fp32 linear RGBA -> uint8 sRGB-ish for display."""
    rgb = np.clip(np.asarray(rgba, np.float32)[..., :3], 0.0, 1.0)
    rgb = rgb ** (1.0 / gamma)
    a = np.clip(np.asarray(rgba)[..., 3:4], 0.0, 1.0)
    return (np.concatenate([rgb, a], -1) * 255.0 + 0.5).astype(np.uint8)


def save_png(path: str, rgba_u8: np.ndarray):
    """Minimal RGBA8 PNG writer (zlib + stdlib struct)."""
    h, w, c = rgba_u8.shape
    assert c == 4 and rgba_u8.dtype == np.uint8

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
