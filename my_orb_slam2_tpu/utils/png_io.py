"""Minimal dependency-free PNG encoder (zlib from the stdlib).

The engine ships its own PNG *decoder* in native/slam_io.cc (the dataset
hot path); this is the encoding side, used to synthesize TUM/KITTI-format
sequences on disk (tools/make_dataset.py), dump visualization frames, and
round-trip the native decoder in tests. Supports 8-bit grayscale, 16-bit
grayscale (TUM depth maps) and 8-bit RGB; filter 0, no interlace.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (H,W) gray / (H,W,3) RGB, or uint16 (H,W) gray -> PNG bytes."""
    img = np.ascontiguousarray(img)
    if img.dtype == np.uint16:
        assert img.ndim == 2, "16-bit supported for grayscale only"
        bit_depth, color_type = 16, 0
        raw = img.astype(">u2").tobytes()
        row_bytes = img.shape[1] * 2
    elif img.dtype == np.uint8 and img.ndim == 2:
        bit_depth, color_type = 8, 0
        raw = img.tobytes()
        row_bytes = img.shape[1]
    elif img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3:
        bit_depth, color_type = 8, 2
        raw = img.tobytes()
        row_bytes = img.shape[1] * 3
    else:
        raise ValueError(f"unsupported image {img.dtype} {img.shape}")
    h, w = img.shape[:2]
    # filter byte 0 per scanline
    lines = b"".join(
        b"\x00" + raw[y * row_bytes : (y + 1) * row_bytes] for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(lines, 6))
        + _chunk(b"IEND", b"")
    )


def write_png(path: str, img: np.ndarray):
    with open(path, "wb") as f:
        f.write(encode_png(img))
