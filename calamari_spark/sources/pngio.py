"""Minimal pure-numpy grayscale PNG codec (no PIL/cv2 in this container).

Deterministic: encode always uses filter type 0 and a fixed zlib level, so
byte-identical PNGs for identical arrays. Decoder implements all five PNG
scanline filters for robustness. 8-bit grayscale only — the engine treats
media payloads as opaque binary columns; this codec is the decode step of
the media-span pandas-UDF stage (reference analog: ImageLoader.load_image,
calamari_ocr/utils/image.py:28-97).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """uint8 HxW grayscale -> PNG bytes (filter 0 per scanline)."""
    if img.ndim != 2:
        raise ValueError(f"grayscale HxW expected, got shape {img.shape}")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 HxW (grayscale; RGB(A) collapsed by mean)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = bitdepth = colortype = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bitdepth, colortype = struct.unpack(">IIBB", body[:10])
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if bitdepth != 8:
        raise ValueError(f"only 8-bit PNG supported, got {bitdepth}")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[colortype]
    raw = zlib.decompress(idat)
    stride = width * channels
    img = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    off = 0
    for y in range(height):
        ftype = raw[off]
        line = np.frombuffer(raw[off + 1 : off + 1 + stride], dtype=np.uint8).copy()
        off += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(channels, stride):
                line[x] = (line[x] + line[x - channels]) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - channels]) if x >= channels else 0
                line[x] = (line[x] + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - channels]) if x >= channels else 0
                b = int(prev[x])
                c = int(prev[x - channels]) if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        img[y] = line
        prev = line
    img = img.reshape(height, width, channels)
    if channels == 1:
        return img[:, :, 0]
    if channels == 2:  # gray+alpha -> gray (reference: image.py:43-45)
        return img[:, :, 0]
    # RGB(A) -> gray by mean (reference 'avg' method: image.py:46-57)
    return np.mean(img[:, :, :3].astype(np.float32), axis=-1).astype(np.uint8)
