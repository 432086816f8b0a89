"""Vendored pure-numpy image codec: binary PPM (P6) / PGM (P5) and
24-bit uncompressed BMP (VERDICT r3 #6).

This container ships no image library, so without this module the
"real" decode branches of the E25 stages could never execute anywhere —
they were trusted, not tested. These two formats are simple enough to
decode with numpy alone (fixed headers + raw pixel rows), giving the
stages a third codec tier (``pil`` → ``numpy`` → ``fake``) whose real
decode path runs and is pinned in-sandbox.

Formats (public specs):
- PPM/PGM "raw" variants: ASCII header ``P6|P5 <w> <h> <maxval>\\n``
  (whitespace/comment tolerant), then ``h*w*3`` (P6) or ``h*w`` (P5)
  bytes, row-major, top-down. maxval must be ≤ 255 here.
- BMP: 14-byte file header + 40-byte BITMAPINFOHEADER, 24 bpp,
  BI_RGB (uncompressed), rows bottom-up, each padded to 4 bytes,
  pixels stored BGR.
"""

from __future__ import annotations

import struct

import numpy as np


# --- PPM / PGM -------------------------------------------------------------


def sniff(buf: bytes) -> str | None:
    """'ppm' | 'pgm' | 'bmp' | None by magic bytes."""
    if buf[:2] == b"P6":
        return "ppm"
    if buf[:2] == b"P5":
        return "pgm"
    if buf[:2] == b"BM":
        return "bmp"
    return None


def _ppm_header(buf: bytes):
    """Parse ``P6|P5 w h maxval`` tolerating comments; returns
    (magic, w, h, maxval, data_offset)."""
    pos = 2
    fields = []
    while len(fields) < 3:
        # skip whitespace and '#' comments
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < len(buf) and buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("npimage: truncated PPM/PGM header")
        fields.append(int(buf[start:pos]))
    return buf[:2], fields[0], fields[1], fields[2], pos + 1


def decode_ppm(buf: bytes) -> np.ndarray:
    """P6 → (h, w, 3) uint8; P5 → (h, w) uint8."""
    magic, w, h, maxval, off = _ppm_header(buf)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"npimage: unsupported PPM maxval {maxval}")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    data = np.frombuffer(buf, dtype=np.uint8, count=need, offset=off)
    return data.reshape(h, w, 3) if ch == 3 else data.reshape(h, w)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) → P6; (h, w) → P5."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    elif arr.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"npimage: bad array shape {arr.shape}")
    h, w = arr.shape[:2]
    return magic + f" {w} {h} 255\n".encode() + arr.tobytes()


# --- BMP (24-bit BI_RGB) ---------------------------------------------------


def decode_bmp(buf: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB (top-down)."""
    if buf[:2] != b"BM":
        raise ValueError("npimage: not a BMP payload")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"npimage: unsupported BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"npimage: only 24bpp BI_RGB BMP supported (bpp={bpp},"
            f" compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=h * stride, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BI_RGB BMP."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"npimage: bad array shape {arr.shape}")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, flip
    data = body.tobytes()
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 54)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + data


def decode(buf: bytes) -> np.ndarray:
    """Sniff + decode; raises ValueError for unsupported payloads."""
    kind = sniff(buf)
    if kind in ("ppm", "pgm"):
        return decode_ppm(buf)
    if kind == "bmp":
        return decode_bmp(buf)
    raise ValueError(
        "npimage: payload is not PPM/PGM/BMP (magic "
        f"{buf[:2]!r}) — the vendored codec only handles these formats"
    )


def encode(arr: np.ndarray, kind: str) -> bytes:
    if kind in ("ppm", "pgm"):
        return encode_ppm(arr)
    if kind == "bmp":
        return encode_bmp(arr)
    raise ValueError(f"npimage: unknown format {kind!r}")


def to_gray(arr: np.ndarray) -> np.ndarray:
    """(h, w[, 3]) → (h*w,) float64 grayscale pixel stream. RGB uses the
    ITU-R 601-2 luma transform with integer truncation (same formula
    PIL's convert('L') documents), so a future PIL-present run agrees."""
    if arr.ndim == 2:
        return arr.astype(np.float64).ravel()
    a = arr.astype(np.int64)
    l = (a[:, :, 0] * 299 + a[:, :, 1] * 587 + a[:, :, 2] * 114) // 1000
    return l.astype(np.float64).ravel()


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample (PIL Image.resize(..., NEAREST)
    convention: sample at floor((i + 0.5) * in/out))."""
    h, w = arr.shape[:2]
    yi = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    xi = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return arr[yi][:, xi]
