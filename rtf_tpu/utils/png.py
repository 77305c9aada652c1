"""Minimal pure-Python PNG codec (zlib + struct only).

Replaces the reference's vendored lodepng (Final/include/lodepng.{h,cpp},
~8 kLoC of C++) for the two things the renderer needs:
  * decode texture files / golden images (8-bit grey, RGB, RGBA, palette)
  * encode framebuffer / z-buffer / sample-count AOVs
No external image library is required.
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


def write_png(path: str, img: np.ndarray) -> None:
    """Write uint8 image of shape [H,W] (grey), [H,W,3] (RGB) or [H,W,4]."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(np.rint(np.asarray(img, np.float32)), 0, 255).astype(np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.concatenate([np.zeros((h, 1), np.uint8), img.reshape(h, w * c)], axis=1)
    idat = zlib.compress(raw.tobytes(), 6)
    with open(path, "wb") as f:
        f.write(_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b""))


def _paeth(a, b, c):
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def read_png(path: str) -> np.ndarray:
    """Decode an 8/16-bit PNG into a uint8 array [H,W,C] (palette expanded)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != _SIG:
        raise ValueError(f"{path}: not a PNG")
    pos = 8
    idat = b""
    palette = None
    trns = None
    w = h = depth = ctype = interlace = None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
        elif tag == b"PLTE":
            palette = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(payload, np.uint8)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if interlace != 0:
        raise NotImplementedError("interlaced PNG not supported")
    if depth not in (8, 16):
        raise NotImplementedError(f"bit depth {depth} not supported")
    nchan = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    bpp = nchan * (depth // 8)
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    raw = raw.reshape(h, stride + 1)
    try:
        from rtf_tpu.native.binding import native_png_unfilter
        native = native_png_unfilter(raw, h, stride, bpp)
    except Exception:
        native = None
    if native is not None:
        out = native
        return _expand(out, h, w, nchan, depth, ctype, palette, trns)
    filters = raw[:, 0]
    lines = raw[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    zero = np.zeros(stride, np.uint8)
    for y in range(h):
        f = filters[y]
        cur = lines[y].copy()
        up = out[y - 1] if y > 0 else zero
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up
            out[y] = cur + up
        elif f == 1:  # Sub: per-phase prefix sum mod 256
            row = cur.reshape(-1, bpp)
            out[y] = np.cumsum(row.astype(np.int64), axis=0).astype(np.uint8).reshape(-1)
        elif f in (3, 4):  # Average / Paeth need a left-to-right scan
            prev_row = up
            row = out[y]
            row[:] = cur
            if f == 3:
                for x in range(stride):
                    left = int(row[x - bpp]) if x >= bpp else 0
                    row[x] = (int(cur[x]) + ((left + int(prev_row[x])) >> 1)) & 0xFF
            else:
                for x in range(stride):
                    a = int(row[x - bpp]) if x >= bpp else 0
                    b = int(prev_row[x])
                    c = int(prev_row[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    row[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
    return _expand(out, h, w, nchan, depth, ctype, palette, trns)


def _expand(out, h, w, nchan, depth, ctype, palette, trns):
    if depth == 16:
        out = out.reshape(h, w, nchan, 2)[..., 0]  # keep high byte
    else:
        out = out.reshape(h, w, nchan)
    if ctype == 3:
        idx = out[:, :, 0]
        rgb = palette[idx]
        if trns is not None:
            lim = min(len(trns), 256)
            lut = np.full(256, 255, np.uint8)
            lut[:lim] = trns[:lim]
            a = lut[idx]
            return np.concatenate([rgb, a[:, :, None]], axis=-1)
        return rgb
    return out
