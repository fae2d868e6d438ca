"""Image IO dispatch (role of Bitmap's format zoo, bitmap.cpp:21-60 —
PNG/JPEG via PIL, EXR via the built-in minimal codec, PFM/PPM native)."""

from __future__ import annotations

import os
import struct

import numpy as np

from ..core import math as m


def write_pfm(filename: str, image: np.ndarray):
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    hdr = b"PF\n" if c == 3 else b"Pf\n"
    with open(filename, "wb") as f:
        f.write(hdr)
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")  # little endian
        f.write(np.flipud(img[..., :3] if c >= 3 else img[..., 0]
                          ).astype("<f4").tobytes())


def read_pfm(filename: str) -> np.ndarray:
    with open(filename, "rb") as f:
        hdr = f.readline().strip()
        c = 3 if hdr == b"PF" else 1
        w, h = [int(x) for x in f.readline().split()]
        scale = float(f.readline())
        data = np.frombuffer(f.read(), "<f4" if scale < 0 else ">f4")
        img = data.reshape(h, w, c)
        return np.flipud(img).copy()


def write_png(filename: str, image: np.ndarray, gamma: bool = True):
    """Write LDR png; HDR input is tonemapped by the sRGB transfer."""
    from PIL import Image
    import numpy as _np
    img = np.asarray(image)
    if gamma:
        img = np.asarray(m.linear_to_srgb(np.clip(img, 0.0, 1.0)))
    arr = (_np.clip(np.asarray(img), 0, 1) * 255 + 0.5).astype(_np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(filename)


def write_image(filename: str, image, channel_names=None):
    """Dispatch on extension (Bitmap::write)."""
    image = np.asarray(image)
    ext = os.path.splitext(filename)[1].lower()
    if ext == ".exr":
        from .io_exr import write_exr
        write_exr(filename, image, channel_names)
    elif ext == ".pfm":
        write_pfm(filename, image)
    elif ext in (".png", ".jpg", ".jpeg", ".bmp", ".tga", ".ppm"):
        write_png(filename, image)
    else:
        raise ValueError(f"unsupported image format {ext}")


def read_image(filename: str, srgb_to_linear_ldr: bool = True) -> np.ndarray:
    ext = os.path.splitext(filename)[1].lower()
    if ext == ".exr":
        from .io_exr import read_exr
        img, _ = read_exr(filename)
        return img
    if ext == ".pfm":
        return read_pfm(filename)
    if ext in (".hdr", ".rgbe"):
        return _read_rgbe(filename)
    from PIL import Image
    img = np.asarray(Image.open(filename), np.float32) / 255.0
    if srgb_to_linear_ldr:
        img = np.asarray(m.srgb_to_linear(img))
    return img


def _read_rgbe(filename: str) -> np.ndarray:
    """Radiance RGBE (.hdr) reader (bitmap.cpp RGBE support)."""
    with open(filename, "rb") as f:
        if not f.readline().startswith(b"#?"):
            raise ValueError("not an RGBE file")
        while True:
            line = f.readline().strip()
            if not line:
                break
        dims = f.readline().split()
        h = int(dims[1]); w = int(dims[3])
        data = np.zeros((h, w, 4), np.uint8)
        for y in range(h):
            lead = f.read(4)
            if lead[0] == 2 and lead[1] == 2 and \
                    (lead[2] << 8 | lead[3]) == w:
                # RLE scanline
                for c in range(4):
                    x = 0
                    while x < w:
                        n = f.read(1)[0]
                        if n > 128:
                            val = f.read(1)[0]
                            data[y, x:x + n - 128, c] = val
                            x += n - 128
                        else:
                            chunk = np.frombuffer(f.read(n), np.uint8)
                            data[y, x:x + n, c] = chunk
                            x += n
            else:
                row = lead + f.read(4 * w - 4)
                data[y] = np.frombuffer(row, np.uint8).reshape(w, 4)
    e = data[..., 3].astype(np.int32) - 136
    scale = np.ldexp(1.0, e).astype(np.float32)
    return data[..., :3].astype(np.float32) * scale[..., None]
