"""Bitmap container, streams, spiral, viewer (utils/bitmap.py,
core/stream.py, render/spiral.py, viewer.py)."""

import os
import numpy as np
import pytest

from mitsuba2_tpu.utils.bitmap import Bitmap, dither_matrix
from mitsuba2_tpu.core.stream import (FStream, MemoryStream, ZStream,
                                      DummyStream)
from mitsuba2_tpu.render.spiral import Spiral


def _img(h=9, w=13, c=3, seed=0):
    return np.random.default_rng(seed).uniform(0, 1, (h, w, c)) \
        .astype(np.float32)


def test_pixel_format_roundtrip():
    b = Bitmap(_img())
    assert b.pixel_format == "rgb"
    y = b.convert("y")
    assert y.data.shape[-1] == 1
    # luminance of grey is the grey value
    g = Bitmap(np.full((4, 4, 3), 0.25, np.float32))
    np.testing.assert_allclose(g.convert("y").data, 0.25, atol=1e-6)
    # rgb -> xyz -> rgb roundtrip
    back = b.convert("xyz").convert("rgb")
    np.testing.assert_allclose(back.data, b.data, atol=1e-5)


def test_srgb_gamma_tag():
    lin = Bitmap(_img())
    srgb = lin.convert("rgb", srgb_gamma=True)
    assert srgb.srgb_gamma
    again = srgb.convert("rgb", srgb_gamma=False)
    np.testing.assert_allclose(again.data, lin.data, atol=1e-5)


def test_alpha_premultiply():
    d = np.concatenate([_img(c=3), np.full((9, 13, 1), 0.5, np.float32)],
                       -1)
    b = Bitmap(d)
    assert b.pixel_format == "rgba"
    pm = b.convert("rgba", premultiply_alpha=True)
    np.testing.assert_allclose(pm.data[..., :3], d[..., :3] * 0.5,
                               atol=1e-6)


def test_dither_matrix_properties():
    t = dither_matrix()
    assert t.shape == (256, 256)
    assert 0 < t.min() and t.max() < 1
    # every threshold distinct (ordered-dither contract)
    assert len(np.unique(t)) == t.size


def test_quantize_dither_preserves_mean():
    b = Bitmap(np.full((64, 64, 3), 0.3, np.float32))
    q = b.quantize(dither=True).astype(np.float64) / 255.0
    assert abs(q.mean() - 0.3) < 2e-3
    assert len(np.unique(q)) >= 2  # dithering actually toggles levels


@pytest.mark.parametrize("ext", ["png", "jpg", "bmp", "tga", "ppm",
                                 "exr", "pfm"])
def test_write_read_formats(tmp_path, ext):
    if ext == "jpg":
        # lossy DCT: use a smooth image (noise is the adversarial case)
        g = np.linspace(0.1, 0.9, 16, dtype=np.float32)
        img = np.stack(np.broadcast_arrays(
            g[:, None], g[None, :], np.float32(0.5)), -1)
        tol = 8e-2
    else:
        img = _img(8, 8)
        tol = 2e-2
    f = str(tmp_path / f"x.{ext}")
    Bitmap(img).write(f)
    assert os.path.getsize(f) > 0
    back = Bitmap.read(f)
    np.testing.assert_allclose(back.data[..., :3], img, atol=tol)


def test_write_async(tmp_path):
    f = str(tmp_path / "a.png")
    t = Bitmap(_img()).write_async(f)
    t.join(10)
    assert os.path.exists(f)


def test_streams_roundtrip(tmp_path):
    ms = MemoryStream()
    ms.write_u32(0xDEADBEEF)
    ms.write_f32(2.5)
    ms.write_string("hello")
    ms.write_array(np.arange(5, dtype=np.float32))
    ms.seek(0)
    assert ms.read_u32() == 0xDEADBEEF
    assert ms.read_f32() == 2.5
    assert ms.read_string() == "hello"
    np.testing.assert_array_equal(ms.read_array(np.float32, 5),
                                  np.arange(5, dtype=np.float32))

    f = str(tmp_path / "s.bin")
    fs = FStream(f, "wb")
    z = ZStream(fs, "w")
    payload = b"abc" * 1000
    z.write(payload)
    z.close(); fs.close()
    fs = FStream(f, "rb")
    assert fs.size() < len(payload)      # actually compressed
    z = ZStream(fs, "r")
    assert z.read(len(payload)) == payload

    d = DummyStream()
    d.write_u64(1); d.write_string("xy")
    assert d.size() == 8 + 3


def test_spiral_covers_every_pixel():
    sp = Spiral((70, 50), block_size=16)
    seen = np.zeros((50, 70), bool)
    blocks = list(sp)
    assert len(blocks) == sp.block_count
    for (x, y), (w, h) in blocks:
        assert not seen[y:y+h, x:x+w].any()
        seen[y:y+h, x:x+w] = True
    assert seen.all()
    # first block contains the image center region
    (x0, y0), (w0, h0) = blocks[0]
    assert x0 <= 35 <= x0 + w0 + 16 and y0 <= 25 <= y0 + h0 + 16


def test_viewer_tonemap_and_html(tmp_path):
    from mitsuba2_tpu.viewer import tonemap, make_html, main
    from mitsuba2_tpu.utils.io_exr import write_exr
    img = _img(6, 7) * 4.0
    t = tonemap(img, exposure=-2.0)
    assert t.max() <= 1.0 and t.shape == (6, 7, 3)
    f = str(tmp_path / "r.exr")
    write_exr(f, img)
    out = str(tmp_path / "p.png")
    main([f, "-o", out, "--exposure", "-2"])
    assert os.path.getsize(out) > 0
    html = make_html(img)
    assert "<canvas" in html and '"shape": [6, 7]' in html
