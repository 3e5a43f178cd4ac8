"""Native (C++) image tier vs the pure-Python implementations."""

import os
import zlib

import numpy as np
import pytest

from raytracinginoneweekend_tpu import native
from raytracinginoneweekend_tpu.io.image import read_ppm

pytestmark = pytest.mark.skipif(native.lib() is None,
                                reason="no C++ toolchain available")


def _img(h=23, w=31, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1.2, size=(h, w, 3)).astype(np.float32)


def test_native_gamma_quantize_matches_python():
    from raytracinginoneweekend_tpu.ops.postprocess import to_u8

    img = _img()
    got = native.gamma_quantize(img, clamp=True)
    want = np.asarray(to_u8(img, clamp=True))
    # pow() may differ by 1 ulp pre-quantization -> at most 1 u8 step.
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_native_ppm_roundtrip(tmp_path):
    u8 = (np.arange(7 * 5 * 3, dtype=np.uint32) % 256).astype(
        np.uint8).reshape(5, 7, 3)
    path = os.path.join(tmp_path, "n.ppm")
    assert native.write_ppm(path, u8)
    np.testing.assert_array_equal(read_ppm(path), u8)


def test_native_png_decodes(tmp_path):
    u8 = (np.arange(9 * 4 * 3, dtype=np.uint32) % 256).astype(
        np.uint8).reshape(4, 9, 3)
    path = os.path.join(tmp_path, "n.png")
    assert native.write_png(path, u8)
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # Decode the IDAT scanlines and compare pixels.
    pos, idat = 8, b""
    while pos < len(data):
        ln = int.from_bytes(data[pos:pos + 4], "big")
        tag = data[pos + 4:pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)
    rows = []
    stride = 9 * 3 + 1
    for y in range(4):
        row = raw[y * stride:(y + 1) * stride]
        assert row[0] == 0  # filter None
        rows.append(np.frombuffer(row[1:], np.uint8))
    np.testing.assert_array_equal(np.stack(rows).reshape(4, 9, 3), u8)


def test_io_image_uses_native(tmp_path):
    """write_ppm through io.image must produce identical bytes either way."""
    from raytracinginoneweekend_tpu.io import image as io_image

    u8 = _img(8, 6).clip(0, 1)
    u8 = (u8 * 255).astype(np.uint8)
    p1 = os.path.join(tmp_path, "a.ppm")
    p2 = os.path.join(tmp_path, "b.ppm")
    io_image.write_ppm(p1, u8)  # native path (lib available per skipif)
    h, w, _ = u8.shape
    with open(p2, "wb") as f:  # hand-written python bytes
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(u8.tobytes())
    assert open(p1, "rb").read() == open(p2, "rb").read()
