import numpy as np

from raytracinginoneweekend_tpu.io.image import read_ppm, write_png, write_ppm


def test_ppm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    p = tmp_path / "x.ppm"
    write_ppm(p, img)
    back = read_ppm(p)
    np.testing.assert_array_equal(img, back)
    raw = p.read_bytes()
    assert raw.startswith(b"P6\n9 6\n255\n")  # main.cxx:96-100 header format


def test_png_valid_structure(tmp_path):
    import struct
    import zlib

    img = np.zeros((4, 5, 3), np.uint8)
    img[..., 0] = 200
    p = tmp_path / "x.png"
    write_png(p, img)
    data = p.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", data[16:24])
    assert (w, h) == (5, 4)
    # decompress IDAT and check first pixel
    idat_start = data.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", data[idat_start - 8:idat_start - 4])[0]
    raw = zlib.decompress(data[idat_start:idat_start + idat_len])
    assert raw[0] == 0  # filter byte
    assert raw[1:4] == bytes([200, 0, 0])
