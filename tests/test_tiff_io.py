import numpy as np
import pytest

from microimagelib_tpu.io.tiff import (
    TiffError,
    gettifinfo,
    readtifstack,
    readtifstack_16to16,
    writetifstack,
    writetifstack_16to16,
    _float_to_u16_c_cast,
)
from microimagelib_tpu.io.tmx import read_tmx, write_tmx


def test_roundtrip_u16(tmp_path, rng):
    stack = rng.integers(0, 65535, size=(5, 17, 23)).astype(np.float32)
    p = str(tmp_path / "a.tif")
    writetifstack(p, stack, 16)
    (w, h, z), bits = gettifinfo(p)
    assert (w, h, z) == (23, 17, 5)
    assert bits == 16
    back, size = readtifstack(p)
    assert size == (23, 17, 5)
    np.testing.assert_array_equal(back, stack)


def test_roundtrip_f32(tmp_path, rng):
    stack = rng.normal(size=(3, 9, 11)).astype(np.float32)
    p = str(tmp_path / "b.tif")
    writetifstack(p, stack, 32)
    back, size = readtifstack(p)
    assert size == (11, 9, 3)
    np.testing.assert_array_equal(back, stack)
    _, bits = gettifinfo(p)
    assert bits == 32


def test_roundtrip_16to16(tmp_path, rng):
    stack = rng.integers(0, 65535, size=(4, 8, 6)).astype(np.uint16)
    p = str(tmp_path / "c.tif")
    writetifstack_16to16(p, stack)
    back, size = readtifstack_16to16(p)
    np.testing.assert_array_equal(back, stack)
    assert size == (6, 8, 4)


def test_u16_cast_truncates_like_c():
    a = np.array([0.9, 1.5, 65535.7, 100.2, -0.5], dtype=np.float32)
    out = _float_to_u16_c_cast(a)
    assert out[0] == 0 and out[1] == 1 and out[2] == 65535 and out[3] == 100 and out[4] == 0


def test_single_page_2d(tmp_path, rng):
    img = rng.normal(size=(13, 21)).astype(np.float32)
    p = str(tmp_path / "d.tif")
    writetifstack(p, img, 32)
    back, size = readtifstack(p)
    assert back.shape == (1, 13, 21)
    np.testing.assert_array_equal(back[0], img)


def test_missing_file_raises(tmp_path):
    with pytest.raises(TiffError):
        readtifstack(str(tmp_path / "nope.tif"))


def test_tmx_roundtrip(tmp_path):
    m = np.arange(12, dtype=np.float32) * 0.5 - 2.0
    p = str(tmp_path / "m.tmx")
    write_tmx(p, m)
    back = read_tmx(p)
    np.testing.assert_allclose(back, m, atol=1e-6)
    # file has 16 values, 4x4, last row 0 0 0 1
    vals = [float(v) for v in open(p).read().split()]
    assert len(vals) == 16
    assert vals[12:] == [0.0, 0.0, 0.0, 1.0]


def _write_imagej_contiguous(path, stack):
    """Emit an ImageJ-style contiguous stack: ONE IFD describing the first
    slice, pixel data for all slices contiguous, images=N in the
    description."""
    import struct

    z, h, w = stack.shape
    data = np.ascontiguousarray(stack, dtype="<u2").tobytes()
    desc = f"ImageJ=1.53t\nimages={z}\nslices={z}\nloop=false\x00".encode()
    # header(8) + IFD + desc + data
    n_entries = 9
    ifd_off = 8
    ifd_len = 2 + n_entries * 12 + 4
    desc_off = ifd_off + ifd_len
    data_off = desc_off + len(desc)
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 16), (259, 3, 1, 1),
        (262, 3, 1, 1), (270, 2, len(desc), desc_off),
        (273, 4, 1, data_off), (278, 3, 1, h), (279, 4, 1, w * h * 2),
    ]
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", n_entries)
    for tag, typ, cnt, val in entries:
        if typ == 3 and cnt == 1:
            out += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += desc
    out += data
    open(path, "wb").write(bytes(out))


def test_imagej_contiguous_hyperstack(tmp_path, rng):
    stack = rng.integers(0, 60000, size=(5, 7, 9)).astype(np.uint16)
    p = str(tmp_path / "ij.tif")
    _write_imagej_contiguous(p, stack)
    size, bits = gettifinfo(p)
    assert size == (9, 7, 5)  # true depth from images=N, not the single IFD
    assert bits == 16
    back, size2 = readtifstack(p)
    assert size2 == (9, 7, 5)
    np.testing.assert_array_equal(back, stack.astype(np.float32))
