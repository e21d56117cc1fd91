"""DDS loader tests: hand-crafted files with hand-computed expected texels.

Covers the DevIL DDS capability of the reference's Picture loader
(``nrc/src/Picture.cpp``): BC1-BC5 block decompression, uncompressed
mask formats, float formats, cube maps, and the mip-chain face layout.
"""

import struct

import numpy as np
import pytest

from nrc_tpu.scene.dds_loader import load_dds
from nrc_tpu.scene.texture import load_image_rgba


def _header(w, h, *, fourcc=None, bpp=0, masks=(0, 0, 0, 0), mipmaps=0,
            cube=False, pf_flags=None):
    DDSD_CAPS, DDSD_HEIGHT, DDSD_WIDTH, DDSD_PIXELFORMAT = 0x1, 0x2, 0x4, 0x1000
    flags = DDSD_CAPS | DDSD_HEIGHT | DDSD_WIDTH | DDSD_PIXELFORMAT
    if mipmaps:
        flags |= 0x20000
    if pf_flags is None:
        pf_flags = 0x4 if fourcc else 0x40 | (0x1 if masks[3] else 0)
    h_bytes = struct.pack(
        "<4s7I44x2I4s5I4I4x",
        b"DDS ", 124, flags, h, w, 0, 0, mipmaps,
        32, pf_flags, fourcc or b"\0\0\0\0", bpp, *masks,
        0x1000, 0x200 | 0xFE00 if cube else 0, 0, 0,
    )
    assert len(h_bytes) == 128
    return h_bytes


def _bc1_block(c0, c1, indices):
    idx = 0
    for i, v in enumerate(indices):
        idx |= v << (2 * i)
    return struct.pack("<2HI", c0, c1, idx)


def test_bc1_four_color_mode():
    # c0=red(0xF800) > c1=blue(0x001F): 4-color mode.
    # texel 0 -> c0, texel 1 -> c1, texel 2 -> 2/3 c0 + 1/3 c1, texel 3 -> 1/3+2/3
    blk = _bc1_block(0xF800, 0x001F, [0, 1, 2, 3] + [0] * 12)
    raw = _header(4, 4, fourcc=b"DXT1") + blk
    img = load_dds_bytes(raw)
    np.testing.assert_allclose(img[0, 0], [1, 0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(img[0, 1], [0, 0, 1, 1], atol=1e-6)
    np.testing.assert_allclose(img[0, 2], [2 / 3, 0, 1 / 3, 1], atol=1e-6)
    np.testing.assert_allclose(img[0, 3], [1 / 3, 0, 2 / 3, 1], atol=1e-6)


def test_bc1_three_color_punch_through():
    # c0 <= c1: 3-color mode; index 3 = transparent black
    blk = _bc1_block(0x001F, 0xF800, [0, 1, 2, 3] + [0] * 12)
    raw = _header(4, 4, fourcc=b"DXT1") + blk
    img = load_dds_bytes(raw)
    np.testing.assert_allclose(img[0, 0], [0, 0, 1, 1], atol=1e-6)
    np.testing.assert_allclose(img[0, 1], [1, 0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(img[0, 2], [0.5, 0, 0.5, 1], atol=1e-6)
    np.testing.assert_allclose(img[0, 3], [0, 0, 0, 0], atol=1e-6)


def test_bc2_explicit_alpha():
    # alpha nibbles 0x0..0xF over the first 16 texels, color all-red 4-mode
    alpha = bytes(((2 * i + 1) << 4 | (2 * i)) for i in range(8))
    color = _bc1_block(0x0000, 0xF800, [1] * 16)  # c0<=c1 but BC2 forces 4-color
    raw = _header(4, 4, fourcc=b"DXT3") + alpha + color
    img = load_dds_bytes(raw)
    flat = img.reshape(16, 4)
    np.testing.assert_allclose(flat[:, 3], np.arange(16) / 15.0, atol=1e-6)
    # 4-color mode forced: index 1 decodes to c1=red (3-color mode would too,
    # but index 3 would be black/transparent; spot-check a 3-index block below)
    np.testing.assert_allclose(flat[0, :3], [1, 0, 0], atol=1e-6)


def test_bc2_forces_four_color_mode():
    alpha = b"\xff" * 8
    color = _bc1_block(0x0000, 0xF800, [3] * 16)  # idx3: 1/3 c0 + 2/3 c1
    raw = _header(4, 4, fourcc=b"DXT3") + alpha + color
    img = load_dds_bytes(raw)
    np.testing.assert_allclose(img[0, 0], [2 / 3, 0, 0, 1], atol=1e-2)


def test_bc3_interpolated_alpha():
    # a0=255 > a1=0, eight-value mode: idx2 = (6*a0+1*a1)/7
    bits = 0
    for i, v in enumerate([0, 1, 2, 3, 4, 5, 6, 7] + [0] * 8):
        bits |= v << (3 * i)
    ab = struct.pack("<2B6s", 255, 0, bits.to_bytes(6, "little"))
    color = _bc1_block(0xFFFF, 0xFFFF, [0] * 16)
    raw = _header(4, 4, fourcc=b"DXT5") + ab + color
    img = load_dds_bytes(raw)
    a = img.reshape(16, 4)[:8, 3] * 255.0
    exp = [255, 0, 6 * 255 / 7, 5 * 255 / 7, 4 * 255 / 7, 3 * 255 / 7,
           2 * 255 / 7, 255 / 7]
    np.testing.assert_allclose(a, exp, atol=0.01)


def test_bc3_six_value_alpha_mode():
    # a0 <= a1: six-value mode, idx6=0, idx7=255
    bits = 0
    for i, v in enumerate([0, 1, 2, 6, 7, 0, 0, 0] + [0] * 8):
        bits |= v << (3 * i)
    ab = struct.pack("<2B6s", 0, 250, bits.to_bytes(6, "little"))
    color = _bc1_block(0xFFFF, 0xFFFF, [0] * 16)
    raw = _header(4, 4, fourcc=b"DXT5") + ab + color
    img = load_dds_bytes(raw)
    a = img.reshape(16, 4)[:5, 3] * 255.0
    np.testing.assert_allclose(a, [0, 250, (4 * 0 + 1 * 250) / 5, 0, 255], atol=0.01)


def test_bc4_bc5_channels():
    bits = 0  # all texels index 0 -> a0
    ab_r = struct.pack("<2B6s", 128, 0, bits.to_bytes(6, "little"))
    raw = _header(4, 4, fourcc=b"ATI1") + ab_r
    img = load_dds_bytes(raw)
    np.testing.assert_allclose(img[..., 0], 128 / 255.0, atol=1e-6)
    np.testing.assert_allclose(img[..., 3], 1.0)

    ab_g = struct.pack("<2B6s", 64, 0, bits.to_bytes(6, "little"))
    raw = _header(4, 4, fourcc=b"ATI2") + ab_r + ab_g
    img = load_dds_bytes(raw)
    np.testing.assert_allclose(img[..., 0], 128 / 255.0, atol=1e-6)
    np.testing.assert_allclose(img[..., 1], 64 / 255.0, atol=1e-6)


def test_uncompressed_bgra8():
    # 2x2 BGRA8: blue, green, red, white
    px = bytes([255, 0, 0, 255,  0, 255, 0, 128,
                0, 0, 255, 255,  255, 255, 255, 255])
    raw = _header(2, 2, bpp=32,
                  masks=(0xFF0000, 0xFF00, 0xFF, 0xFF000000)) + px
    img = load_dds_bytes(raw)
    np.testing.assert_allclose(img[0, 0], [0, 0, 1, 1], atol=1e-6)
    np.testing.assert_allclose(img[0, 1], [0, 1, 0, 128 / 255], atol=1e-6)
    np.testing.assert_allclose(img[1, 0], [1, 0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(img[1, 1], [1, 1, 1, 1], atol=1e-6)


def test_uncompressed_r5g6b5():
    px = struct.pack("<4H", 0xF800, 0x07E0, 0x001F, 0xFFFF)
    raw = _header(2, 2, bpp=16, masks=(0xF800, 0x07E0, 0x001F, 0)) + px
    img = load_dds_bytes(raw)
    np.testing.assert_allclose(img[0, 0], [1, 0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(img[0, 1], [0, 1, 0, 1], atol=1e-6)
    np.testing.assert_allclose(img[1, 0], [0, 0, 1, 1], atol=1e-6)


def test_dx10_header_bc1_and_rgba8():
    dx10 = struct.pack("<5I", 71, 3, 0, 1, 0)  # BC1_UNORM, 2D
    blk = _bc1_block(0xF800, 0x001F, [0] * 16)
    raw = _header(4, 4, fourcc=b"DX10") + dx10 + blk
    img = load_dds_bytes(raw)
    np.testing.assert_allclose(img[..., 0], 1.0, atol=1e-6)

    dx10 = struct.pack("<5I", 28, 3, 0, 1, 0)  # R8G8B8A8_UNORM
    px = bytes([10, 20, 30, 40] * 4)
    raw = _header(2, 2, fourcc=b"DX10") + dx10 + px
    img = load_dds_bytes(raw)
    np.testing.assert_allclose(
        img[0, 0], np.array([10, 20, 30, 40]) / 255.0, atol=1e-6
    )


def test_float_formats():
    px = np.arange(16, dtype=np.float32).reshape(2, 2, 4) * 0.5
    raw = _header(2, 2, fourcc=struct.pack("<I", 116)) + px.tobytes()
    img = load_dds_bytes(raw)
    np.testing.assert_allclose(img, px)

    px16 = px.astype(np.float16)
    raw = _header(2, 2, fourcc=struct.pack("<I", 113)) + px16.tobytes()
    img = load_dds_bytes(raw)
    np.testing.assert_allclose(img, px16.astype(np.float32))


def test_cubemap_faces_and_mips():
    # 4x4 BC1, 2 mip levels per face (4x4 block + 2x2->one block), 6 faces
    face_colors = [0xF800, 0x07E0, 0x001F, 0xFFFF, 0x0000, 0x8410]
    body = b""
    for c in face_colors:
        body += _bc1_block(c, c, [0] * 16)   # mip 0
        body += _bc1_block(c, c, [0] * 16)   # mip 1 (2x2 still one block)
    raw = _header(4, 4, fourcc=b"DXT1", mipmaps=2, cube=True) + body
    img = load_dds_bytes(raw)
    assert img.shape == (6, 4, 4, 4)
    np.testing.assert_allclose(img[0, 0, 0, :3], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(img[1, 0, 0, :3], [0, 1, 0], atol=1e-2)
    np.testing.assert_allclose(img[2, 0, 0, :3], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(img[3, 0, 0, :3], [1, 1, 1], atol=1e-6)


def test_load_image_rgba_dispatch(tmp_path):
    blk = _bc1_block(0xF800, 0xF800, [0] * 16)
    p = tmp_path / "t.dds"
    p.write_bytes(_header(4, 4, fourcc=b"DXT1") + blk)
    img = load_image_rgba(str(p))
    assert img.shape == (4, 4, 4)
    np.testing.assert_allclose(img[..., 0], 1.0, atol=1e-6)


def test_non_multiple_of_four():
    # 6x3 BC1 -> 2x1 blocks, cropped
    blk = _bc1_block(0xF800, 0xF800, [0] * 16)
    raw = _header(6, 3, fourcc=b"DXT1") + blk * 2
    img = load_dds_bytes(raw)
    assert img.shape == (3, 6, 4)
    np.testing.assert_allclose(img[..., 0], 1.0, atol=1e-6)


def test_rejects_garbage():
    with pytest.raises(ValueError):
        load_dds_bytes(b"NOPE" + b"\0" * 200)


def load_dds_bytes(raw, tmpdir=[]):
    import os
    import tempfile

    fd, path = tempfile.mkstemp(suffix=".dds")
    try:
        os.write(fd, raw)
        os.close(fd)
        return load_dds(path)
    finally:
        os.unlink(path)


def test_bc5_snorm():
    """DXGI 84 = BC5_SNORM: int8 endpoints decode to [-1, 1]."""
    dx10 = struct.pack("<5I", 84, 3, 0, 1, 0)
    rb = struct.pack("<2b6s", -127, 127, (0).to_bytes(6, "little"))
    idx1 = 0  # every texel selects palette index 1 (-> a1)
    for i in range(16):
        idx1 |= 1 << (3 * i)
    gb = struct.pack("<2b6s", -127, 127, idx1.to_bytes(6, "little"))
    raw = _header(4, 4, fourcc=b"DX10") + dx10 + rb + gb
    img = load_dds_bytes(raw)
    np.testing.assert_allclose(img[..., 0], -1.0, atol=1e-6)  # R = a0 = -127
    np.testing.assert_allclose(img[..., 1], 1.0, atol=1e-6)   # G = a1 = +127
