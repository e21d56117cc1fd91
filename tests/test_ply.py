"""PLY mesh import (ascii + binary) through the Assimp stand-in path."""

import struct

import numpy as np

from nrc_tpu.scene.ply_loader import load_ply

_HEADER_A = (
    "ply\nformat ascii 1.0\n"
    "element vertex 4\n"
    "property float x\nproperty float y\nproperty float z\n"
    "property float nx\nproperty float ny\nproperty float nz\n"
    "property float u\nproperty float v\n"
    "element face 1\nproperty list uchar int vertex_indices\n"
    "end_header\n"
)


def _quad_vertices():
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    n = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    return v, n, uv


def test_ascii_quad_fan_triangulated(tmp_path):
    v, n, uv = _quad_vertices()
    p = tmp_path / "quad.ply"
    with open(p, "w") as f:
        f.write(_HEADER_A)
        for row in np.concatenate([v, n, uv], axis=-1):
            f.write(" ".join(map(str, row)) + "\n")
        f.write("4 0 1 2 3\n")
    m = load_ply(str(p))
    assert m.vertices.shape == (4, 3)
    assert m.indices.shape == (2, 3)  # quad fan
    np.testing.assert_allclose(m.normals, n)
    np.testing.assert_allclose(m.texcoords, uv)


def test_binary_matches_ascii(tmp_path):
    v, n, uv = _quad_vertices()
    pa = tmp_path / "a.ply"
    with open(pa, "w") as f:
        f.write(_HEADER_A)
        for row in np.concatenate([v, n, uv], axis=-1):
            f.write(" ".join(map(str, row)) + "\n")
        f.write("4 0 1 2 3\n")
    pb = tmp_path / "b.ply"
    with open(pb, "wb") as f:
        f.write(
            _HEADER_A.replace("ascii", "binary_little_endian").encode()
        )
        f.write(np.concatenate([v, n, uv], axis=-1).astype("<f4").tobytes())
        f.write(struct.pack("<B4i", 4, 0, 1, 2, 3))
    a, b = load_ply(str(pa)), load_ply(str(pb))
    np.testing.assert_allclose(a.vertices, b.vertices)
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_allclose(a.texcoords, b.texcoords)


def test_normals_generated_when_absent(tmp_path):
    p = tmp_path / "tri.ply"
    with open(p, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\nproperty list uchar int vertex_indices\n"
            "end_header\n"
            "0 0 0\n1 0 0\n0 1 0\n"
            "3 0 1 2\n"
        )
    m = load_ply(str(p))
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 3, atol=1e-6)
    # tangents orthogonal to normals
    assert np.abs(np.sum(m.tangents * m.normals, axis=-1)).max() < 1e-5
