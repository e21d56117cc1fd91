"""STL loader tests (binary + ascii), mesh-import dispatch, welding."""

import struct

import numpy as np

from nrc_tpu.scene.stl_loader import load_stl


def _binary_stl(tris, header=b"binary stl"):
    out = header.ljust(80, b"\0") + struct.pack("<I", len(tris))
    for t in tris:
        n = np.cross(
            np.subtract(t[1], t[0]), np.subtract(t[2], t[0])
        ).astype(np.float32)
        ln = np.linalg.norm(n)
        n = n / ln if ln > 0 else n
        out += struct.pack("<3f", *n)
        for v in t:
            out += struct.pack("<3f", *v)
        out += struct.pack("<H", 0)
    return out


QUAD = [
    [(0, 0, 0), (1, 0, 0), (1, 1, 0)],
    [(0, 0, 0), (1, 1, 0), (0, 1, 0)],
]


def test_binary_quad(tmp_path):
    p = tmp_path / "q.stl"
    p.write_bytes(_binary_stl(QUAD))
    m = load_stl(str(p))
    # 6 corners weld to 4 shared vertices, 2 triangles survive
    assert m.vertices.shape == (4, 3)
    assert m.indices.shape == (2, 3)
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4, atol=1e-6)


def test_binary_solid_prefix_header(tmp_path):
    # binary file whose 80-byte header starts with "solid" (common in the
    # wild) must still parse as binary
    p = tmp_path / "s.stl"
    p.write_bytes(_binary_stl(QUAD, header=b"solid exported-by-foo"))
    m = load_stl(str(p))
    assert m.indices.shape == (2, 3)


def test_ascii_quad(tmp_path):
    txt = ["solid q"]
    for t in QUAD:
        txt.append(" facet normal 0 0 1\n  outer loop")
        for v in t:
            txt.append(f"   vertex {v[0]} {v[1]} {v[2]}")
        txt.append("  endloop\n endfacet")
    txt.append("endsolid q")
    p = tmp_path / "a.stl"
    p.write_text("\n".join(txt))
    m = load_stl(str(p))
    assert m.vertices.shape == (4, 3)
    assert m.indices.shape == (2, 3)


def test_degenerate_triangles_dropped(tmp_path):
    tris = QUAD + [[(0, 0, 0), (0, 0, 0), (1, 0, 0)]]
    p = tmp_path / "d.stl"
    p.write_bytes(_binary_stl(tris))
    m = load_stl(str(p))
    assert m.indices.shape == (2, 3)


def test_truncated_rejected(tmp_path):
    p = tmp_path / "t.stl"
    raw = _binary_stl(QUAD)
    p.write_bytes(raw[:-10])
    import pytest

    with pytest.raises(ValueError):
        load_stl(str(p))


def test_mesh_import_dispatch(tmp_path):
    from nrc_tpu.scene import scene_builder

    p = tmp_path / "m.stl"
    p.write_bytes(_binary_stl(QUAD))

    class Decl:
        kind = "assimp"
        path = str(p)
        args = ()

    m = scene_builder._make_mesh(Decl())
    assert m.num_triangles == 2
