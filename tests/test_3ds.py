"""3DS loader tests with a synthetic chunk-tree writer."""

import struct

import numpy as np
import pytest

from nrc_tpu.scene.tds_loader import load_3ds


def _chunk(cid, body=b""):
    return struct.pack("<HI", cid, 6 + len(body)) + body


def _mesh_chunks(verts, faces, uvs=None):
    vb = struct.pack("<H", len(verts))
    for v in verts:
        vb += struct.pack("<3f", *v)
    fb = struct.pack("<H", len(faces))
    for f in faces:
        fb += struct.pack("<4H", *f, 0)
    body = _chunk(0x4110, vb) + _chunk(0x4120, fb)
    if uvs is not None:
        ub = struct.pack("<H", len(uvs))
        for u in uvs:
            ub += struct.pack("<2f", *u)
        body += _chunk(0x4140, ub)
    return _chunk(0x4100, body)


def _3ds(verts, faces, uvs=None, name=b"quad"):
    obj = _chunk(0x4000, name + b"\0" + _mesh_chunks(verts, faces, uvs))
    return _chunk(0x4D4D, _chunk(0x3D3D, obj))


QUAD_V = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]
QUAD_F = [(0, 1, 2), (0, 2, 3)]


def test_quad(tmp_path):
    p = tmp_path / "q.3ds"
    p.write_bytes(_3ds(QUAD_V, QUAD_F))
    m = load_3ds(str(p))
    assert m.vertices.shape == (4, 3)
    assert m.indices.shape == (2, 3)
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4, atol=1e-6)


def test_uvs(tmp_path):
    uvs = [(0, 0), (1, 0), (1, 1), (0, 1)]
    p = tmp_path / "u.3ds"
    p.write_bytes(_3ds(QUAD_V, QUAD_F, uvs))
    m = load_3ds(str(p))
    np.testing.assert_allclose(m.texcoords, uvs, atol=1e-6)


def test_two_objects_concatenate(tmp_path):
    obj1 = _chunk(0x4000, b"a\0" + _mesh_chunks(QUAD_V, QUAD_F))
    v2 = [(v[0], v[1], v[2] + 2) for v in QUAD_V]
    obj2 = _chunk(0x4000, b"b\0" + _mesh_chunks(v2, QUAD_F))
    raw = _chunk(0x4D4D, _chunk(0x3D3D, obj1 + obj2))
    p = tmp_path / "t.3ds"
    p.write_bytes(raw)
    m = load_3ds(str(p))
    assert m.vertices.shape == (8, 3)
    assert m.indices.shape == (4, 3)
    assert m.vertices[:, 2].max() == 2.0


def test_rejects_garbage(tmp_path):
    p = tmp_path / "g.3ds"
    p.write_bytes(b"NOPE" + b"\0" * 20)
    with pytest.raises(ValueError):
        load_3ds(str(p))


def test_mesh_import_dispatch(tmp_path):
    from nrc_tpu.scene import scene_builder

    p = tmp_path / "m.3ds"
    p.write_bytes(_3ds(QUAD_V, QUAD_F))

    class Decl:
        kind = "assimp"
        path = str(p)
        args = ()

    m = scene_builder._make_mesh(Decl())
    assert m.num_triangles == 2
