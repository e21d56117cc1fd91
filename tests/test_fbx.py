"""FBX loader tests: synthetic binary 7.4 and ASCII documents."""

import struct
import zlib

import numpy as np
import pytest

from nrc_tpu.scene.fbx_loader import load_fbx

# a unit quad: 4 verts, one 4-gon -> 2 triangles after fan triangulation
QUAD_V = [0, 0, 0, 1, 0, 0, 1, 1, 0, 0, 1, 0]
QUAD_I = [0, 1, 2, -4]  # last index xor'd: ~(-4) == 3


# ---------------------------------------------------------------------------
# binary writer (node records, version 7400: u32 fields)
# ---------------------------------------------------------------------------

def _prop_arr(code, arr, compress=False):
    dt = {"d": "<f8", "i": "<i4", "f": "<f4"}[code]
    raw = np.asarray(arr, dt).tobytes()
    if compress:
        comp = zlib.compress(raw)
        return (code.encode() + struct.pack("<3I", len(arr), 1, len(comp))
                + comp)
    return code.encode() + struct.pack("<3I", len(arr), 0, len(raw)) + raw


def _prop_long(v):
    return b"L" + struct.pack("<q", v)


def _prop_str(s):
    b = s.encode()
    return b"S" + struct.pack("<I", len(b)) + b


def _node(name, props=b"", nprops=0, children=b"", start=0):
    name_b = name.encode()
    body = props + children + (b"\0" * 13 if children else b"")
    hdr_len = 13 + len(name_b)
    end = start + hdr_len + len(body)
    return struct.pack("<3IB", end, nprops, len(props), len(name_b)) + name_b + body


def _binary_fbx(verts=QUAD_V, idx=QUAD_I, compress=False):
    head = b"Kaydara FBX Binary  \x00\x1a\x00" + struct.pack("<I", 7400)
    off = len(head)

    # Objects > Geometry(id=100) { Vertices, PolygonVertexIndex }
    def geometry(start):
        p_id = _prop_long(100) + _prop_str("Geometry::quad") + _prop_str("Mesh")
        vhdr_start = start + 13 + len(b"Geometry") + len(p_id)
        v_node = _node("Vertices", _prop_arr("d", verts, compress), 1,
                       start=vhdr_start)
        i_node = _node("PolygonVertexIndex", _prop_arr("i", idx), 1,
                       start=vhdr_start + len(v_node))
        children = v_node + i_node
        return _node("Geometry", p_id, 3, children, start=start)

    # iterative sizing: build Objects at the right offset
    objs_probe = _node("Objects", children=geometry(0), start=0)
    objs = _node(
        "Objects",
        children=geometry(off + 13 + len(b"Objects")),
        start=off,
    )
    assert len(objs) == len(objs_probe)
    out = head + objs + b"\0" * 13
    return out


def test_binary_quad(tmp_path):
    p = tmp_path / "q.fbx"
    p.write_bytes(_binary_fbx())
    m = load_fbx(str(p))
    assert m.vertices.shape == (4, 3)
    assert m.indices.shape == (2, 3)
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4, atol=1e-6)


def test_binary_compressed_array(tmp_path):
    p = tmp_path / "qc.fbx"
    p.write_bytes(_binary_fbx(compress=True))
    m = load_fbx(str(p))
    assert m.vertices.shape == (4, 3)
    np.testing.assert_allclose(m.vertices[2], [1, 1, 0], atol=1e-6)


ASCII_DOC = """
; FBX 7.4 project file (ascii)
Objects:  {
    Geometry: 100, "Geometry::quad", "Mesh" {
        Vertices: *12 {
            a: 0,0,0,1,0,0,
               1,1,0,0,1,0
        }
        PolygonVertexIndex: *4 {
            a: 0,1,2,-4
        }
    }
    Model: 200, "Model::quad", "Mesh" {
        Properties70:  {
            P: "Lcl Translation", "Lcl Translation", "", "A",2,0,0
            P: "Lcl Scaling", "Lcl Scaling", "", "A",2,2,2
        }
    }
}
Connections:  {
    C: "OO",100,200
}
"""


def test_ascii_with_model_transform(tmp_path):
    p = tmp_path / "a.fbx"
    p.write_text(ASCII_DOC)
    m = load_fbx(str(p))
    assert m.vertices.shape == (4, 3)
    assert m.indices.shape == (2, 3)
    # scale 2 then translate (2,0,0): vertex (1,1,0) -> (4,2,0)
    np.testing.assert_allclose(
        sorted(m.vertices[:, 0].tolist()), [2, 2, 4, 4], atol=1e-5
    )
    np.testing.assert_allclose(m.vertices[:, 1].max(), 2.0, atol=1e-5)


def test_ascii_rotation(tmp_path):
    doc = ASCII_DOC.replace(
        'P: "Lcl Translation", "Lcl Translation", "", "A",2,0,0',
        'P: "Lcl Rotation", "Lcl Rotation", "", "A",0,0,90',
    ).replace('P: "Lcl Scaling", "Lcl Scaling", "", "A",2,2,2', "")
    p = tmp_path / "r.fbx"
    p.write_text(doc)
    m = load_fbx(str(p))
    # 90 deg about z: (1,0,0) -> (0,1,0)
    np.testing.assert_allclose(m.vertices[1], [0, 1, 0], atol=1e-5)


def test_rejects_no_geometry(tmp_path):
    p = tmp_path / "e.fbx"
    p.write_text("Objects: {\n}\n")
    with pytest.raises(ValueError):
        load_fbx(str(p))


def test_mesh_import_dispatch(tmp_path):
    from nrc_tpu.scene import scene_builder

    p = tmp_path / "m.fbx"
    p.write_bytes(_binary_fbx())

    class Decl:
        kind = "assimp"
        path = str(p)
        args = ()

    m = scene_builder._make_mesh(Decl())
    assert m.num_triangles == 2


def test_nonuniform_scale_normals(tmp_path):
    """Normals use the inverse-transpose: scaling geometry by (1,1,4)
    shrinks the normal's z component (tips AWAY from the stretched axis)."""
    doc = ASCII_DOC.replace(
        'P: "Lcl Translation", "Lcl Translation", "", "A",2,0,0',
        'P: "Lcl Rotation", "Lcl Rotation", "", "A",90,0,0',
    ).replace(
        'P: "Lcl Scaling", "Lcl Scaling", "", "A",2,2,2',
        'P: "Lcl Scaling", "Lcl Scaling", "", "A",1,1,4',
    )
    p = tmp_path / "s.fbx"
    p.write_text(doc)
    m = load_fbx(str(p))
    # quad in xy-plane rotated by R_x(90) -> lies in xz-plane, generated
    # normal should be +/-y regardless of the z scale
    ay = np.abs(m.normals[:, 1])
    np.testing.assert_allclose(ay, 1.0, atol=1e-5)
