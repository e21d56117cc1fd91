"""glTF 2.0 mesh import (.gltf + data URI, .glb, node transforms)."""

import base64
import json
import struct

import numpy as np

from nrc_tpu.scene.gltf_loader import load_gltf


def _quad_doc(translation=None):
    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    buf = pos.tobytes() + idx.tobytes()
    node = {"mesh": 0}
    if translation:
        node["translation"] = translation
    return {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [node],
        "meshes": [{
            "primitives": [{
                "attributes": {"POSITION": 0},
                "indices": 1,
            }]
        }],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 12},
        ],
        "buffers": [{"byteLength": len(buf)}],
    }, buf


def test_gltf_data_uri(tmp_path):
    doc, buf = _quad_doc()
    doc["buffers"][0]["uri"] = (
        "data:application/octet-stream;base64,"
        + base64.b64encode(buf).decode()
    )
    p = tmp_path / "quad.gltf"
    p.write_text(json.dumps(doc))
    m = load_gltf(str(p))
    assert m.vertices.shape == (4, 3) and m.indices.shape == (2, 3)
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4, atol=1e-6)


def test_glb_with_node_translation(tmp_path):
    doc, buf = _quad_doc(translation=[2.0, 0.0, 0.0])
    jdata = json.dumps(doc).encode()
    jdata += b" " * (-len(jdata) % 4)
    buf += b"\x00" * (-len(buf) % 4)
    glb = (
        struct.pack("<3I", 0x46546C67, 2, 12 + 8 + len(jdata) + 8 + len(buf))
        + struct.pack("<2I", len(jdata), 0x4E4F534A) + jdata
        + struct.pack("<2I", len(buf), 0x004E4942) + buf
    )
    p = tmp_path / "quad.glb"
    p.write_bytes(glb)
    m = load_gltf(str(p))
    assert m.vertices[:, 0].min() >= 2.0  # translation applied
    assert m.indices.shape == (2, 3)


def test_external_bin_and_strided(tmp_path):
    doc, buf = _quad_doc()
    doc["buffers"][0]["uri"] = "mesh.bin"
    (tmp_path / "mesh.bin").write_bytes(buf)
    p = tmp_path / "quad.gltf"
    p.write_text(json.dumps(doc))
    m = load_gltf(str(p))
    assert m.num_triangles == 2
