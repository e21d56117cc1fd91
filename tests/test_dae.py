"""COLLADA loader tests: triangles, polylist, transforms, namespaces."""

import numpy as np
import pytest

from nrc_tpu.scene.dae_loader import load_dae

DAE = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <library_geometries>
    <geometry id="quad" name="quad">
      <mesh>
        <source id="quad-pos">
          <float_array id="quad-pos-array" count="12">
            0 0 0  1 0 0  1 1 0  0 1 0
          </float_array>
          <technique_common>
            <accessor source="#quad-pos-array" count="4" stride="3"/>
          </technique_common>
        </source>
        <source id="quad-nrm">
          <float_array id="quad-nrm-array" count="3">0 0 1</float_array>
          <technique_common>
            <accessor source="#quad-nrm-array" count="1" stride="3"/>
          </technique_common>
        </source>
        <vertices id="quad-verts">
          <input semantic="POSITION" source="#quad-pos"/>
        </vertices>
        {PRIM}
      </mesh>
    </geometry>
  </library_geometries>
  <library_visual_scenes>
    <visual_scene id="scene">
      <node id="n1">
        {XF}
        <instance_geometry url="#quad"/>
      </node>
    </visual_scene>
  </library_visual_scenes>
</COLLADA>
"""

TRIANGLES = """<triangles count="2">
  <input semantic="VERTEX" source="#quad-verts" offset="0"/>
  <input semantic="NORMAL" source="#quad-nrm" offset="1"/>
  <p>0 0 1 0 2 0  0 0 2 0 3 0</p>
</triangles>"""

POLYLIST = """<polylist count="1">
  <input semantic="VERTEX" source="#quad-verts" offset="0"/>
  <vcount>4</vcount>
  <p>0 1 2 3</p>
</polylist>"""


def _write(tmp_path, prim, xf=""):
    p = tmp_path / "t.dae"
    p.write_text(DAE.replace("{PRIM}", prim).replace("{XF}", xf))
    return str(p)


def test_triangles_with_normals(tmp_path):
    m = load_dae(_write(tmp_path, TRIANGLES))
    assert m.vertices.shape == (4, 3)
    assert m.indices.shape == (2, 3)
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4, atol=1e-6)


def test_polylist_fan_triangulation(tmp_path):
    m = load_dae(_write(tmp_path, POLYLIST))
    assert m.indices.shape == (2, 3)
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4, atol=1e-6)


def test_node_transforms_compose(tmp_path):
    xf = """<translate>10 0 0</translate>
            <rotate>0 0 1 90</rotate>
            <scale>2 2 2</scale>"""
    m = load_dae(_write(tmp_path, TRIANGLES, xf))
    # scale 2 -> rotate z90 -> translate +10x: (1,0,0) -> (10, 2, 0)
    np.testing.assert_allclose(m.vertices[1], [10, 2, 0], atol=1e-5)


def test_matrix_transform(tmp_path):
    xf = "<matrix>1 0 0 5  0 1 0 0  0 0 1 0  0 0 0 1</matrix>"
    m = load_dae(_write(tmp_path, TRIANGLES, xf))
    np.testing.assert_allclose(m.vertices[0], [5, 0, 0], atol=1e-6)


def test_rejects_empty(tmp_path):
    p = tmp_path / "e.dae"
    p.write_text('<COLLADA><library_geometries/></COLLADA>')
    with pytest.raises(ValueError):
        load_dae(str(p))


def test_mesh_import_dispatch(tmp_path):
    from nrc_tpu.scene import scene_builder

    class Decl:
        kind = "assimp"
        path = _write(tmp_path, TRIANGLES)
        args = ()

    m = scene_builder._make_mesh(Decl())
    assert m.num_triangles == 2


TWO_PRIM = """<triangles count="1">
  <input semantic="VERTEX" source="#quad-verts" offset="0"/>
  <input semantic="NORMAL" source="#quad-nrm" offset="1"/>
  <p>0 0 1 0 2 0</p>
</triangles>
<triangles count="1">
  <input semantic="VERTEX" source="#quad-verts" offset="0"/>
  <input semantic="NORMAL" source="#quad-nrm" offset="1"/>
  <p>0 0 2 0 3 0</p>
</triangles>"""


def test_multi_primitive_normals_merge(tmp_path):
    """Normals from EVERY primitive block accumulate (a mesh split by
    material must not lose the first block's attributes)."""
    m = load_dae(_write(tmp_path, TWO_PRIM))
    assert m.indices.shape == (2, 3)
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4, atol=1e-6)


def test_rotated_instance_normals(tmp_path):
    """Normals rotate WITH the geometry (inverse-transpose, not inverse):
    right-handed R_x(90) maps y->z and z->-y, so the +z face normal goes to
    (0,-1,0) — the buggy n@inv(R).T form sent it to (0,+1,0)."""
    m = load_dae(_write(tmp_path, TRIANGLES, "<rotate>1 0 0 90</rotate>"))
    np.testing.assert_allclose(m.normals, [[0, -1, 0]] * 4, atol=1e-5)
    # geometry rotated the same way: vertex (1,1,0) -> (1,0,1)
    np.testing.assert_allclose(m.vertices[2], [1, 0, 1], atol=1e-5)
