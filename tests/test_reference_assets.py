"""Completeness sweep: every asset the reference ships must load.

The reference's sample materials (`/root/reference/data/mdl/*.mdl`) define
the MDL language subset the parametric material system must cover
(SURVEY.md §2.3 'MDL compile service'); its scene files define the scene
DSL surface. Any new .mdl construct or scene keyword that stops parsing
shows up here.
"""

import glob
import os

import pytest

REF = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference assets not mounted"
)


def test_every_reference_mdl_parses():
    from nrc_tpu.scene.mdl import load_material

    paths = sorted(glob.glob(f"{REF}/mdl/*.mdl"))
    assert len(paths) >= 69  # the shipped set; grows only
    for p in paths:
        name = os.path.splitext(os.path.basename(p))[0]
        mat = load_material((REF,), "mdl/" + os.path.basename(p), name)
        assert mat is not None, name


@pytest.mark.parametrize(
    "sysf,scnf",
    [
        ("system_mdl_cornell.txt", "scene_mdl_cornell_friends.txt"),
        ("system_mdl_demo.txt", "scene_mdl_demo.txt"),
    ],
)
def test_reference_scene_loads(sysf, scnf):
    from nrc_tpu.scene.scene_builder import load_scene

    scene, system = load_scene(f"{REF}/{sysf}", f"{REF}/{scnf}")
    assert scene.num_triangles > 0
    assert scene.camera is not None
