"""End-to-end hair rendering: synthetic strand patch through the wavefront
integrator (curve intersection + chiang BSDF + shadows), and reference
scene_mdl_hair.txt loading."""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from nrc_tpu.config import FrameConfig, RenderMode
from nrc_tpu.render.integrator import trace_wavefront
from nrc_tpu.render.scene_device import upload_scene
from nrc_tpu.scene import geometry as geo
from nrc_tpu.scene.hair import CurveSegments
from nrc_tpu.scene.lights import TYPE_LIGHT_ENV_CONST, empty_light_table
from nrc_tpu.scene.materials import Archetype, Material, MaterialTable
from nrc_tpu.scene.scene_builder import Scene
from nrc_tpu.scene.camera import Camera
from nrc_tpu.utils import rng as R


def strand_patch(num=64, r=0.02):
    """Vertical strands on a grid above a plane, as segment soup."""
    g = int(np.sqrt(num))
    xs, zs = np.meshgrid(np.linspace(-0.8, 0.8, g), np.linspace(-0.8, 0.8, g))
    roots = np.stack([xs.ravel(), np.full(g * g, -1.0), zs.ravel()], -1)
    k = roots.shape[0]
    pa = roots.astype(np.float32)
    pb = (roots + [0.0, 1.2, 0.0]).astype(np.float32)
    return CurveSegments(
        pa=pa, pb=pb,
        ra=np.full(k, r, np.float32), rb=np.full(k, r * 0.3, np.float32),
        u_a=np.zeros(k, np.float32), u_b=np.ones(k, np.float32),
        reference=np.tile([[0.0, 0.0, 1.0]], (k, 1)).astype(np.float32),
        color_a=np.ones((k, 3), np.float32), color_b=np.ones((k, 3), np.float32),
        strand=np.arange(k, dtype=np.int32),
        material_id=np.ones(k, np.int32),  # material 1 = hair
    )


def build_scene():
    plane = geo.transform_mesh(geo.create_plane(1, 1, 1), _translate(0, -1, 0))
    idx = plane.indices.astype(int)
    p0, p1, p2 = (plane.vertices[idx[:, k]] for k in range(3))
    n0, n1, n2 = (plane.normals[idx[:, k]] for k in range(3))
    uv = np.zeros((p0.shape[0], 2), np.float32)
    mats = [
        Material(name="floor", archetype=Archetype.DIFFUSE_REFLECTION,
                 albedo=(0.6, 0.6, 0.6)),
        Material(name="hair", archetype=Archetype.HAIR,
                 albedo=(0.9, 0.7, 0.4),
                 hair_absorption=(0.05, 0.3, 0.6),
                 hair_diffuse_weight=0.1),
    ]
    lt = dataclasses.replace(
        empty_light_table(),
        type=np.asarray([TYPE_LIGHT_ENV_CONST], np.int32),
        matrix=np.eye(4, dtype=np.float32)[None],
        matrix_inv=np.eye(4, dtype=np.float32)[None],
        emission=np.asarray([[1.0, 1.0, 1.0]], np.float32),
        area=np.zeros(1, np.float32),
        inv_integral=np.zeros(1, np.float32),
        spot_angle_half=np.zeros(1, np.float32),
        spot_exponent=np.zeros(1, np.float32),
        material_id=np.full(1, -1, np.int32),
        tri_start=np.zeros(1, np.int32),
        tri_count=np.zeros(1, np.int32),
    )
    return Scene(
        p0=p0, p1=p1, p2=p2, n0=n0, n1=n1, n2=n2,
        uv0=uv, uv1=uv, uv2=uv,
        material_id=np.zeros(p0.shape[0], np.int32),
        light_id=np.full(p0.shape[0], -1, np.int32),
        materials=MaterialTable.build(mats),
        material_rows=mats,
        lights=lt,
        camera=Camera(),
        curves=strand_patch(),
    )


def _translate(x, y, z):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [x, y, z]
    return m


class TestHairWavefront:
    def test_render_finite_and_hair_visible(self):
        dev = upload_scene(build_scene())
        assert dev.curves is not None and dev.curve_bvh is not None
        cfg = FrameConfig(width=8, height=8, max_depth=4,
                          render_mode=RenderMode.NO_CACHE, train=False)
        n = 256
        # rays from the front along -z at strand-column x positions (strands
        # are vertical, so these rays pass through fibers) and varying height
        grid_x = np.linspace(-0.8, 0.8, 8)
        xs = np.tile(grid_x, n // 8)
        ys = np.repeat(np.linspace(-0.5, 0.1, n // 8), 8)
        org = np.stack([xs, ys, np.full(n, 3.0)], -1).astype(np.float32)
        d = np.tile([[0.0, 0.0, -1.0]], (n, 1)).astype(np.float32)
        seeds = R.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(9))
        out = trace_wavefront(dev, jnp.asarray(org), jnp.asarray(d), seeds, cfg,
                              train=False)
        rad = np.asarray(out.radiance)
        assert np.all(np.isfinite(rad))
        assert rad.mean() > 0.01
        # hair tint: absorption higher in blue -> red-dominant bounce light
        tot = rad.sum(0)
        assert tot[0] > tot[2], tot

    def test_training_wavefront_emits_hair_records(self):
        dev = upload_scene(build_scene())
        cfg = FrameConfig(width=8, height=8, max_depth=4, train=True)
        n = 64
        # aim straight at strand columns at mid-height
        grid_x = np.linspace(-0.8, 0.8, 8)
        org = np.stack(
            [np.tile(grid_x, 8), np.repeat(np.linspace(-0.6, 0.0, 8), 8),
             np.full(n, 3.0)], -1
        ).astype(np.float32)
        d = np.tile([[0.0, 0.0, -1.0]], (n, 1)).astype(np.float32)
        seeds = R.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(3))
        out = trace_wavefront(dev, jnp.asarray(org), jnp.asarray(d), seeds, cfg,
                              train=True)
        assert np.all(np.isfinite(np.asarray(out.rec_target)))
        assert int(np.asarray(out.rec_count).sum()) > 0


HAIR_SCENE = "/root/reference/data/scene_mdl_hair.txt"
HAIR_SYS = "/root/reference/data/system_mdl_hair.txt"


@pytest.mark.skipif(not os.path.isfile(HAIR_SCENE), reason="hair scene absent")
class TestReferenceHairScene:
    def test_loads(self):
        from nrc_tpu.scene.scene_builder import load_scene

        scene, system = load_scene(HAIR_SYS, HAIR_SCENE)
        assert scene.curves is not None and scene.curves.num > 100_000
        hair_mats = [m for m in scene.material_rows
                     if m.archetype == Archetype.HAIR]
        assert hair_mats, [m.archetype for m in scene.material_rows]
        assert scene.num_triangles > 0  # the base sphere
