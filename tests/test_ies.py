"""IES light profile tests (reference ``LoaderIES.cpp`` parse +
``Picture::createIES`` texture build + ``light_sample.cu:186-199``
modulation) using the reference's shipped ``data/test.ies`` asset."""

import os

import numpy as np
import pytest

from nrc_tpu.scene.ies import ies_to_texture, load_ies

TEST_IES = "/root/reference/data/test.ies"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(TEST_IES), reason="reference test.ies not present"
)


class TestLoader:
    def test_parse_header(self):
        d = load_ies(TEST_IES)
        assert d.photometric_type == 1  # Type C
        assert d.vertical_angles.shape == (19,)
        assert d.horizontal_angles.shape == (3,)
        assert d.candela.shape == (3, 19)
        # multiplier 0.025, ballast factors 1 * 1
        np.testing.assert_allclose(d.multiplier, 0.025)
        # first candela row starts 1730 1710 ... ends 935
        assert d.candela[0, 0] == 1730.0 and d.candela[0, -1] == 935.0

    def test_texture_nadir_and_zenith(self):
        d = load_ies(TEST_IES)
        tex = ies_to_texture(d, width=64, height=64)
        assert tex.shape == (64, 64)
        assert np.all(np.isfinite(tex)) and tex.min() >= 0.0
        # vertical angle ~0 (row 0): candela 1730 * 0.025 = 43.25 for all phi
        np.testing.assert_allclose(tex[0], 1730 * 0.025, rtol=0.02)
        # vertical angle ~180 (last row): 935 * 0.025 (texel center sits at
        # ~178.6 deg, so allow the interpolation slack)
        np.testing.assert_allclose(tex[-1], 935 * 0.025, rtol=0.05)
        # quadrant symmetry: phi and 360-phi columns match
        np.testing.assert_allclose(tex[:, 1], tex[:, -2], rtol=1e-5)

    def test_rotational_symmetry_file(self, tmp_path):
        p = tmp_path / "rot.ies"
        p.write_text(
            "IESNA91\nTILT=NONE\n"
            "1 -1 1.0 3 1 1 2 0 0 0\n1 1 0\n"
            "0 90 180\n0\n"
            "100 50 0\n"
        )
        d = load_ies(str(p))
        tex = ies_to_texture(d, width=16, height=32)
        # all columns identical (rotationally symmetric)
        np.testing.assert_allclose(
            tex, np.broadcast_to(tex[:, :1], tex.shape), rtol=1e-6
        )
        # nadir 100, horizon ~50, zenith 0 (texel centers are half a texel
        # inside the poles, hence the tolerance)
        np.testing.assert_allclose(tex[0, 0], 100.0, rtol=0.05)
        np.testing.assert_allclose(tex[-1, 0], 0.0, atol=2.0)


class TestRenderIntegration:
    def test_ies_modulates_nee(self, tmp_path):
        """A downward-only IES profile lights the floor but not the ceiling."""
        import dataclasses

        import jax.numpy as jnp

        from nrc_tpu.config import FrameConfig, RenderMode
        from nrc_tpu.render.integrator import trace_wavefront
        from nrc_tpu.render.scene_device import upload_scene
        from nrc_tpu.scene import geometry as geo
        from nrc_tpu.scene.ies import ies_to_texture, load_ies
        from nrc_tpu.scene.lights import (
            TYPE_LIGHT_IES,
            empty_light_table,
        )
        from nrc_tpu.scene.materials import Archetype, Material, MaterialTable
        from nrc_tpu.scene.scene_builder import Scene
        from nrc_tpu.scene.camera import Camera
        from nrc_tpu.utils import rng as R

        # downward-only profile: candela 100 for v in [0, 90], 0 above
        p = tmp_path / "down.ies"
        p.write_text(
            "IESNA91\nTILT=NONE\n"
            "1 -1 1.0 3 1 1 2 0 0 0\n1 1 0\n"
            "0 89 90\n0\n"
            "100 100 0\n"
        )
        tex = ies_to_texture(load_ies(str(p)))

        # Two single-plane scenes (indirect light impossible): a floor at
        # y=-1 facing up (inside the lit v<90 hemisphere) and a ceiling at
        # y=+1 facing down (v>90 hemisphere, candela 0). IES light at the
        # origin, local frame = world.
        def make_scene(y, flip_normals):
            plane = geo.transform_mesh(
                geo.create_plane(1, 1, 1), _translate(0.0, y, 0.0)
            )
            idx = plane.indices.astype(int)
            p0, p1, p2 = (plane.vertices[idx[:, k]] for k in range(3))
            n0, n1, n2 = (plane.normals[idx[:, k]].copy() for k in range(3))
            if flip_normals:
                n0 *= -1
                n1 *= -1
                n2 *= -1
            uv = np.zeros((p0.shape[0], 2), np.float32)
            mats = [Material(name="white", archetype=Archetype.DIFFUSE_REFLECTION,
                             albedo=(0.8, 0.8, 0.8))]
            lt = dataclasses.replace(
                empty_light_table(),
                type=np.asarray([TYPE_LIGHT_IES], np.int32),
                matrix=np.eye(4, dtype=np.float32)[None],
                matrix_inv=np.eye(4, dtype=np.float32)[None],
                emission=np.asarray([[1.0, 1.0, 1.0]], np.float32),
                area=np.ones(1, np.float32),
                inv_integral=np.zeros(1, np.float32),
                spot_angle_half=np.zeros(1, np.float32),
                spot_exponent=np.zeros(1, np.float32),
                material_id=np.full(1, -1, np.int32),
                tri_start=np.zeros(1, np.int32),
                tri_count=np.zeros(1, np.int32),
                ies_texture=tex[None],
                ies_index=np.zeros(1, np.int32),
            )
            return upload_scene(Scene(
                p0=p0, p1=p1, p2=p2, n0=n0, n1=n1, n2=n2,
                uv0=uv, uv1=uv, uv2=uv,
                material_id=np.zeros(p0.shape[0], np.int32),
                light_id=np.full(p0.shape[0], -1, np.int32),
                materials=MaterialTable.build(mats),
                material_rows=mats,
                lights=lt,
                camera=Camera(),
            ))

        cfg = FrameConfig(width=8, height=8, max_depth=2,
                          render_mode=RenderMode.NO_CACHE, train=False)
        n = 64
        seeds = R.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(1))
        org = jnp.tile(jnp.asarray([[3.0, 0.0, 0.0]], jnp.float32), (n, 1))

        d_floor = jnp.tile(
            jnp.asarray([[-3.0, -1.0, 0.0]] / np.linalg.norm([3, 1, 0]), jnp.float32),
            (n, 1),
        )
        rad_floor = np.asarray(trace_wavefront(
            make_scene(-1.0, False), org, d_floor, seeds, cfg, train=False
        ).radiance)

        d_ceil = jnp.tile(
            jnp.asarray([[-3.0, 1.0, 0.0]] / np.linalg.norm([3, 1, 0]), jnp.float32),
            (n, 1),
        )
        rad_ceil = np.asarray(trace_wavefront(
            make_scene(1.0, True), org, d_ceil, seeds, cfg, train=False
        ).radiance)

        # floor point under the light: albedo/pi * candela/d^2 = 0.8*100/pi
        np.testing.assert_allclose(
            rad_floor.mean(), 0.8 * 100.0 / np.pi, rtol=0.05
        )
        # ceiling sees the v>90 hemisphere of the profile -> zero direct
        assert rad_ceil.mean() < 1e-3, rad_ceil.mean()


def _translate(x, y, z):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [x, y, z]
    return m
