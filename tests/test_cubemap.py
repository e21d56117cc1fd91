"""True cube-map sampling: direction -> face/uv lookup + the cube-env
render path (the reference samples cube maps via cudaTextureCubemap
objects, ``Device.cpp:3014-3283`` / ``texture_lookup.h``; round 1 loaded
cube DDS faces but sampled them as a flat strip)."""

import struct

import numpy as np
import jax.numpy as jnp

from nrc_tpu.ops.texture import cube_face_uv, sample_cube_env


def _write_cube_dds(path, faces):
    """Minimal uncompressed RGBA8 cube DDS (all 6 faces, no mips)."""
    f6, h, w, _ = faces.shape
    assert f6 == 6
    DDSD = 0x1 | 0x2 | 0x4 | 0x1000  # caps|height|width|pixelformat
    DDPF_RGB, DDPF_ALPHAPIXELS = 0x40, 0x1
    DDSCAPS_COMPLEX, DDSCAPS_TEXTURE = 0x8, 0x1000
    DDSCAPS2_CUBEMAP = 0x200
    ALL_FACES = 0x400 | 0x800 | 0x1000 | 0x2000 | 0x4000 | 0x8000
    header = struct.pack(
        "<4s7I44x2I4s5I4I4x",
        b"DDS ", 124, DDSD, h, w, w * 4, 0, 0,
        32, DDPF_RGB | DDPF_ALPHAPIXELS, b"\0\0\0\0", 32,
        0x000000FF, 0x0000FF00, 0x00FF0000, 0xFF000000,
        DDSCAPS_COMPLEX | DDSCAPS_TEXTURE, DDSCAPS2_CUBEMAP | ALL_FACES,
        0, 0,
    )
    assert len(header) == 128, len(header)
    u8 = np.clip(faces * 255.0 + 0.5, 0, 255).astype(np.uint8)
    with open(path, "wb") as fh:
        fh.write(header)
        fh.write(u8.tobytes())


FACE_COLORS = np.asarray(
    [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [1, 0, 1], [0, 1, 1]],
    np.float32,
)


def _solid_cube(h=8):
    faces = np.zeros((6, h, h, 4), np.float32)
    faces[..., :3] = FACE_COLORS[:, None, None, :]
    faces[..., 3] = 1.0
    return faces


class TestFaceUV:
    def test_axis_directions_hit_face_centers(self):
        dirs = jnp.asarray(
            [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1],
             [0, 0, -1]], jnp.float32,
        )
        face, u, v = cube_face_uv(dirs)
        np.testing.assert_array_equal(np.asarray(face), np.arange(6))
        np.testing.assert_allclose(np.asarray(u), 0.5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v), 0.5, atol=1e-6)

    def test_hand_computed_offsets(self):
        # d = (1, 0.5, -0.5): +X face, u = -z/|x| -> 0.5 -> (0.5+1)/2 = 0.75,
        # v = -y/|x| = -0.5 -> 0.25
        face, u, v = cube_face_uv(jnp.asarray([[1.0, 0.5, -0.5]]))
        assert int(face[0]) == 0
        np.testing.assert_allclose(float(u[0]), 0.75, atol=1e-6)
        np.testing.assert_allclose(float(v[0]), 0.25, atol=1e-6)
        # d = (0.2, 1, 0.4): +Y face, u = x/|y| = 0.2 -> 0.6, v = z/|y| -> 0.7
        face, u, v = cube_face_uv(jnp.asarray([[0.2, 1.0, 0.4]]))
        assert int(face[0]) == 2
        np.testing.assert_allclose(float(u[0]), 0.6, atol=1e-6)
        np.testing.assert_allclose(float(v[0]), 0.7, atol=1e-6)

    def test_sample_solid_faces(self):
        cube = jnp.asarray(_solid_cube()[..., :3])
        dirs = jnp.asarray(
            [[1, 0.2, -0.1], [-1, 0.3, 0.2], [0.1, 1, 0], [0, -1, 0.4],
             [0.2, -0.3, 1], [-0.2, 0.1, -1]], jnp.float32,
        )
        got = np.asarray(sample_cube_env(cube, dirs))
        np.testing.assert_allclose(got, FACE_COLORS, atol=1e-6)


class TestCubeEnvRender:
    def test_dds_roundtrip_and_env_lookup(self, tmp_path):
        from nrc_tpu.scene.dds_loader import load_dds

        p = str(tmp_path / "cube.dds")
        _write_cube_dds(p, _solid_cube())
        img = load_dds(p)
        assert img.shape == (6, 8, 8, 4)
        np.testing.assert_allclose(img[..., :3], _solid_cube()[..., :3],
                                   atol=1 / 255.0)

    def test_cube_env_scene_renders_face_colors(self, tmp_path):
        """NO_CACHE render with a cube env: escaping rays must return the
        face color of their direction (true cube lookup, not a strip)."""
        _write_cube_dds(str(tmp_path / "sky.dds"), _solid_cube())
        (tmp_path / "sys.txt").write_text(
            "resolution 16 16\nsamplesSqrt 1\npathLengths 2 4\n"
            "camera 45 45 100 4\ncenter 0 0 0\n"
            f'searchPath "{tmp_path}"\n'
            'searchPath "/root/reference/data"\n'
        )
        (tmp_path / "scene.txt").write_text(
            'emissionTexture "sky.dds"\n'
            'light env\n'
            'mdl diffuse bsdf_diffuse_reflection '
            '"mdl/bsdf_diffuse_reflection.mdl"\n'
            'push\nidentity\nscale 0.5 0.5 0.5\nmodel box diffuse\npop\n'
        )
        from nrc_tpu.config import RenderMode
        from nrc_tpu.render.renderer import Renderer
        from nrc_tpu.scene.scene_builder import load_scene

        scene, system = load_scene(
            str(tmp_path / "sys.txt"), str(tmp_path / "scene.txt")
        )
        assert scene.lights.env_cube is not None
        r = Renderer(scene, system, render_mode=RenderMode.NO_CACHE,
                     train=False, adaptive_tiles=False)
        r.render_frame()
        img = r.image_hdr()
        assert np.all(np.isfinite(img))
        # background (border) pixels are exact face colors; center shows
        # the env-lit box
        border = np.concatenate(
            [img[:2].reshape(-1, 3), img[-2:].reshape(-1, 3),
             img[:, :2].reshape(-1, 3), img[:, -2:].reshape(-1, 3)]
        )
        flat = border
        d = np.min(
            np.linalg.norm(flat[:, None, :] - FACE_COLORS[None], axis=-1),
            axis=1,
        )
        assert float(d.max()) < 2e-2, float(d.max())
        # and MORE than one face is visible across the frame
        nearest = np.argmin(
            np.linalg.norm(flat[:, None, :] - FACE_COLORS[None], axis=-1),
            axis=1,
        )
        assert len(np.unique(nearest)) >= 2


class TestCubeImportanceSampling:
    """Importance tables from the ACTUAL cube faces (VERDICT r3 missing #3;
    reference never builds cube CDFs — ``Texture.cpp:1046-1050`` runs
    ``calculateSphericalCDF`` only for equirect ENV textures)."""

    def test_dir_from_face_uv_inverts_face_uv(self):
        from nrc_tpu.ops.texture import cube_dir_from_face_uv

        rng = np.random.default_rng(7)
        d = rng.normal(size=(512, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        face, u, v = cube_face_uv(jnp.asarray(d))
        back = np.asarray(cube_dir_from_face_uv(face, u, v))
        np.testing.assert_allclose(back, d, atol=1e-5)

    def test_texel_solid_angles_sum_to_sphere(self):
        from nrc_tpu.scene.lights import cube_texel_solid_angles

        for h, w in ((8, 8), (5, 9)):
            omega = cube_texel_solid_angles(h, w)
            assert omega.shape == (h, w)
            assert np.all(omega > 0)
            # one face covers 1/6 of the sphere
            np.testing.assert_allclose(omega.sum(), 4 * np.pi / 6, rtol=1e-6)

    def test_sampled_density_matches_face_luminance(self):
        """Sampling density must track the ACTUAL face texels: a cube with
        one bright texel draws samples into that texel in proportion to its
        intensity x solid-angle weight, and the reported pdf agrees with
        the miss-path env_radiance pdf at the sampled directions."""
        from nrc_tpu.ops.light_sampling import (
            env_radiance, sample_lights, upload_lights,
        )
        from nrc_tpu.ops.texture import cube_face_uv as face_uv
        from nrc_tpu.scene.lights import (
            LightTable, TYPE_LIGHT_ENV_SPHERE, build_cube_env_weights,
            empty_light_table,
        )
        import dataclasses
        import jax

        hc = 8
        cube = np.full((6, hc, hc, 3), 0.05, np.float32)
        cube[3, 2, 5] = 20.0  # one bright texel on -Y
        lt = empty_light_table()
        lt = dataclasses.replace(
            lt,
            type=np.asarray([TYPE_LIGHT_ENV_SPHERE], np.int32),
            matrix=np.eye(4, dtype=np.float32)[None],
            matrix_inv=np.eye(4, dtype=np.float32)[None],
            emission=np.ones((1, 3), np.float32),
            area=np.zeros((1,), np.float32),
            inv_integral=np.zeros((1,), np.float32),
            spot_angle_half=np.zeros((1,), np.float32),
            spot_exponent=np.zeros((1,), np.float32),
            material_id=np.full((1,), -1, np.int32),
            tri_start=np.zeros((1,), np.int32),
            tri_count=np.zeros((1,), np.int32),
            env_texture=np.zeros((4, 8, 3), np.float32),  # display proxy
            env_cube=cube,
        )
        weights, integral = build_cube_env_weights(cube)
        lt.inv_integral[0] = 1.0 / integral
        lights = upload_lights(lt)

        n = 20000
        key = jax.random.PRNGKey(0)
        xi = jax.random.uniform(key, (n, 4))
        pos = jnp.zeros((n, 3))
        ls = sample_lights(lights, pos, xi)
        d = np.asarray(ls.direction)
        pdf = np.asarray(ls.pdf)
        assert np.all(pdf > 0)

        # fraction of samples in the bright texel ~ its weight share
        face, u, v = (np.asarray(x) for x in face_uv(jnp.asarray(d)))
        tx = np.clip((u * hc).astype(np.int32), 0, hc - 1)
        ty = np.clip((v * hc).astype(np.int32), 0, hc - 1)
        in_bright = (face == 3) & (ty == 2) & (tx == 5)
        share = weights[3, 2, 5] / weights.sum()
        got = in_bright.mean()
        assert abs(got - share) < 0.15 * share, (got, share)

        # pdf reported by NEE == pdf env_radiance computes for MIS
        em, pdf_miss, has = env_radiance(lights, jnp.asarray(d))
        np.testing.assert_allclose(
            pdf, np.asarray(pdf_miss), rtol=1e-5, atol=1e-7
        )
        # and it equals intensity * invIntegral of the true texel
        want = cube.mean(axis=-1)[face, ty, tx] / integral
        np.testing.assert_allclose(pdf, want, rtol=1e-4)
