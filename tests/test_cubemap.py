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
