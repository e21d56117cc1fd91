"""Texture subsystem tests: atlas packing, bilinear lookup, MDL texture
parsing, and end-to-end textured-albedo / stochastic-cutout rendering
(reference: Picture/Texture loaders + MDL texture runtime + cutout anyhit,
``nrc/src/Texture.cpp``, ``nrc/shaders/hit.cu:1400-1468``)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrc_tpu.config import FrameConfig, RenderMode
from nrc_tpu.ops.texture import apply_uv_transform, sample_bilinear
from nrc_tpu.scene.mdl import parse_mdl_material
from nrc_tpu.scene.texture import TextureAtlas, build_mip_chain

REF = "/root/reference/data"
TEX = f"{REF}/mdl/textures"


class TestAtlas:
    def test_dedup_and_levels(self):
        atlas = TextureAtlas.empty()
        a = atlas.add(f"{TEX}/rgby_2x2.png", srgb=True)
        b = atlas.add(f"{TEX}/circle.png", srgb=False)
        assert atlas.add(f"{TEX}/rgby_2x2.png", srgb=True) == a
        assert atlas.add(f"{TEX}/rgby_2x2.png", srgb=False) == 2  # new gamma
        assert int(atlas.tex_num_levels[a]) == 2   # 2x2 -> 1x1
        assert int(atlas.tex_num_levels[b]) == 11  # 1024 -> 1
        assert atlas.num_textures == 3

    def test_mip_chain_box_filter(self):
        img = np.zeros((4, 4, 4), np.float32)
        img[:2, :2] = 1.0
        chain = build_mip_chain(img)
        assert [c.shape[:2] for c in chain] == [(4, 4), (2, 2), (1, 1)]
        assert chain[1][0, 0, 0] == pytest.approx(1.0)
        assert chain[2][0, 0, 0] == pytest.approx(0.25)

    def test_odd_dims(self):
        img = np.random.rand(5, 3, 4).astype(np.float32)
        chain = build_mip_chain(img)
        assert chain[-1].shape[:2] == (1, 1)


class TestLookup:
    def test_texel_centers_and_fallback(self):
        atlas = TextureAtlas.empty()
        tid = atlas.add(f"{TEX}/rgby_2x2.png", srgb=True)
        dev = atlas.device_arrays()
        uv = jnp.array([[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]])
        out = np.asarray(sample_bilinear(dev, jnp.full((4,), tid, jnp.int32), uv))
        # each texel center is a pure primary/secondary color
        assert np.allclose(out.sum(-1) - out[:, 3], [1, 1, 1, 2], atol=1e-2)
        # tex_id -1 -> white
        none = sample_bilinear(dev, jnp.array([-1], jnp.int32), uv[:1])
        assert np.allclose(np.asarray(none), 1.0)

    def test_wrap_repeat(self):
        atlas = TextureAtlas.empty()
        tid = atlas.add(f"{TEX}/rgby_2x2.png", srgb=True)
        dev = atlas.device_arrays()
        t = jnp.full((1,), tid, jnp.int32)
        a = sample_bilinear(dev, t, jnp.array([[0.25, 0.25]]))
        b = sample_bilinear(dev, t, jnp.array([[2.25, -0.75]]))
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_uv_transform(self):
        xf = jnp.array([[2.0, 3.0, 0.1, -0.2, 1.0, 0.0]])
        out = apply_uv_transform(jnp.array([[0.25, 0.5]]), xf)
        assert np.allclose(np.asarray(out), [[0.6, 1.3]], atol=1e-6)
        # 90deg rotation about w
        xf_r = jnp.array([[1.0, 1.0, 0.0, 0.0, 0.0, 1.0]])
        out_r = apply_uv_transform(jnp.array([[1.0, 0.0]]), xf_r)
        assert np.allclose(np.asarray(out_r), [[0.0, 1.0]], atol=1e-6)


class TestMDLTextureParse:
    def test_diffuse_tex(self):
        m = parse_mdl_material(f"{REF}/mdl/bsdf_diffuse_reflection_tex.mdl")
        assert m.albedo_tex_path.endswith("logo_512.png")
        assert m.albedo_tex_srgb
        assert m.albedo == pytest.approx((0.980392, 0.729412, 0.470588), abs=1e-4)

    def test_cutout(self):
        m = parse_mdl_material(f"{REF}/mdl/bsdf_diffuse_reflection_cutout.mdl")
        assert m.cutout_tex_path.endswith("circle.png")
        assert m.cutout_opacity == 1.0
        assert m.thin_walled

    def test_edf_tex(self):
        m = parse_mdl_material(f"{REF}/mdl/edf_diffuse_tex.mdl")
        assert m.emission_tex_path.endswith("rgby_2x2.png")
        assert m.emission_intensity == pytest.approx((np.pi,) * 3, abs=1e-3)


def _render_scene(scene_text: str, res=32, spp=8, max_depth=3,
                  direct_lighting=True):
    from nrc_tpu.render.integrator import trace_wavefront
    from nrc_tpu.render.scene_device import upload_scene
    from nrc_tpu.scene.camera import generate_primary_rays
    from nrc_tpu.scene.scene_builder import load_scene
    from nrc_tpu.utils import rng as R

    with tempfile.TemporaryDirectory() as td:
        sys_file = os.path.join(td, "system.txt")
        scn_file = os.path.join(td, "scene.txt")
        with open(sys_file, "w") as f:
            f.write(
                "resolution 64 64\nsamplesSqrt 2\npathLengths 2 %d\n"
                "searchPath \"%s\"\n" % (max_depth, REF)
            )
        with open(scn_file, "w") as f:
            f.write(scene_text)
        scene, system = load_scene(sys_file, scn_file)

    dev = upload_scene(scene)
    cfg = FrameConfig(
        width=res, height=res, max_depth=max_depth,
        render_mode=RenderMode.NO_CACHE, train=False,
        direct_lighting=direct_lighting,
        has_textures=scene.materials.atlas.num_textures > 0,
        has_cutout=bool(
            np.min(scene.materials.cutout_opacity) < 1.0
            or np.max(scene.materials.cutout_tex) >= 0
        ),
        has_layered=bool(
            np.any(scene.materials.blend_mode != 0)
            or np.any(scene.materials.mod_mode != 0)
        ),
    )
    p, u, v, w = scene.camera.frustum()
    ys, xs = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    pix = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2), jnp.float32)

    @jax.jit
    def render(sample_idx):
        seeds = R.tea(
            jnp.arange(res * res, dtype=jnp.uint32), sample_idx.astype(jnp.uint32)
        )
        seeds, jitter = R.rng2(seeds)
        org, d = generate_primary_rays(
            pix, jitter, (res, res),
            jnp.asarray(p), jnp.asarray(u), jnp.asarray(v), jnp.asarray(w),
        )
        return trace_wavefront(dev, org, d, seeds, cfg, train=False).radiance

    acc = np.zeros((res * res, 3), np.float64)
    for i in range(spp):
        acc += np.asarray(render(jnp.uint32(i)), np.float64)
    return (acc / spp).reshape(res, res, 3)


CAMERA = "center 0 0 0\ncamera 0.75 0.5 45 4\n"
ENV = "push\nemission 1 1 1\nemissionMultiplier 1\nlight env\npop\n"


class TestTexturedRender:
    def test_cutout_passes_env_through(self):
        # A camera-facing cutout plane (circle.png: opaque disc, transparent
        # surround) in front of a constant env of radiance 1: pixels through
        # the transparent region see the env directly.
        img = _render_scene(
            CAMERA + ENV +
            'mdl cut cut "mdl/bsdf_diffuse_reflection_cutout.mdl"\n'
            "push\nscale 2 2 1\nmodel plane 4 4 2 cut\npop\n"
        )
        assert np.all(np.isfinite(img))
        near_env = np.abs(img.mean(-1) - 1.0) < 0.05
        frac = near_env.mean()
        # plane covers the whole frame; transparent fraction of circle.png
        # is ~63% (mono average 0.373)
        assert 0.3 < frac < 0.95, f"env-visible fraction {frac}"
        # the opaque disc reflects the env diffusely with the MDL tint: its
        # pixels differ from the env (tinted), so the image is not constant
        assert img.reshape(-1, 3).std(0).max() > 0.05

    def test_cutout_opacity_full_blocks(self):
        # same geometry, untextured opaque material: nothing passes through
        img = _render_scene(
            CAMERA + ENV +
            'mdl solid solid "mdl/bsdf_diffuse_reflection.mdl"\n'
            "push\nscale 2 2 1\nmodel plane 4 4 2 solid\npop\n"
        )
        # white diffuse under constant env: every pixel sees bounced light,
        # none sees the env at exactly 1.0 with direct visibility tint
        assert np.all(np.isfinite(img))

    def test_textured_albedo_varies(self):
        img = _render_scene(
            CAMERA + ENV +
            'mdl tex tex "mdl/bsdf_diffuse_reflection_tex.mdl"\n'
            "push\nscale 2 2 1\nmodel plane 4 4 2 tex\npop\n",
            spp=4,
        )
        assert np.all(np.isfinite(img))
        # logo texture modulates the plane: spatial variation well above noise
        center = img[8:24, 8:24]
        assert center.std() > 0.02, f"std {center.std()}"

    def test_textured_emission(self):
        img = _render_scene(
            CAMERA +
            'mdl etex etex "mdl/edf_diffuse_tex.mdl"\n'
            "push\nscale 2 2 1\nmodel plane 4 4 2 etex\npop\n",
            spp=4,
        )
        assert np.all(np.isfinite(img))
        # rgby quadrants emit distinct colors: per-channel maxima in
        # different pixels
        flat = img.reshape(-1, 3)
        assert flat.max() > 0.5
        argmaxes = {int(flat[:, c].argmax()) for c in range(3)}
        assert len(argmaxes) >= 2

    def test_textured_emission_nee_consistency(self):
        # a diffuse floor lit only by a textured emissive panel: NEE (which
        # samples the panel and must apply the texture at the sampled point)
        # and pure BSDF sampling estimate the same integral
        scn = (
            "center 0 0 0\ncamera 0.75 0.25 45 4\n"
            'mdl etex etex "mdl/edf_diffuse_tex.mdl"\n'
            'mdl floor floor "mdl/bsdf_diffuse_reflection.mdl"\n'
            "push\nscale 2 2 2\ntranslate 0 -1 0\nmodel plane 2 2 1 floor\npop\n"
            "push\nrotate 0 0 1 180\ntranslate 0 2 0\nmodel plane 2 2 1 etex\npop\n"
        )
        img_nee = _render_scene(scn, res=24, spp=32, max_depth=3)
        img_brute = _render_scene(
            scn, res=24, spp=256, max_depth=3, direct_lighting=False
        )
        # compare mean of the floor region (bottom half of image)
        m_nee = img_nee[12:].mean()
        m_brute = img_brute[12:].mean()
        assert m_nee > 0.0 and m_brute > 0.0
        assert abs(m_nee - m_brute) / max(m_brute, 1e-9) < 0.25, (
            f"NEE {m_nee} vs brute {m_brute}"
        )


class TestQuadAtlas:
    def test_quad_path_matches_four_corner_path(self):
        """The one-gather quad-row bilinear (production upload path) must be
        BIT-identical to the 4-corner fetch: the quad rows store exactly the
        wrap-neighbor texels the corner math addresses."""
        import jax
        from nrc_tpu.scene.texture import TextureAtlas
        from nrc_tpu.ops.texture import sample_bilinear

        rng = np.random.default_rng(4)
        atlas = TextureAtlas.empty()
        # hand-append two textures with mips (odd sizes exercise wrap)
        import nrc_tpu.scene.texture as ST

        for w, h in ((7, 5), (16, 16)):
            img = rng.random((h, w, 4)).astype(np.float32)
            chain = ST.build_mip_chain(img)
            base = atlas.level_offset.shape[0]
            offs, ws, hs = [], [], []
            off = atlas.texels.shape[0]
            blocks = []
            for lvl in chain:
                lh, lw, _ = lvl.shape
                offs.append(off); ws.append(lw); hs.append(lh)
                blocks.append(lvl.reshape(-1, 4))
                off += lh * lw
            atlas.texels = np.concatenate([atlas.texels] + blocks)
            atlas.level_offset = np.concatenate(
                [atlas.level_offset, np.asarray(offs, np.int32)])
            atlas.level_w = np.concatenate(
                [atlas.level_w, np.asarray(ws, np.int32)])
            atlas.level_h = np.concatenate(
                [atlas.level_h, np.asarray(hs, np.int32)])
            atlas.tex_level_base = np.concatenate(
                [atlas.tex_level_base, np.asarray([base], np.int32)])
            atlas.tex_num_levels = np.concatenate(
                [atlas.tex_num_levels, np.asarray([len(chain)], np.int32)])

        quad = atlas.device_arrays()            # has texels_quad
        host = {k: v for k, v in quad.items() if k != "texels_quad"}
        n = 512
        tex_id = jnp.asarray(rng.integers(-1, 2, n), jnp.int32)
        uv = jnp.asarray(rng.random((n, 2)) * 3.0 - 1.0)  # wraps both ways
        lod = jnp.asarray(rng.integers(0, 4, n), jnp.int32)
        for l in (None, lod):
            a = np.asarray(sample_bilinear(host, tex_id, uv, l))
            b = np.asarray(sample_bilinear(quad, tex_id, uv, l))
            np.testing.assert_array_equal(a, b)
