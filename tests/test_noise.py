"""Procedural noise materials (data/mdl/noise_*_glossy.mdl): the MDL base
module's perlin/flow/worley noise textures drive a diffuse tint — evaluated
at shade time in world space (ops/noise.py; the reference JIT-compiles the
MDL base module's noise in device code). Round 3 silently degraded these
three DEMO-SCENE materials to a white diffuse base."""

import numpy as np
import jax.numpy as jnp

from nrc_tpu.ops.noise import (
    NOISE_FLOW, NOISE_PERLIN, NOISE_WORLEY, fbm3, perlin3, worley3,
)
from nrc_tpu.scene.mdl import load_material

REF = ("/root/reference/data",)


class TestNoiseFields:
    def test_perlin_range_and_variation(self):
        rng = np.random.default_rng(0)
        p = jnp.asarray(rng.random((4096, 3)) * 20.0)
        n = np.asarray(perlin3(p))
        assert np.all(np.isfinite(n))
        assert n.min() >= -1.3 and n.max() <= 1.3
        assert n.std() > 0.1  # varies
        # lattice-continuous: nearby points give nearby values
        eps = 1e-3
        n2 = np.asarray(perlin3(p + eps))
        assert np.abs(n2 - n).max() < 0.05

    def test_fbm_normalized(self):
        rng = np.random.default_rng(1)
        p = jnp.asarray(rng.random((4096, 3)) * 10.0)
        for absolute in (False, True):
            v = np.asarray(fbm3(p, 3, absolute))
            assert v.min() >= -0.01 and v.max() <= 1.01, (absolute, v.min(), v.max())

    def test_worley_range(self):
        rng = np.random.default_rng(2)
        p = jnp.asarray(rng.random((4096, 3)) * 10.0)
        v = np.asarray(worley3(p))
        assert v.min() >= 0.0 and v.max() <= 1.0
        assert v.std() > 0.05


class TestNoiseMDLParse:
    def test_shipped_noise_materials(self):
        want = {
            "noise_perlin_glossy": (NOISE_PERLIN, (5.0, 5.0, 5.0), 0.5, 1.0),
            "noise_flow_glossy": (NOISE_FLOW, (1.0, 1.0, 1.0), None, None),
            "noise_worley_glossy": (NOISE_WORLEY, (5.0, 5.0, 5.0), 0.3, 0.9),
        }
        for name, (mode, scale, lo, hi) in want.items():
            rep = []
            m = load_material(REF, f"mdl/{name}.mdl", name, report=rep)
            assert m.noise_mode == mode, name
            assert m.noise_scale == scale, (name, m.noise_scale)
            if lo is not None:
                assert abs(m.noise_thr_low - lo) < 1e-6, name
                assert abs(m.noise_thr_high - hi) < 1e-6, name
            # the noisy diffuse is the BASE lobe of the fresnel layer
            assert m.noise_target == 1, name
            assert rep[0]["status"] == "ok"

    def test_noise_scene_renders_varying_color(self, tmp_path):
        """A noise material must produce spatially VARYING shading (round 3
        rendered these as flat white)."""
        (tmp_path / "sys.txt").write_text(
            "resolution 48 48\nsamplesSqrt 2\npathLengths 2 4\n"
            "camera 0 25 45 4\ncenter 0 0 0\n"
            'searchPath "/root/reference/data"\n'
        )
        (tmp_path / "scene.txt").write_text(
            "emission 1 1 1\nlight env\n"
            'mdl noise noise_perlin_glossy "mdl/noise_perlin_glossy.mdl"\n'
            "push\nidentity\nmodel sphere 90 45 1 noise\npop\n"
        )
        from nrc_tpu.config import RenderMode
        from nrc_tpu.render.renderer import Renderer
        from nrc_tpu.scene.scene_builder import load_scene

        scene, system = load_scene(
            str(tmp_path / "sys.txt"), str(tmp_path / "scene.txt")
        )
        assert int(np.max(scene.materials.noise_mode)) == NOISE_PERLIN
        r = Renderer(scene, system, render_mode=RenderMode.NO_CACHE,
                     train=False, adaptive_tiles=False)
        for _ in range(2):
            r.render_frame()
        img = np.asarray(r.image_hdr()).reshape(48, 48, 3)
        assert np.all(np.isfinite(img))
        # center crop = the sphere; noise_color (.1,.9,.3) vs base color(0)
        # must show green-dominant variation across the surface
        crop = img[12:36, 12:36]
        assert crop[..., 1].std() > 0.02, crop[..., 1].std()
        assert crop[..., 1].mean() > crop[..., 0].mean()


class TestNoiseBump:
    def test_bump_parse_and_perturbation(self):
        from nrc_tpu.ops.noise import NOISE_PERLIN, noise_bump_normal

        # shipped perlin/worley materials declare a bump (factor 2.)
        m = load_material(REF, "mdl/noise_perlin_glossy.mdl", "x")
        assert m.noise_bump_factor == 2.0
        m2 = load_material(REF, "mdl/noise_worley_glossy.mdl", "x")
        assert m2.noise_bump_factor == 2.0
        m3 = load_material(REF, "mdl/noise_flow_glossy.mdl", "x")
        assert m3.noise_bump_factor == 0.0  # no bump in the flow material

        rng = np.random.default_rng(3)
        n = 512
        pos = jnp.asarray(rng.random((n, 3)) * 10.0)
        ns = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
        mode = jnp.full((n,), NOISE_PERLIN, jnp.int32)
        args = (
            mode, pos, ns, jnp.asarray([5.0, 5.0, 5.0]), 3,
            jnp.zeros(n, jnp.int32), jnp.full(n, 0.0), jnp.full(n, 1.0),
            jnp.zeros(n, jnp.int32),
        )
        out = np.asarray(noise_bump_normal(*args, jnp.full(n, 2.0)))
        # unit normals, actually perturbed, varying across positions
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=-1), 1.0, atol=1e-5
        )
        assert np.abs(out - np.asarray(ns)).max() > 0.05
        assert out.std(axis=0).max() > 0.02
        # factor 0 returns ns untouched
        out0 = np.asarray(noise_bump_normal(*args, jnp.zeros(n)))
        np.testing.assert_array_equal(out0, np.asarray(ns))
