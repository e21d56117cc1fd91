"""Layered/mixed/modified material tests (MDL combinators -> two-lobe
blend family; reference JIT-compiles these graphs per material, we
normalize them at load: ``nrc_tpu/ops/layered.py``, ``scene/mdl.py``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nrc_tpu.ops import bsdf as B
from nrc_tpu.ops import layered as LY
from nrc_tpu.scene.materials import Archetype
from nrc_tpu.scene.mdl import parse_mdl_material

REF = "/root/reference/data/mdl"


def _params(arch, albedo=(1.0, 1.0, 1.0), rough=(0.1, 0.1), n=4):
    return B.MaterialParams(
        archetype=jnp.full((n,), int(arch), jnp.int32),
        albedo=jnp.tile(jnp.asarray(albedo), (n, 1)),
        roughness=jnp.tile(jnp.asarray(rough), (n, 1)),
        ior=jnp.full((n,), 1.5),
        thin_walled=jnp.zeros((n,), jnp.int32),
    )


def _blend(mode=LY.BLEND_FIXED, w1=(0.5,) * 3, ior=1.5, n=4,
           mod_mode=LY.MOD_NONE, mod_a=(1.0,) * 3, mod_b=(1.0,) * 3,
           mod_exp=1.0, curve=None):
    if curve is None:
        curve = np.ones((LY.CURVE_RES, 3), np.float32)
    w1 = np.asarray(w1, np.float32)
    return LY.BlendParams(
        blend_mode=jnp.full((n,), mode, jnp.int32),
        w1=jnp.tile(jnp.asarray(w1), (n, 1)),
        w2=jnp.tile(jnp.asarray(1.0 - w1), (n, 1)),
        blend_ior=jnp.full((n,), ior),
        curve=jnp.tile(jnp.asarray(curve)[None], (n, 1, 1)),
        mod_mode=jnp.full((n,), mod_mode, jnp.int32),
        mod_a=jnp.tile(jnp.asarray(mod_a), (n, 1)),
        mod_b=jnp.tile(jnp.asarray(mod_b), (n, 1)),
        mod_exp=jnp.full((n,), mod_exp),
    )


WO = jnp.tile(jnp.asarray([[0.0, 0.6, 0.8]]), (4, 1))
NS = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))


class TestBlendWeights:
    def test_fixed(self):
        w1, w2, p1 = LY.blend_weights(_blend(w1=(0.3,) * 3), jnp.full((4,), 0.8))
        assert np.allclose(np.asarray(w1), 0.3)
        assert np.allclose(np.asarray(w2), 0.7)
        assert np.all(np.asarray(p1) > 0.0) and np.all(np.asarray(p1) < 1.0)

    def test_fresnel_grows_at_grazing(self):
        bp = _blend(mode=LY.BLEND_FRESNEL, w1=(1.0,) * 3, ior=1.5)
        w_n, _, _ = LY.blend_weights(bp, jnp.full((4,), 1.0))
        w_g, _, _ = LY.blend_weights(bp, jnp.full((4,), 0.05))
        assert np.asarray(w_n)[0, 0] == pytest.approx(0.04, abs=0.01)
        assert np.asarray(w_g)[0, 0] > 0.5

    def test_single_lobe(self):
        w1, w2, p1 = LY.blend_weights(_blend(mode=LY.BLEND_NONE), jnp.full((4,), 0.7))
        assert np.allclose(np.asarray(w1), 1.0)
        assert np.allclose(np.asarray(w2), 0.0)
        assert np.allclose(np.asarray(p1), 1.0)

    def test_curve(self):
        curve = np.zeros((LY.CURVE_RES, 3), np.float32)
        curve[:, 0] = np.linspace(0.0, 1.0, LY.CURVE_RES)  # red ramps w/ angle
        bp = _blend(mode=LY.BLEND_CURVE, w1=(1.0,) * 3, curve=curve)
        w_n, _, _ = LY.blend_weights(bp, jnp.full((4,), 1.0))   # theta=0
        w_g, _, _ = LY.blend_weights(bp, jnp.full((4,), 0.0))   # theta=pi/2
        assert np.asarray(w_n)[0, 0] == pytest.approx(0.0, abs=1e-5)
        assert np.asarray(w_g)[0, 0] == pytest.approx(1.0, abs=1e-5)


class TestModifiers:
    def test_directional_factor_endpoints(self):
        bp = _blend(mod_mode=LY.MOD_DIRECTIONAL, mod_a=(1, 0, 0), mod_b=(0, 1, 0))
        f_n = np.asarray(LY.modifier_factor(bp, jnp.full((4,), 1.0)))
        f_g = np.asarray(LY.modifier_factor(bp, jnp.full((4,), 0.0)))
        assert np.allclose(f_n[0], [1, 0, 0], atol=1e-5)
        assert np.allclose(f_g[0], [0, 1, 0], atol=1e-5)

    def test_fresnel_conductor_range(self):
        n = jnp.tile(jnp.asarray([[2.7, 3.0, 3.3]]), (4, 1))
        k = jnp.tile(jnp.asarray([[0.5, 0.45, 0.4]]), (4, 1))
        for c in (0.0, 0.3, 1.0):
            f = np.asarray(LY.fresnel_conductor(jnp.full((4,), c), n, k))
            assert np.all(f >= 0.0) and np.all(f <= 1.0)
        # grazing reflectance -> 1
        f_g = np.asarray(LY.fresnel_conductor(jnp.full((4,), 0.001), n, k))
        assert np.all(f_g > 0.95)

    def test_thin_film_wavelength_dependence(self):
        bp = _blend(mod_mode=LY.MOD_THIN_FILM, mod_a=(1.5,) * 3, mod_exp=500.0)
        f = np.asarray(LY.modifier_factor(bp, jnp.full((4,), 0.9)))
        assert np.all(f >= 0.0) and np.all(f <= 1.0)
        assert f[0].std() > 0.01  # iridescence: rgb differ


class TestLayeredSampleEval:
    def test_single_lobe_matches_plain_bsdf(self):
        p1 = _params(Archetype.DIFFUSE_REFLECTION, (0.8, 0.6, 0.4))
        p2 = _params(Archetype.NULL_BSDF)
        bp = _blend(mode=LY.BLEND_NONE)
        xi = jnp.tile(jnp.asarray([[0.3, 0.4, 0.5, 0.6, 0.9]]), (4, 1))
        eta = jnp.ones((4,))
        s_l = LY.layered_sample(p1, p2, bp, WO, NS, NS, xi, eta, 1.5 * eta)
        s_p = B.bsdf_sample(p1, WO, NS, NS, xi[:, :4], eta, 1.5 * eta)
        assert np.allclose(np.asarray(s_l.wi), np.asarray(s_p.wi))
        assert np.allclose(
            np.asarray(s_l.bsdf_over_pdf), np.asarray(s_p.bsdf_over_pdf), atol=1e-5
        )
        assert np.allclose(np.asarray(s_l.pdf), np.asarray(s_p.pdf))

    def test_two_equal_diffuse_lobes_equal_one(self):
        # 50/50 mix of two identical diffuse lobes == the single lobe
        p = _params(Archetype.DIFFUSE_REFLECTION, (0.7, 0.7, 0.7))
        bp = _blend(w1=(0.5,) * 3)
        wi = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
        eta = jnp.ones((4,))
        e_l = LY.layered_eval(p, p, bp, WO, wi, NS, eta, 1.5 * eta)
        e_p = B.bsdf_eval(p, WO, wi, NS, eta, 1.5 * eta)
        assert np.allclose(np.asarray(e_l.bsdf), np.asarray(e_p.bsdf), atol=1e-6)
        assert np.allclose(np.asarray(e_l.pdf), np.asarray(e_p.pdf), atol=1e-6)

    def test_mixture_white_furnace(self):
        # 0.5/0.5 white diffuse + white GGX mixture: MC estimate of the
        # directional albedo integrates to ~<=1 and > 0.7 (energy sane)
        n = 4096
        p1 = _params(Archetype.DIFFUSE_REFLECTION, (1.0,) * 3, n=n)
        p2 = _params(Archetype.GGX_REFLECT, (1.0,) * 3, (0.3, 0.3), n=n)
        bp = _blend(w1=(0.5,) * 3, n=n)
        import jax

        key = jax.random.PRNGKey(0)
        xi = jax.random.uniform(key, (n, 5))
        wo = jnp.tile(jnp.asarray([[0.0, 0.6, 0.8]]), (n, 1))
        ns = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        eta = jnp.ones((n,))
        s = LY.layered_sample(p1, p2, bp, wo, ns, ns, xi, eta, 1.5 * eta)
        ok = np.asarray(s.event) != B.BSDF_EVENT_ABSORB
        w = np.asarray(s.bsdf_over_pdf)[:, 0] * ok
        mean = w.mean()
        assert 0.6 < mean <= 1.05, f"albedo {mean}"

    def test_aux_blend(self):
        p1 = _params(Archetype.SPECULAR_REFLECT, (1.0,) * 3, (0.0, 0.0))
        p2 = _params(Archetype.DIFFUSE_REFLECTION, (0.5, 0.5, 0.5))
        bp = _blend(w1=(0.25,) * 3)
        aux = LY.layered_aux(p1, p2, bp, WO, NS)
        assert np.allclose(np.asarray(aux.albedo_diffuse)[0], 0.375, atol=1e-5)
        assert np.allclose(np.asarray(aux.albedo_glossy)[0], 0.25, atol=1e-5)


class TestMDLCombinatorParse:
    def test_all_demo_combinators_parse(self):
        cases = {
            "layer_weighted": (Archetype.SPECULAR_REFLECT,
                               Archetype.DIFFUSE_REFLECTION, LY.BLEND_FIXED),
            "layer_fresnel": (Archetype.SPECULAR_REFLECT,
                              Archetype.DIFFUSE_REFLECTION, LY.BLEND_FRESNEL),
            "layer_measured_curve": (Archetype.SPECULAR_REFLECT,
                                     Archetype.DIFFUSE_REFLECTION, LY.BLEND_CURVE),
            "mixer_normalized": (Archetype.SPECULAR_REFLECT,
                                 Archetype.DIFFUSE_REFLECTION, LY.BLEND_FIXED),
            "mixer_clamped_color": (Archetype.SPECULAR_REFLECT,
                                    Archetype.DIFFUSE_REFLECTION, LY.BLEND_FIXED),
        }
        for name, (a1, a2, bm) in cases.items():
            m = parse_mdl_material(f"{REF}/{name}.mdl")
            assert m.archetype == a1, name
            assert m.archetype2 == a2, name
            assert m.blend_mode == bm, name

    def test_weight_values(self):
        m = parse_mdl_material(f"{REF}/layer_weighted.mdl")
        assert m.blend_w1 == pytest.approx((0.5,) * 3)
        assert m.blend_w2 == pytest.approx((0.5,) * 3)
        m = parse_mdl_material(f"{REF}/layer_fresnel.mdl")
        assert m.blend_ior == pytest.approx(1.5)
        m = parse_mdl_material(f"{REF}/layer_measured_curve.mdl")
        assert len(m.curve_values) == 3
        assert m.curve_values[0] == pytest.approx((0.0, 0.0, 1.0))

    def test_tint_folds_into_albedo(self):
        m = parse_mdl_material(f"{REF}/modifier_tint.mdl")
        assert m.archetype == Archetype.DIFFUSE_REFLECTION
        assert m.archetype2 == Archetype.NULL_BSDF
        # parTint (0.5,1,0.5) * parDiffuseTint (0.98,0.73,0.47)
        assert m.albedo == pytest.approx((0.490196, 0.729412, 0.235294), abs=1e-4)

    def test_modifiers(self):
        m = parse_mdl_material(f"{REF}/modifier_directional_factor.mdl")
        assert m.mod_mode == LY.MOD_DIRECTIONAL
        assert m.mod_a == pytest.approx((1.0, 0.0, 0.0))
        assert m.mod_b == pytest.approx((0.0, 1.0, 0.0))
        m = parse_mdl_material(f"{REF}/modifier_fresnel_factor.mdl")
        assert m.mod_mode == LY.MOD_FRESNEL_COND
        assert m.mod_a == pytest.approx((2.7, 3.0, 3.3))
        assert m.mod_b[0] == pytest.approx(np.exp(-0.7), abs=1e-4)
        m = parse_mdl_material(f"{REF}/modifier_thin_film.mdl")
        assert m.mod_mode == LY.MOD_THIN_FILM
        assert m.mod_exp == pytest.approx(500.0)
        m = parse_mdl_material(f"{REF}/modifier_measured_curve_factor.mdl")
        assert m.mod_mode == LY.MOD_CURVE
        assert len(m.curve_values) == 5


class TestLayeredRender:
    def test_layered_nee_consistency(self):
        # weighted specular-over-diffuse plane lit by a constant env:
        # NEE+MIS must agree with brute-force BSDF sampling
        from tests.test_textures import _render_scene

        scn = (
            "center 0 0 0\ncamera 0.75 0.4 45 4\n"
            "push\nemission 1 1 1\nemissionMultiplier 1\nlight env\npop\n"
            'mdl lay lay "mdl/layer_weighted.mdl"\n'
            "push\nscale 2 2 1\nmodel plane 4 4 2 lay\npop\n"
        )
        img_nee = _render_scene(scn, res=24, spp=16, max_depth=3)
        img_brute = _render_scene(scn, res=24, spp=64, max_depth=3,
                                  direct_lighting=False)
        m_nee, m_brute = img_nee.mean(), img_brute.mean()
        assert m_nee > 0.0
        assert abs(m_nee - m_brute) / m_brute < 0.2, f"{m_nee} vs {m_brute}"
