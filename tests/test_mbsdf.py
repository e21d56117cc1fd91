"""Measured-BSDF subsystem: CDF construction, trilinear eval, two-stage
sampling, pdf consistency, and the white-furnace energy check — against
analytic bakes (the reference ships no .mbsdf data; its MBSDF path lives in
the not-checked-out MDL SDK submodule)."""

import jax
import jax.numpy as jnp
import numpy as np

from nrc_tpu.ops import mbsdf as MB
from nrc_tpu.scene import mbsdf as MH

M_PI = float(np.pi)


def _tables(*measurements):
    host = MH.MBSDFTableHost.build(list(measurements))
    return MB.MBSDFTables(
        eval_data=jnp.asarray(host.eval),
        cdf_theta=jnp.asarray(host.cdf_theta),
        cdf_phi=jnp.asarray(host.cdf_phi),
        albedo=jnp.asarray(host.albedo),
        max_albedo=jnp.asarray(host.max_albedo),
        has_part=jnp.asarray(host.has_part),
    )


class TestConstruction:
    def test_lambert_cdfs(self):
        m = MH.bake_lambert((0.8, 0.8, 0.8), res_theta=16, res_phi=32)
        pd = MH.build_part(m.reflection)
        # constant f: phi CDF is uniform, theta CDF follows sin^2 bins
        np.testing.assert_allclose(
            pd.cdf_phi[3, 5], (np.arange(32) + 1) / 32, atol=1e-5
        )
        s = (M_PI / 2) / 16
        expect = np.sin((np.arange(16) + 1) * s) ** 2
        np.testing.assert_allclose(pd.cdf_theta[7], expect, atol=1e-5)
        # albedo rows equal (isotropic in theta_in) and positive
        assert np.allclose(pd.albedo, pd.albedo[0])
        assert pd.max_albedo > 0

    def test_eval_constant(self):
        t = _tables(MH.bake_lambert((0.6, 0.3, 0.1), 16, 32))
        n = 64
        k = jax.random.PRNGKey(0)
        tpi = jnp.stack(
            [jax.random.uniform(k, (n,)) * (M_PI / 2 * 0.98),
             (jax.random.uniform(jax.random.fold_in(k, 1), (n,)) * 2 - 1) * M_PI],
            -1,
        )
        tpo = jnp.stack(
            [jax.random.uniform(jax.random.fold_in(k, 2), (n,)) * (M_PI / 2 * 0.98),
             (jax.random.uniform(jax.random.fold_in(k, 3), (n,)) * 2 - 1) * M_PI],
            -1,
        )
        idx = jnp.zeros((n,), jnp.int32)
        part = jnp.zeros((n,), jnp.int32)
        f = MB.mbsdf_evaluate(t, idx, part, tpi, tpo)
        np.testing.assert_allclose(
            np.asarray(f), np.tile([[0.6, 0.3, 0.1]], (n, 1)) / M_PI, rtol=1e-4
        )
        # missing transmission part evaluates to zero
        f_t = MB.mbsdf_evaluate(t, idx, jnp.ones((n,), jnp.int32), tpi, tpo)
        assert np.all(np.asarray(f_t) == 0.0)


class TestSampling:
    def test_sample_pdf_consistency(self):
        """pdf(sampled direction) == pdf returned by sample."""
        t = _tables(MH.bake_ggx(alpha=0.4, res_theta=32, res_phi=64))
        n = 2048
        k = jax.random.PRNGKey(7)
        idx = jnp.zeros((n,), jnp.int32)
        part = jnp.zeros((n,), jnp.int32)
        tpo = jnp.stack(
            [jnp.full((n,), 0.7), jnp.full((n,), 0.3)], -1
        )
        xi = jax.random.uniform(k, (n, 2))
        theta, phi, pdf = MB.mbsdf_sample(t, idx, part, tpo, xi)
        assert np.all(np.asarray(theta) >= 0)
        tpi = jnp.stack([theta, phi], -1)
        pdf2 = MB.mbsdf_pdf(t, idx, part, tpi, tpo)
        a, b = np.asarray(pdf), np.asarray(pdf2)
        # continuous positions can straddle a bin edge; demand 97% exact
        match = np.isclose(a, b, rtol=1e-3)
        assert match.mean() > 0.97, f"pdf mismatch rate {1 - match.mean():.3f}"

    def test_furnace_lambert(self):
        """MC estimate of the directional albedo: E[f cos / pdf] = rho."""
        t = _tables(MH.bake_lambert((0.8, 0.8, 0.8), 32, 64))
        n = 8192
        k = jax.random.PRNGKey(11)
        nf = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        wo = jnp.tile(
            jnp.asarray([[np.sin(0.5), 0.0, np.cos(0.5)]]), (n, 1)
        )
        idx = jnp.zeros((n,), jnp.int32)
        mult = jnp.ones((n,))
        xi = jax.random.uniform(k, (n, 3))
        wi, w, pdf, is_trans, ok = MB.measured_sample(t, idx, mult, wo, nf, xi)
        assert bool(jnp.all(ok))
        assert not bool(jnp.any(is_trans))
        # wi on the upper hemisphere, unit length
        assert float(jnp.min(wi[:, 2])) > 0.0
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(wi, axis=-1)), 1.0, atol=1e-5
        )
        est = np.asarray(jnp.mean(w, axis=0))
        np.testing.assert_allclose(est, 0.8, rtol=0.05)

    def test_eval_matches_sample_weight(self):
        """measured_eval's f*cos and pdf reproduce the sample weight."""
        t = _tables(MH.bake_ggx(alpha=0.5, res_theta=32, res_phi=64))
        n = 512
        k = jax.random.PRNGKey(3)
        nf = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        wo = jnp.tile(
            jnp.asarray([[np.sin(0.8), 0.0, np.cos(0.8)]]), (n, 1)
        )
        idx = jnp.zeros((n,), jnp.int32)
        mult = jnp.full((n,), 2.0)
        xi = jax.random.uniform(k, (n, 3))
        wi, w, pdf, _, ok = MB.measured_sample(t, idx, mult, wo, nf, xi)
        fcos, pdf_e = MB.measured_eval(t, idx, mult, wo, wi, nf)
        w2 = np.asarray(fcos) / np.maximum(np.asarray(pdf_e)[:, None], 1e-12)
        a, b = np.asarray(w), w2
        match = np.all(np.isclose(a, b, rtol=2e-2, atol=1e-4), axis=-1)
        assert match.mean() > 0.95, f"mismatch rate {1 - match.mean():.3f}"


def _render(scene_text: str, search_path: str, res=32, spp=12, max_depth=4):
    """NO_CACHE render of a scene-DSL snippet (constant-env furnace rig)."""
    import os
    import tempfile

    from nrc_tpu.config import FrameConfig, RenderMode
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
                "center 0 0 0\ncamera 0.75 0.5 45 4\n"
                "searchPath \"%s\"\n" % (max_depth, search_path)
            )
        with open(scn_file, "w") as f:
            f.write(scene_text)
        scene, system = load_scene(sys_file, scn_file)

    dev = upload_scene(scene)
    cfg = FrameConfig(
        width=res, height=res, max_depth=max_depth,
        render_mode=RenderMode.NO_CACHE, train=False,
        has_measured=bool(np.max(scene.materials.mbsdf_index) >= 0),
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


_MEASURED_MDL = (
    'mdl 1.7;\nimport df::*;\n'
    'export material measured_lambert() = material(\n'
    '  surface: material_surface(\n'
    '    scattering: df::measured_bsdf(\n'
    '      measurement: bsdf_measurement("./lam.npz"),\n'
    '      multiplier: 1.0\n'
    '    )\n'
    '  )\n'
    ');\n'
)


class TestParse:
    def test_parse_measured_bsdf(self, tmp_path):
        from nrc_tpu.scene.materials import Archetype
        from nrc_tpu.scene.mdl import parse_mdl_material

        (tmp_path / "measured.mdl").write_text(_MEASURED_MDL)
        m = parse_mdl_material(str(tmp_path / "measured.mdl"))
        assert m.archetype == Archetype.MEASURED
        assert m.mbsdf_path.endswith("lam.npz")
        assert m.mbsdf_multiplier == 1.0


class TestRender:
    def test_measured_lambert_matches_analytic_diffuse(self, tmp_path):
        """Sphere under a constant env: a COLORED measured Lambert bake
        renders like df::diffuse_reflection_bsdf with the same tint —
        compared per channel so an achromatic fallback cannot pass."""
        tint = (0.7, 0.3, 0.2)
        m = MH.bake_lambert(tint, res_theta=32, res_phi=64)
        np.savez(str(tmp_path / "lam.npz"), reflection=m.reflection)
        (tmp_path / "measured.mdl").write_text(_MEASURED_MDL)
        (tmp_path / "diffuse.mdl").write_text(
            'mdl 1.7;\nimport df::*;\n'
            'export material plain_diffuse() = material(\n'
            '  surface: material_surface(\n'
            '    scattering: df::diffuse_reflection_bsdf(\n'
            '      tint: color(0.7, 0.3, 0.2)\n'
            '    )\n'
            '  )\n'
            ');\n'
        )
        rig = (
            "push\nemission 1 1 1\nlight env\npop\n"
            "mdl {name} {name} \"{f}\"\n"
            "push\nidentity\nmodel sphere 32 16 1 {name}\npop\n"
        )
        img_m = _render(
            rig.format(name="measured_lambert", f="measured.mdl"),
            str(tmp_path),
        )
        img_d = _render(
            rig.format(name="plain_diffuse", f="diffuse.mdl"), str(tmp_path)
        )
        assert np.all(np.isfinite(img_m))
        # the sphere must actually be tinted (red channel dominates where
        # it darkens the white env) — guards against silent parse fallback
        sphere = img_m.reshape(-1, 3)[img_m.reshape(-1, 3).mean(-1) < 0.9]
        assert sphere.shape[0] > 20
        assert sphere[:, 0].mean() > 1.5 * sphere[:, 1].mean()
        # same rig, same RNG streams -> per-channel agreement within the
        # bake's angular binning
        for c in range(3):
            rel = (
                np.abs(img_m[..., c] - img_d[..., c]).mean()
                / max(img_d[..., c].mean(), 1e-6)
            )
            assert rel < 0.05, f"channel {c} relative diff {rel:.4f}"


class TestIO:
    def test_npz_roundtrip(self, tmp_path):
        m = MH.bake_lambert((0.5, 0.5, 0.5), 8, 16)
        path = str(tmp_path / "lam.npz")
        np.savez(path, reflection=m.reflection)
        m2 = MH.load_measurement(path)
        np.testing.assert_array_equal(m2.reflection, m.reflection)
        assert m2.transmission is None

    def test_merl_loader(self, tmp_path):
        """Synthetic constant MERL file -> constant reflectance grid."""
        import struct

        path = str(tmp_path / "const.binary")
        n = 90 * 90 * 180
        vals = np.concatenate(
            [np.full(n, 1500.0), np.full(n, 1500.0 / 1.15),
             np.full(n, 1500.0 / 1.66)]
        )
        with open(path, "wb") as f:
            f.write(struct.pack("<3i", 90, 90, 180))
            f.write(vals.astype(np.float64).tobytes())
        m = MH.load_merl(path, res_theta=8, res_phi=16)
        np.testing.assert_allclose(m.reflection, 1.0, rtol=1e-5)
