"""Chiang hair BSDF sanity: finite/positive, near energy conservation for a
white (non-absorbing) fiber, sample/eval pdf consistency (MC integration of
f/pdf), and absorption tinting. Model per MDL df::chiang_hair_bsdf
(``data/mdl/bsdf_hair.mdl``)."""

import jax
import jax.numpy as jnp
import numpy as np

from nrc_tpu.ops.hair_bsdf import HairParams, hair_eval, hair_sample


def make_params(n, sigma_a=(0.0, 0.0, 0.0), beta_m=0.3, beta_n=0.3,
                alpha=0.0, ior=1.55, dweight=0.0):
    return HairParams(
        sigma_a=jnp.tile(jnp.asarray([sigma_a], jnp.float32), (n, 1)),
        ior=jnp.full((n,), ior, jnp.float32),
        beta_m=jnp.full((n, 3), beta_m, jnp.float32),
        beta_n=jnp.full((n, 3), beta_n, jnp.float32),
        cuticle_angle=jnp.full((n,), alpha, jnp.float32),
        diffuse_weight=jnp.full((n,), dweight, jnp.float32),
        diffuse_tint=jnp.ones((n, 3), jnp.float32),
    )


def rand_dirs(key, n):
    v = jax.random.normal(key, (n, 3))
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


class TestEval:
    def test_finite_positive(self):
        n = 512
        k = jax.random.PRNGKey(0)
        wo = rand_dirs(k, n)
        wi = rand_dirs(jax.random.PRNGKey(1), n)
        h = jax.random.uniform(jax.random.PRNGKey(2), (n,), minval=-0.99, maxval=0.99)
        f, pdf = hair_eval(make_params(n), wo, wi, h)
        f, pdf = np.asarray(f), np.asarray(pdf)
        assert np.all(np.isfinite(f)) and np.all(f >= 0)
        assert np.all(np.isfinite(pdf)) and np.all(pdf >= 0)

    def test_pdf_integrates_to_one(self):
        # MC over uniform sphere: E[pdf / (1/4pi)] == 1
        n = 200_000
        wo = jnp.tile(jnp.asarray([[0.3, 0.8, 0.52]], jnp.float32), (n, 1))
        wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
        wi = rand_dirs(jax.random.PRNGKey(3), n)
        h = jnp.full((n,), 0.4, jnp.float32)
        _, pdf = hair_eval(make_params(n, beta_m=0.4, beta_n=0.4), wo, wi, h)
        integral = float(jnp.mean(pdf) * 4.0 * np.pi)
        assert abs(integral - 1.0) < 0.05, integral

    def test_white_furnace(self):
        # non-absorbing fiber: integral of f over the sphere ~ 1 (energy
        # conserved up to the truncated residual lobe)
        n = 200_000
        wo = jnp.tile(jnp.asarray([[0.1, 0.9, 0.42]], jnp.float32), (n, 1))
        wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
        wi = rand_dirs(jax.random.PRNGKey(4), n)
        h = jnp.full((n,), -0.3, jnp.float32)
        f, _ = hair_eval(make_params(n, beta_m=0.5, beta_n=0.5), wo, wi, h)
        e = float(jnp.mean(jnp.mean(f, -1)) * 4.0 * np.pi)
        assert 0.85 < e < 1.1, e

    def test_absorption_tints(self):
        n = 4096
        wo = rand_dirs(jax.random.PRNGKey(5), n)
        wi = rand_dirs(jax.random.PRNGKey(6), n)
        h = jnp.zeros((n,), jnp.float32)
        f_w, _ = hair_eval(make_params(n), wo, wi, h)
        f_a, _ = hair_eval(make_params(n, sigma_a=(0.2, 1.0, 3.0)), wo, wi, h)
        ratio = np.asarray(jnp.sum(f_a, 0) / jnp.maximum(jnp.sum(f_w, 0), 1e-9))
        # more absorption in blue -> transmitted/TRT energy drops channelwise
        assert ratio[0] > ratio[1] > ratio[2], ratio


class TestSample:
    def test_sample_matches_eval(self):
        n = 4096
        k = jax.random.PRNGKey(7)
        wo = rand_dirs(k, n)
        h = jax.random.uniform(jax.random.PRNGKey(8), (n,), minval=-0.9, maxval=0.9)
        xi = jax.random.uniform(jax.random.PRNGKey(9), (n, 4))
        params = make_params(n, beta_m=0.4, beta_n=0.4)
        wi, w_over, pdf = hair_sample(params, wo, h, xi)
        f, pdf_e = hair_eval(params, wo, wi, h)
        ok = np.asarray(pdf) > 1e-6
        np.testing.assert_allclose(
            np.asarray(pdf)[ok], np.asarray(pdf_e)[ok], rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(w_over)[ok],
            np.asarray(f / jnp.maximum(pdf_e, 1e-9)[..., None])[ok],
            rtol=1e-3, atol=1e-5,
        )
        # directions normalized
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(wi, axis=-1)), 1.0, atol=1e-4
        )

    def test_sampled_furnace(self):
        # E[f/pdf] over sampled directions ~ total albedo ~ 1 for white fiber
        n = 200_000
        wo = jnp.tile(jnp.asarray([[0.2, 0.7, 0.686]], jnp.float32), (n, 1))
        wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
        h = jnp.full((n,), 0.25, jnp.float32)
        xi = jax.random.uniform(jax.random.PRNGKey(10), (n, 4))
        params = make_params(n, beta_m=0.4, beta_n=0.4)
        _, w_over, pdf = hair_sample(params, wo, h, xi)
        vals = np.asarray(jnp.mean(w_over, -1))
        e = float(np.mean(vals))
        assert 0.8 < e < 1.15, e
