"""Parity of the Pallas plane intersector vs the XLA Möller–Trumbore path.

Runs the kernel in interpreter mode (CPU); the TPU compiles the same body.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrc_tpu.ops.intersect import (
    RT_MAX,
    TriSoA,
    intersect_bruteforce,
    occluded_bruteforce,
)
from nrc_tpu.ops.intersect_pallas import (
    build_plane_table,
    intersect_planes,
    occluded_planes,
)


def _random_scene(key, num_tris=700, num_rays=512):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    p0 = jax.random.uniform(k1, (num_tris, 3), minval=-2.0, maxval=2.0)
    p1 = p0 + jax.random.normal(k2, (num_tris, 3)) * 0.5
    p2 = p0 + jax.random.normal(k3, (num_tris, 3)) * 0.5
    tris = TriSoA.build(p0, p1, p2)
    org = jax.random.uniform(k4, (num_rays, 3), minval=-3.0, maxval=3.0)
    d = jax.random.normal(k5, (num_rays, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return tris, org, d


@pytest.mark.parametrize("seed", [0, 1])
def test_closest_hit_parity(seed):
    tris, org, d = _random_scene(jax.random.PRNGKey(seed))
    tmin = jnp.zeros((org.shape[0],))
    tmax = jnp.full((org.shape[0],), RT_MAX)

    ref = intersect_bruteforce(org, d, tris, tmin, tmax)
    planes = build_plane_table(tris)
    out = intersect_planes(org, d, planes, tris, tmin, tmax, interpret=True)

    ref_hit = np.asarray(ref.prim >= 0)
    out_hit = np.asarray(out.prim >= 0)
    # identical hit/miss classification up to degenerate grazing edges
    assert (ref_hit == out_hit).mean() > 0.998
    both = ref_hit & out_hit
    np.testing.assert_allclose(
        np.asarray(out.t)[both], np.asarray(ref.t)[both], rtol=2e-4, atol=2e-5
    )
    # same triangle except exact-tie / grazing cases
    assert (np.asarray(out.prim)[both] == np.asarray(ref.prim)[both]).mean() > 0.99
    np.testing.assert_allclose(
        np.asarray(out.u)[both], np.asarray(ref.u)[both], rtol=2e-3, atol=2e-3
    )


def test_anyhit_parity():
    tris, org, d = _random_scene(jax.random.PRNGKey(7), num_tris=300,
                                 num_rays=384)
    tmin = jnp.full((org.shape[0],), 1e-3)
    tmax = jnp.full((org.shape[0],), 4.0)

    ref = occluded_bruteforce(org, d, tris, tmin, tmax)
    planes = build_plane_table(tris)
    out = occluded_planes(org, d, planes, tmin, tmax, interpret=True)
    assert (np.asarray(ref) == np.asarray(out)).mean() > 0.998


def test_degenerate_and_inactive_rays():
    # degenerate triangles (zero area) and inactive lanes (tmax == 0)
    p0 = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 1.0, 1.0]])
    tris = TriSoA.build(p0, p0 + jnp.asarray([[1, 0, 0], [0, 0, 0]]),
                        p0 + jnp.asarray([[0, 1, 0], [0, 0, 0]]))
    org = jnp.zeros((2, 3))
    d = jnp.asarray([[0.2, 0.2, 1.0], [0.2, 0.2, 1.0]])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tmin = jnp.zeros((2,))
    tmax = jnp.asarray([RT_MAX, 0.0])  # ray 1 inactive

    planes = build_plane_table(tris)
    out = intersect_planes(org, d, planes, tris, tmin, tmax, interpret=True)
    assert int(out.prim[0]) == 0          # hits the real triangle
    assert int(out.prim[1]) == -1         # inactive lane: no hit
    occ = occluded_planes(org, d, planes, tmin, tmax, interpret=True)
    assert bool(occ[0]) and not bool(occ[1])
