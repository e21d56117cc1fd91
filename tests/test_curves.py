"""Curve primitive tests: .hair loader, rounded-cone intersection
(vs analytic capsule/sphere cases and a brute-force oracle), shading frame.
Reference: ``Hair.h:64-137``, ``Curves.cpp:104-315``, ``hit.cu:1665-2046``."""

import numpy as np
import jax.numpy as jnp
import pytest

from nrc_tpu.ops.curve_intersect import (
    CurveSoA,
    build_curve_bvh,
    curve_shading_frame,
    intersect_curves_bruteforce,
    intersect_curves_bvh,
    occluded_curves_bvh,
)
from nrc_tpu.scene.hair import CurveSegments, load_hair, hair_to_segments

FUR = "/root/reference/data/hair/fur.hair"


def make_segments(pa, pb, ra, rb):
    pa = np.asarray(pa, np.float32).reshape(-1, 3)
    pb = np.asarray(pb, np.float32).reshape(-1, 3)
    ra = np.asarray(ra, np.float32).reshape(-1)
    rb = np.asarray(rb, np.float32).reshape(-1)
    k = pa.shape[0]
    return CurveSegments(
        pa=pa, pb=pb, ra=ra, rb=rb,
        u_a=np.zeros(k, np.float32), u_b=np.ones(k, np.float32),
        reference=np.tile([[0.0, 0.0, 1.0]], (k, 1)).astype(np.float32),
        color_a=np.ones((k, 3), np.float32), color_b=np.ones((k, 3), np.float32),
        strand=np.arange(k, dtype=np.int32), material_id=np.zeros(k, np.int32),
    )


class TestRoundCone:
    def test_sphere_degenerate(self):
        # pa == pb, ra == rb: a sphere of radius 0.5 at origin
        soa = CurveSoA.build(make_segments([0, 0, 0], [0, 0, 1e-6], 0.5, 0.5))
        org = jnp.asarray([[0.0, 0.0, -3.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        hit = intersect_curves_bruteforce(org, d, soa, jnp.zeros(1), jnp.full(1, 1e9))
        assert bool(hit.valid[0])
        np.testing.assert_allclose(float(hit.t[0]), 2.5, atol=1e-3)

    def test_cylinder_side_hit(self):
        # capsule along x, radius 0.25; ray along -z at x=0.5 hits the side
        soa = CurveSoA.build(make_segments([-1, 0, 0], [1, 0, 0], 0.25, 0.25))
        org = jnp.asarray([[0.5, 0.0, 3.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        hit = intersect_curves_bruteforce(org, d, soa, jnp.zeros(1), jnp.full(1, 1e9))
        assert bool(hit.valid[0])
        np.testing.assert_allclose(float(hit.t[0]), 2.75, atol=1e-4)
        # normal points back toward the ray, tangent along the axis
        x = np.asarray(org[0] + hit.t[0] * d[0])
        fr = curve_shading_frame(soa, hit.prim[:1], jnp.asarray(x)[None])
        np.testing.assert_allclose(np.asarray(fr.normal)[0], [0, 0, 1], atol=1e-4)
        np.testing.assert_allclose(np.abs(np.asarray(fr.tangent)[0, 0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(float(fr.u_fiber[0]), 0.75, atol=1e-3)
        # azimuthal frame is orthonormal with the tangent
        np.testing.assert_allclose(
            np.asarray(fr.b1[0]) @ np.asarray(fr.tangent[0]), 0.0, atol=1e-5
        )

    def test_cone_taper(self):
        # radius 0.5 -> 0: rays near the thin end must clear a 0.5 cylinder
        soa = CurveSoA.build(make_segments([0, 0, 0], [2, 0, 0], 0.5, 0.0))
        org = jnp.asarray([[1.9, 0.4, 3.0], [0.1, 0.4, 3.0]], jnp.float32)
        d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (2, 1))
        hit = intersect_curves_bruteforce(org, d, soa, jnp.zeros(2), jnp.full(2, 1e9))
        assert not bool(hit.valid[0])  # near the tip: radius ~0.025 < 0.4
        assert bool(hit.valid[1])      # near the base: radius ~0.475 > 0.4

    def test_miss_range(self):
        soa = CurveSoA.build(make_segments([0, 0, 0], [1, 0, 0], 0.1, 0.1))
        org = jnp.asarray([[0.5, 0.0, 3.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        # tmax before the surface
        hit = intersect_curves_bruteforce(org, d, soa, jnp.zeros(1), jnp.full(1, 2.0))
        assert not bool(hit.valid[0])


class TestBVHParity:
    def test_bvh_matches_bruteforce(self):
        rng = np.random.default_rng(5)
        k = 300
        pa = rng.uniform(-1, 1, (k, 3)).astype(np.float32)
        pb = pa + rng.uniform(-0.2, 0.2, (k, 3)).astype(np.float32)
        ra = rng.uniform(0.01, 0.05, k).astype(np.float32)
        rb = rng.uniform(0.01, 0.05, k).astype(np.float32)
        seg = make_segments(pa, pb, ra, rb)
        soa = CurveSoA.build(seg)
        bvh = {kk: jnp.asarray(vv) for kk, vv in build_curve_bvh(seg).items()}

        n = 256
        org = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        tmin = jnp.zeros(n)
        tmax = jnp.full((n,), 1e9)

        hb = intersect_curves_bruteforce(jnp.asarray(org), jnp.asarray(d), soa, tmin, tmax)
        hv = intersect_curves_bvh(jnp.asarray(org), jnp.asarray(d), bvh, soa, tmin, tmax)
        # same prims; tiny float reassociation differences between the
        # batched (brute) and scalar (traversal) evaluation orders
        np.testing.assert_allclose(np.asarray(hb.t), np.asarray(hv.t), rtol=2e-4)
        np.testing.assert_array_equal(np.asarray(hb.prim), np.asarray(hv.prim))
        # occlusion agrees with closest-hit validity
        occ = occluded_curves_bvh(jnp.asarray(org), jnp.asarray(d), bvh, soa, tmin, tmax)
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(hb.valid))

    def test_wide_walk_matches_bruteforce(self):
        """8-wide curve walk (production traversal for large strand sets):
        identical winners vs brute force, same contract as the binary walk."""
        from nrc_tpu.ops.curve_intersect import build_wide_curve_bvh

        rng = np.random.default_rng(7)
        k = 700
        pa = rng.uniform(-1, 1, (k, 3)).astype(np.float32)
        pb = pa + rng.uniform(-0.2, 0.2, (k, 3)).astype(np.float32)
        ra = rng.uniform(0.01, 0.05, k).astype(np.float32)
        rb = rng.uniform(0.01, 0.05, k).astype(np.float32)
        seg = make_segments(pa, pb, ra, rb)
        soa = CurveSoA.build(seg)
        wb = {kk: jnp.asarray(vv) for kk, vv in build_wide_curve_bvh(seg).items()}
        assert "rows" in wb

        n = 256
        org = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        tmin = jnp.zeros(n)
        tmax = jnp.full((n,), 1e9)

        hb = intersect_curves_bruteforce(
            jnp.asarray(org), jnp.asarray(d), soa, tmin, tmax
        )
        hw = intersect_curves_bvh(
            jnp.asarray(org), jnp.asarray(d), wb, soa, tmin, tmax
        )
        np.testing.assert_array_equal(np.asarray(hb.prim), np.asarray(hw.prim))
        np.testing.assert_allclose(np.asarray(hb.t), np.asarray(hw.t), rtol=2e-4)
        occ = occluded_curves_bvh(
            jnp.asarray(org), jnp.asarray(d), wb, soa, tmin, tmax
        )
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(hb.valid))


@pytest.mark.skipif(not __import__("os").path.isfile(FUR), reason="fur.hair absent")
class TestFurHair:
    def test_load_and_trace(self):
        hf = load_hair(FUR)
        assert hf.num_strands == 50000
        seg = hair_to_segments(hf, subsegments=2)
        assert seg.num == 300000
        # adjacent subsegments within a strand are continuous
        same = seg.strand[:-1] == seg.strand[1:]
        gap = np.abs(seg.pb[:-1][same] - seg.pa[1:][same]).max()
        assert gap < 1e-6
        soa = CurveSoA.build(seg)
        bvh = {k: jnp.asarray(v) for k, v in build_curve_bvh(seg).items()}
        # rays at the fur ball from outside: most should hit
        n = 128
        rng = np.random.default_rng(0)
        dirs = rng.normal(size=(n, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        org = (-dirs * 4.0).astype(np.float32)
        hit = intersect_curves_bvh(
            jnp.asarray(org), jnp.asarray(dirs), bvh, soa,
            jnp.zeros(n), jnp.full((n,), 1e9),
        )
        frac = float(np.mean(np.asarray(hit.valid)))
        assert frac > 0.5, frac
        t = np.asarray(hit.t)[np.asarray(hit.valid)]
        assert np.all((t > 2.0) & (t < 6.0))
