"""Unit tests for math, RNG, tonemap, and image IO."""

import numpy as np
import jax.numpy as jnp
import pytest

from nrc_tpu.config import TonemapperConfig
from nrc_tpu.utils import math as m
from nrc_tpu.utils import rng
from nrc_tpu.utils.image_io import read_hdr, read_png, write_hdr, write_png
from nrc_tpu.utils.tonemap import tonemap


class TestRng:
    def test_tea_reference_values(self):
        # TEA is deterministic: same inputs -> same hash, different inputs differ
        a = rng.tea(jnp.uint32(0), jnp.uint32(0))
        b = rng.tea(jnp.uint32(0), jnp.uint32(0))
        c = rng.tea(jnp.uint32(1), jnp.uint32(0))
        assert int(a) == int(b)
        assert int(a) != int(c)

    def test_tea_matches_cpu_oracle(self):
        # NumPy oracle of the reference tea<4> (random_number_generators.h:38-52)
        def tea4(v0, v1):
            v0, v1, s0 = np.uint32(v0), np.uint32(v1), np.uint32(0)
            with np.errstate(over="ignore"):
                for _ in range(4):
                    s0 = np.uint32(s0 + np.uint32(0x9E3779B9))
                    v0 = np.uint32(
                        v0
                        + (
                            np.uint32((v1 << np.uint32(4)) + np.uint32(0xA341316C))
                            ^ np.uint32(v1 + s0)
                            ^ np.uint32((v1 >> np.uint32(5)) + np.uint32(0xC8013EA4))
                        )
                    )
                    v1 = np.uint32(
                        v1
                        + (
                            np.uint32((v0 << np.uint32(4)) + np.uint32(0xAD90777D))
                            ^ np.uint32(v0 + s0)
                            ^ np.uint32((v0 >> np.uint32(5)) + np.uint32(0x7E95761E))
                        )
                    )
            return int(v0)

        for pix, it in [(0, 0), (123, 7), (99999, 31), (2**31, 2)]:
            got = int(rng.tea(jnp.uint32(pix), jnp.uint32(it)))
            assert got == tea4(pix, it)

    def test_lcg_stream_uniform(self):
        seeds = rng.tea(jnp.arange(4096, dtype=jnp.uint32), jnp.uint32(3))
        _, u = rng.rng(seeds)
        u = np.asarray(u)
        assert np.all(u >= 0.0) and np.all(u < 1.0)
        assert abs(u.mean() - 0.5) < 0.02

    def test_rng2_distinct_components(self):
        seed = rng.tea(jnp.uint32(42), jnp.uint32(0))
        _, s = rng.rng2(seed)
        assert float(s[0]) != float(s[1])


class TestMath:
    def test_normalize(self):
        v = jnp.asarray([[3.0, 0.0, 4.0]])
        n = m.normalize(v)
        np.testing.assert_allclose(np.asarray(m.length(n)), 1.0, rtol=1e-6)

    def test_onb_orthonormal(self):
        normals = m.normalize(jnp.asarray(np.random.RandomState(0).randn(64, 3)))
        t, b = m.build_onb(normals)
        np.testing.assert_allclose(np.asarray(m.dot(t, normals)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m.dot(b, normals)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m.dot(t, b)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m.length(t)), 1.0, atol=1e-5)

    def test_cosine_hemisphere(self):
        rs = np.random.RandomState(1)
        axis = m.normalize(jnp.asarray([[0.0, 1.0, 0.0]] * 512))
        samples = jnp.asarray(rs.rand(512, 2))
        w, pdf = m.unit_square_to_cosine_hemisphere(samples, axis)
        cosines = np.asarray(m.dot(w, axis))
        assert np.all(cosines >= -1e-6)
        np.testing.assert_allclose(np.asarray(pdf), cosines / np.pi, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m.length(w)), 1.0, atol=1e-4)

    def test_spherical_roundtrip(self):
        rs = np.random.RandomState(2)
        d = m.normalize(jnp.asarray(rs.randn(128, 3)))
        sph = m.cartesian_to_spherical_unit(d)
        # elevation convention: theta measured from +z
        back = m.spherical_to_cartesian(sph[..., 0], sph[..., 1])
        np.testing.assert_allclose(np.asarray(back), np.asarray(d), atol=1e-4)

    def test_balance_heuristic(self):
        assert float(m.balance_heuristic(jnp.float32(1.0), jnp.float32(3.0))) == pytest.approx(0.25)
        assert float(m.balance_heuristic(jnp.float32(0.0), jnp.float32(0.0))) == 0.0

    def test_reflect(self):
        wi = jnp.asarray([[1.0, -1.0, 0.0]])
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        r = m.reflect(wi, n)
        np.testing.assert_allclose(np.asarray(r), [[1.0, 1.0, 0.0]], atol=1e-6)


class TestTonemap:
    def test_neutral_settings_identity_gamma(self):
        cfg = TonemapperConfig(
            gamma=1.0, white_point=1.0, burn_highlights=1.0,
            crush_blacks=0.0, saturation=1.0, brightness=1.0,
        )
        hdr = jnp.asarray([[[0.25, 0.5, 0.75]]])
        ldr = np.asarray(tonemap(hdr, cfg))
        # burn=1 makes the highlight compression the identity
        np.testing.assert_allclose(ldr, [[[0.25, 0.5, 0.75]]], atol=1e-5)

    def test_range(self):
        cfg = TonemapperConfig()
        hdr = jnp.asarray(np.random.RandomState(0).rand(8, 8, 3) * 10.0)
        ldr = np.asarray(tonemap(hdr, cfg))
        assert np.all(ldr >= 0.0) and np.all(ldr <= 1.0)


class TestImageIO:
    def test_png_roundtrip(self, tmp_path):
        img = (np.random.RandomState(0).rand(17, 23, 3) * 255).astype(np.uint8)
        p = str(tmp_path / "t.png")
        write_png(p, img)
        back = read_png(p)
        np.testing.assert_array_equal(back, img)

    def test_hdr_roundtrip(self, tmp_path):
        img = np.random.RandomState(1).rand(9, 13, 3).astype(np.float32) * 5.0
        p = str(tmp_path / "t.hdr")
        write_hdr(p, img)
        back = read_hdr(p)
        # RGBE shares one exponent across channels: error bounded by
        # max-channel / 256 per pixel
        err = np.abs(back - img)
        bound = img.max(axis=-1, keepdims=True) / 256.0 + 1e-4
        assert np.all(err <= bound)

    def test_reference_env_hdr_loads(self):
        from nrc_tpu.utils.hdr_loader import load_radiance_hdr

        path = "/root/reference/data/NV_Default_HDR_3000x1500.hdr"
        img = load_radiance_hdr(path)
        assert img.shape == (1500, 3000, 3)
        assert np.all(np.isfinite(img)) and img.max() > 1.0


class TestDevicePutPacked:
    def test_roundtrip_mixed_tree(self):
        from nrc_tpu.utils.device_pack import device_put_packed
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        tree = {
            "a": rng.random((7, 3)).astype(np.float32),
            "b": np.arange(11, dtype=np.int32).reshape(11, 1),
            "c": np.asarray([True, False, True]),
            "d": rng.random((2, 2)),          # f64 -> f32 like jnp.asarray
            "e": jnp.ones((4,)),              # already-device: pass-through
            "f": None,
            "g": np.zeros((0, 3), np.float32),  # empty leaf
            "s": "static",                    # non-array leaf untouched
        }
        out = device_put_packed(tree)
        np.testing.assert_array_equal(np.asarray(out["a"]), tree["a"])
        np.testing.assert_array_equal(np.asarray(out["b"]), tree["b"])
        assert out["b"].dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(out["c"]), tree["c"])
        assert out["c"].dtype == jnp.bool_
        np.testing.assert_allclose(
            np.asarray(out["d"]), tree["d"].astype(np.float32)
        )
        assert out["e"] is tree["e"]
        assert out["f"] is None and out["s"] == "static"
        assert out["g"].shape == (0, 3)
        # all converted leaves are device arrays
        for k in ("a", "b", "c", "d", "g"):
            assert isinstance(out[k], jnp.ndarray), k

    def test_f64_input_canonicalized(self):
        from nrc_tpu.utils.device_pack import device_put_packed

        out = device_put_packed({"x": np.asarray([1.5, 2.5])})
        assert str(out["x"].dtype) == "float32"


class TestOneHotPickPut:
    def test_matches_gather_scatter(self):
        from nrc_tpu.utils.math import add1, pick1, put1

        rng = np.random.default_rng(5)
        n, k, c = 257, 4, 3
        x2 = jnp.asarray(rng.random((n, k)).astype(np.float32))
        x3 = jnp.asarray(rng.random((n, k, c)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, k, n), jnp.int32)
        rows = np.arange(n)
        np.testing.assert_array_equal(
            np.asarray(pick1(x2, idx)), np.asarray(x2)[rows, np.asarray(idx)]
        )
        np.testing.assert_array_equal(
            np.asarray(pick1(x3, idx)), np.asarray(x3)[rows, np.asarray(idx)]
        )
        v2 = jnp.asarray(rng.random(n).astype(np.float32))
        v3 = jnp.asarray(rng.random((n, c)).astype(np.float32))
        m = jnp.asarray(rng.random(n) < 0.5)
        want2 = np.asarray(x2).copy()
        want2[rows[np.asarray(m)], np.asarray(idx)[np.asarray(m)]] = np.asarray(v2)[np.asarray(m)]
        np.testing.assert_array_equal(np.asarray(put1(x2, idx, v2, m)), want2)
        want3 = np.asarray(x3).copy()
        want3[rows[np.asarray(m)], np.asarray(idx)[np.asarray(m)]] = np.asarray(v3)[np.asarray(m)]
        np.testing.assert_array_equal(np.asarray(put1(x3, idx, v3, m)), want3)
        wadd = np.asarray(x3).copy()
        wadd[rows[np.asarray(m)], np.asarray(idx)[np.asarray(m)]] += np.asarray(v3)[np.asarray(m)]
        np.testing.assert_allclose(
            np.asarray(add1(x3, idx, v3, m)), wadd, rtol=0, atol=0
        )
