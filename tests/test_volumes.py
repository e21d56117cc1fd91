"""Volume transport tests: homogeneous absorption + HG scattering random walk
inside a transmissive sphere (reference raygeneration.cu:184-213,
miss.cu:62-79, hit.cu:488-524 material stack)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from nrc_tpu.config import FrameConfig, RenderMode
from nrc_tpu.render.integrator import trace_wavefront
from nrc_tpu.render.scene_device import upload_scene
from nrc_tpu.scene import geometry as geo
from nrc_tpu.scene.lights import empty_light_table, TYPE_LIGHT_ENV_CONST, LightTable
from nrc_tpu.scene.materials import Archetype, Material, MaterialTable
from nrc_tpu.scene.scene_builder import Scene
from nrc_tpu.scene.camera import Camera
from nrc_tpu.utils import rng as R


def make_sphere_scene(sigma_a=(0, 0, 0), sigma_s=(0, 0, 0), bias=0.0):
    mesh = geo.create_sphere(48, 24)
    idx = mesh.indices.astype(int)
    mats = [
        Material(
            name="glass",
            archetype=Archetype.SPECULAR_REFLECT_TRANSMIT,
            albedo=(1.0, 1.0, 1.0),
            ior=1.0,  # index-matched: pure medium effect, no refraction
            sigma_a=sigma_a,
            sigma_s=sigma_s,
            volume_bias=bias,
        )
    ]
    # constant environment light
    lt = empty_light_table()
    lt = dataclasses.replace(
        lt,
        type=np.asarray([TYPE_LIGHT_ENV_CONST], np.int32),
        matrix=np.eye(4, dtype=np.float32)[None],
        matrix_inv=np.eye(4, dtype=np.float32)[None],
        emission=np.asarray([[1.0, 1.0, 1.0]], np.float32),
        area=np.zeros(1, np.float32),
        inv_integral=np.zeros(1, np.float32),
        spot_angle_half=np.zeros(1, np.float32),
        spot_exponent=np.zeros(1, np.float32),
        material_id=np.full(1, -1, np.int32),
        tri_start=np.zeros(1, np.int32),
        tri_count=np.zeros(1, np.int32),
    )
    scene = Scene(
        p0=mesh.vertices[idx[:, 0]], p1=mesh.vertices[idx[:, 1]], p2=mesh.vertices[idx[:, 2]],
        n0=mesh.normals[idx[:, 0]], n1=mesh.normals[idx[:, 1]], n2=mesh.normals[idx[:, 2]],
        uv0=mesh.texcoords[idx[:, 0]], uv1=mesh.texcoords[idx[:, 1]], uv2=mesh.texcoords[idx[:, 2]],
        material_id=np.zeros(mesh.num_triangles, np.int32),
        light_id=np.full(mesh.num_triangles, -1, np.int32),
        materials=MaterialTable.build(mats),
        material_rows=mats,
        lights=lt,
        camera=Camera(),
    )
    return upload_scene(scene)


def trace_through(dev, n=256, max_depth=8, walk_length=3, seed=7):
    cfg = FrameConfig(
        width=16, height=16, max_depth=max_depth,
        render_mode=RenderMode.NO_CACHE, train=False,
        scene_epsilon=1e-4, walk_length=walk_length, direct_lighting=False,
        has_volumes=True,
    )
    # parallel rays through the sphere center
    ys = np.linspace(-0.3, 0.3, n)
    org = jnp.asarray(np.stack([np.full(n, -3.0), ys, np.zeros(n)], -1), jnp.float32)
    d = jnp.asarray(np.tile([[1.0, 0.0, 0.0]], (n, 1)), jnp.float32)
    seeds = R.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(seed))
    out = trace_wavefront(dev, org, d, seeds, cfg, train=False)
    return np.asarray(out.radiance)


class TestAbsorption:
    def test_beer_lambert(self):
        # index-matched purely absorbing sphere: radiance = exp(-sigma_a * L)
        dev = make_sphere_scene(sigma_a=(0.5, 1.0, 2.0))
        rad = trace_through(dev)
        assert np.all(np.isfinite(rad))
        # central rays traverse ~2 units: exp(-1), exp(-2), exp(-4)
        center = rad[len(rad) // 2]
        # chord length for ray at y: 2*sqrt(1-y^2); mid rays y in [-0.3, .3]
        y = np.linspace(-0.3, 0.3, len(rad))[len(rad) // 2]
        L = 2 * np.sqrt(1 - y * y)
        expected = np.exp(-np.asarray([0.5, 1.0, 2.0]) * L)
        np.testing.assert_allclose(center, expected, rtol=0.02)

    def test_no_medium_passthrough(self):
        dev = make_sphere_scene()
        rad = trace_through(dev)
        np.testing.assert_allclose(rad, 1.0, rtol=1e-3)


class TestScattering:
    def test_energy_conserved_isotropic(self):
        # pure scattering, no absorption: white env everywhere -> radiance ~1
        dev = make_sphere_scene(sigma_s=(2.0, 2.0, 2.0))
        rad = trace_through(dev, n=512, max_depth=10, walk_length=4)
        assert np.all(np.isfinite(rad))
        # paths that exhaust max_depth inside the medium lose their energy
        # (truncation), so mean is slightly below 1
        assert 0.7 < rad.mean() <= 1.0 + 1e-3, rad.mean()

    def test_anisotropy_changes_transport(self):
        # With a generous walk budget, strongly forward scattering (g=0.9)
        # crosses the optical-depth-6 sphere in ~7 near-straight steps while
        # isotropic diffusion needs ~tau^2 steps, so truncation hits the
        # isotropic medium harder. (Under a *tight* walk budget the ordering
        # flips: forward walks die mid-volume on the long axial chord.)
        kw = dict(n=512, max_depth=20, walk_length=16)
        iso = trace_through(make_sphere_scene(sigma_s=(3.0, 3.0, 3.0), bias=0.0), **kw)
        fwd = trace_through(make_sphere_scene(sigma_s=(3.0, 3.0, 3.0), bias=0.9), **kw)
        assert np.all(np.isfinite(iso)) and np.all(np.isfinite(fwd))
        assert fwd.mean() > iso.mean()
