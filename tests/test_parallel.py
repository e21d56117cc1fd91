"""Multi-chip tests on the virtual 8-device CPU mesh: render parity with the
single-chip program, sharded training step, stats reduction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrc_tpu.config import RenderMode
from nrc_tpu.parallel.shard import ParallelRenderer, make_mesh, sharded_frame_step
from nrc_tpu.render.renderer import Renderer
from nrc_tpu.scene.scene_builder import load_scene

REF = "/root/reference/data"


@pytest.fixture(scope="module")
def cornell_small():
    scene, system = load_scene(
        f"{REF}/system_mdl_cornell.txt", f"{REF}/scene_mdl_cornell.txt"
    )
    system.resolution = (64, 64)
    system.tile_size = (8, 8)
    scene.camera.aspect = 1.0
    return scene, system


class TestMesh:
    def test_mesh_has_8_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8


class TestShardedRender:
    def test_nocache_matches_single_chip(self, cornell_small):
        scene, system = cornell_small
        # single chip
        r1 = Renderer(scene, system, render_mode=RenderMode.NO_CACHE, train=False)
        r1.render(2)
        single = np.asarray(r1.image_hdr())
        # 8 chips
        r2 = Renderer(scene, system, render_mode=RenderMode.NO_CACHE, train=False)
        pr = ParallelRenderer(r2, make_mesh())
        pr.render(2)
        multi = np.asarray(pr.image_hdr())
        # identical RNG streams per pixel -> identical image
        np.testing.assert_allclose(multi, single, rtol=1e-5, atol=1e-6)

    def test_full_training_runs_and_learns(self, cornell_small):
        scene, system = cornell_small
        r = Renderer(scene, system, render_mode=RenderMode.FULL, train=True,
                     adaptive_tiles=False)
        pr = ParallelRenderer(r, make_mesh())
        losses = []
        for _ in range(12):
            stats = pr.render_frame()
            losses.append(float(stats.loss))
        assert int(stats.num_train_records) > 0
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        img = pr.image_hdr()
        assert np.all(np.isfinite(img)) and img.mean() > 0.02

    def test_network_stays_replicated(self, cornell_small):
        scene, system = cornell_small
        r = Renderer(scene, system, render_mode=RenderMode.FULL, train=True,
                     adaptive_tiles=False)
        pr = ParallelRenderer(r, make_mesh())
        pr.render_frame()
        w = r.net_state.params.w_in
        # replicated output: materializes identically on all devices
        np.testing.assert_array_equal(
            np.asarray(w), np.asarray(jax.device_get(w))
        )
