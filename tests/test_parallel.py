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

    def test_sharded_hash_lookup_matches_dense(self):
        """P6 forward parity: table LEVEL-sharded over 8 devices (one level
        per chip), owner-routed all_gather + all_to_all lookup ==
        single-device dense gather."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from jax import shard_map

        from nrc_tpu.config import InputEncoding, NetworkConfig
        from nrc_tpu.ops import encodings as E

        cfg = NetworkConfig(
            encoding=InputEncoding.HASH, hash_log2_size=9, hash_n_levels=8
        )
        key = jax.random.PRNGKey(3)
        grid = E.init_hash_grid(key, cfg)
        pos = jax.random.uniform(jax.random.PRNGKey(4), (64, 3))
        dense = E.hash_grid_lookup(pos, grid, cfg)

        mesh = make_mesh()
        f = shard_map(
            lambda p, g: E.sharded_hash_grid_lookup(p, g, cfg, "data"),
            mesh=mesh,
            in_specs=(P("data", None), P("data", None, None)),
            out_specs=P("data", None),
            check_vma=False,
        )
        sharded = f(pos, grid)
        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(dense), rtol=1e-5, atol=1e-7
        )

    def test_sharded_hash_grad_matches_dense(self):
        """P6 backward parity: the lookup adjoint's scatter-add + all_gather
        exchange reproduces the dense table gradient (shard-concatenated)."""
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        from nrc_tpu.config import InputEncoding, NetworkConfig
        from nrc_tpu.ops import encodings as E

        n_dev = 8
        cfg = NetworkConfig(
            encoding=InputEncoding.HASH, hash_log2_size=9, hash_n_levels=8
        )
        grid = E.init_hash_grid(jax.random.PRNGKey(3), cfg)
        pos = jax.random.uniform(jax.random.PRNGKey(4), (64, 3))
        coef = jax.random.normal(
            jax.random.PRNGKey(5),
            (64, cfg.hash_n_levels * cfg.hash_n_features_per_level),
        )

        # dense: loss = global batch mean
        def dense_loss(table):
            out = E.hash_grid_lookup(pos, E.HashGridParams(table), cfg)
            return jnp.mean(jnp.sum(out * coef, -1))

        g_dense = jax.grad(dense_loss)(grid.table)

        # sharded: per-shard batch mean, grid grads scaled by 1/D
        mesh = make_mesh()

        def shard_loss(p, c, table):
            g = jax.grad(
                lambda t: jnp.mean(
                    jnp.sum(
                        E.sharded_hash_grid_lookup(
                            p, E.HashGridParams(t), cfg, "data"
                        )
                        * c,
                        -1,
                    )
                )
            )(table)
            return jax.tree.map(lambda x: x / n_dev, g)

        f = shard_map(
            shard_loss,
            mesh=mesh,
            in_specs=(P("data", None), P("data", None), P("data", None, None)),
            out_specs=P("data", None, None),
            check_vma=False,
        )
        g_sharded = f(pos, coef, grid.table)
        np.testing.assert_allclose(
            np.asarray(g_sharded), np.asarray(g_dense), rtol=1e-5, atol=1e-8
        )

    def test_full_training_sharded_hash_tables(self, cornell_small):
        """P6 end-to-end: FULL mode NRC frame with hash encoding and the
        tables (+ EMA + Adam moments) row-sharded over the mesh."""
        import dataclasses

        from nrc_tpu.config import InputEncoding, NetworkConfig

        scene, system = cornell_small
        net_cfg = NetworkConfig(
            encoding=InputEncoding.HASH,
            hash_log2_size=12,
            hash_shard_axis="data",
        )
        r = Renderer(scene, system, net_cfg=net_cfg,
                     render_mode=RenderMode.FULL, train=True,
                     adaptive_tiles=False)
        pr = ParallelRenderer(r, make_mesh())
        # tables actually sharded over devices
        assert len(r.net_state.grid.table.sharding.device_set) == 8
        losses = []
        for _ in range(12):
            stats = pr.render_frame()
            losses.append(float(stats.loss))
        assert int(stats.num_train_records) > 0
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        # table + EMA moved off their init values
        t = np.asarray(jax.device_get(r.net_state.grid.table))
        assert np.abs(t).max() > 2e-4
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


class TestShardedChunkedWavefront:
    def test_chunked_bounce_loop_under_shard_map(self, cornell_small, monkeypatch):
        """The per-band bounce while_loop (lax.map) must compile and run
        inside the shard_map frame program (divergent per-shard trip counts
        are safe: the wavefront body has no collectives)."""
        from nrc_tpu.render import integrator

        monkeypatch.setattr(integrator, "WAVEFRONT_CHUNK", 128)
        scene, system = cornell_small  # 64x64/8 shards = 512 rays = 4 chunks
        r = Renderer(scene, system, render_mode=RenderMode.FULL, train=True,
                     adaptive_tiles=False)
        pr = ParallelRenderer(r, make_mesh())
        stats = None
        for _ in range(2):
            stats = pr.render_frame()
        assert np.isfinite(float(stats.loss))
        img = pr.image_hdr()
        assert np.all(np.isfinite(img))


class TestScalingShape:
    def test_8_shards_within_bound_of_1_shard(self, cornell_small):
        """Scaling-shape sanity check (BASELINE.md >=80% target is a
        real-hardware number; on ONE shared CPU the global work is fixed,
        so ideal is FLAT wall-clock per frame). 8 virtual shards must stay
        within a generous factor of single-shard time — catches structural
        regressions (e.g. a collective in the bounce loop, per-shard
        recompiles) without being a flaky timing gate."""
        import time

        scene, system = cornell_small
        times = {}
        for d in (1, 8):
            r = Renderer(scene, system, render_mode=RenderMode.FULL,
                         train=True, adaptive_tiles=False)
            pr = ParallelRenderer(r, make_mesh(d))
            pr.render_frame()  # compile
            jax.block_until_ready(pr.image_hdr())
            t0 = time.perf_counter()
            for _ in range(3):
                pr.render_frame()
            jax.block_until_ready(pr.image_hdr())
            times[d] = time.perf_counter() - t0
        # replicated dp measured ~2.4x flat-ideal at 8 shards on shared CPU
        assert times[8] < 6.0 * times[1], times


class TestShardedWideWalkCompactOnce:
    def test_wide_bvh_and_compact_once_under_shard_map(
        self, cornell_small, monkeypatch
    ):
        """The production large-scene stack — 16-wide BVH walk + the
        round-4 compact-once wavefront layout — must compile and run
        inside the shard_map frame program (the partition + frozen-prefix
        band loop has no collectives, so per-shard divergence is safe).
        Forced here by attaching a real wide BVH to the small scene (the
        auto threshold only engages above 16k tris)."""
        from nrc_tpu.ops.bvh_wide import build_wide_bvh
        from nrc_tpu.render import integrator

        monkeypatch.setattr(integrator, "WAVEFRONT_CHUNK", 128)
        scene, system = cornell_small
        r = Renderer(scene, system, render_mode=RenderMode.FULL, train=True,
                     adaptive_tiles=False)
        wide = build_wide_bvh(scene.p0, scene.p1, scene.p2, branch=16,
                              leaf_size=16)
        r.device_scene = r.device_scene._replace(
            bvh={k: jnp.asarray(v) for k, v in wide.items()}
        )
        assert integrator._queue_mode_auto(r.device_scene) == "once"
        pr = ParallelRenderer(r, make_mesh())
        stats = None
        for _ in range(2):
            stats = pr.render_frame()
        assert np.isfinite(float(stats.loss))
        img = np.asarray(pr.image_hdr())
        assert np.all(np.isfinite(img))
        assert img.max() > 0.0
