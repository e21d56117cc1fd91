"""Measure the ROUND-1 build's traced-ray throughput on the headline config.

Run from the round-1 worktree (commit 96c00c8 + the traced-ray counting
instrumentation patch, tools/baseline_r1_traced.patch in the main tree).
Counting semantics match the shipped counter exactly: closest-hit segments
of lanes alive at bounce start + shadow rays with a valid light sample,
summed on device over both wavefronts.

Timing methodology matches the round-5 bench.py: the whole 32-frame loop is
ONE jitted lax.scan dispatch; value = median of 5 timed reps (drift-proof
vs the relayed-tunnel per-dispatch round-trip).
"""
import functools
import json
import time

import jax
import jax.numpy as jnp

from nrc_tpu.config import RenderMode
from nrc_tpu.render.frame import frame_step
from nrc_tpu.render.renderer import Renderer
from nrc_tpu.scene.scene_builder import load_scene


def main():
    scene, system = load_scene(
        "/root/reference/data/system_mdl_cornell.txt",
        "/root/reference/data/scene_mdl_cornell.txt",
    )
    system.tile_size = (4, 4)
    r = Renderer(
        scene, system, render_mode=RenderMode.FULL, train=True,
        adaptive_tiles=False,
    )
    for _ in range(3):
        r.render_frame()
    float(jnp.ravel(r.image)[0])

    spp, reps = 32, 5
    step = functools.partial(frame_step, cfg=r.cfg, net_cfg=r.net_cfg)

    def loop(scene_d, state, image, cam, it0, sub0):
        def body(carry, _):
            image, state, it, sub = carry
            image, state, stats = step(scene_d, state, image, cam, it, sub)
            return (image, state, it + jnp.int32(1), sub + jnp.uint32(1)), (
                stats.traced_rays, stats.loss)

        return jax.lax.scan(body, (image, state, it0, sub0), None, length=spp)

    jloop = jax.jit(loop)
    cam = r._camera_arrays()

    def run_rep(image, state, it, sub):
        carry, outs = jloop(r.device_scene, state, image, cam,
                            jnp.int32(it), jnp.uint32(sub))
        image, state = carry[0], carry[1]
        float(jnp.ravel(image)[0])
        float(jnp.ravel(state.params.w_in)[0])
        return image, state, outs

    image, state, outs = run_rep(r.image, r.net_state, r.iteration,
                                 r.total_subframe)
    it, sub = r.iteration + spp, r.total_subframe + spp
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        image, state, outs = run_rep(image, state, it, sub)
        times.append(time.perf_counter() - t0)
        it += spp
        sub += spp
    times.sort()
    dt = times[len(times) // 2]
    traced = int(jnp.sum(outs[0]))
    print("rep times:", ", ".join(f"{t:.3f}" for t in times))
    n_pixels, n_tiles = r.cfg.num_pixels, r.cfg.num_tiles
    segs = r.cfg.max_depth + 1
    potential = (n_pixels + n_tiles) * segs * 2 * spp
    print(json.dumps({
        "build": "round-1 (96c00c8) + traced-ray counter patch",
        "mrays_per_s_traced": round(traced / dt / 1e6, 4),
        "mrays_per_s_potential": round(potential / dt / 1e6, 3),
        "traced_per_frame": traced // spp,
        "fps": round(spp / dt, 3),
        "timing": "in-program 32-frame scan, median of 5 reps",
    }))


if __name__ == "__main__":
    main()
