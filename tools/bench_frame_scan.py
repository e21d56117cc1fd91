"""In-program frame timing for any case/res: N frames in ONE jitted scan.

Same drift-proof methodology as bench.py (the whole loop is a single
dispatch; median of --reps timed reps), applied to the hero scenes, where
the host-loop profiler (tools/profile_frame.py) additionally pays a
per-frame tunnel round-trip. The delta between the two is dispatch/tunnel
overhead, not device work — production hosts see the in-program number.

    python tools/bench_frame_scan.py --case demo --res 1280x720 --spp 4
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="demo")
    ap.add_argument("--res", default=None)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--mode", default="FULL")
    ap.add_argument("--train", type=int, default=1)
    ap.add_argument("--label", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nrc_tpu.config import RenderMode
    from nrc_tpu.render.frame import frame_step
    from nrc_tpu.render.renderer import Renderer
    from nrc_tpu.scene.scene_builder import load_scene
    from profile_frame import CASES  # tool-local case table

    sysf, scnf = CASES[args.case]
    scene, system = load_scene(sysf, scnf)
    if args.res:
        w, h = (int(x) for x in args.res.lower().split("x"))
        system.resolution = (w, h)
        scene.camera.aspect = w / h
    system.tile_size = (args.tile, args.tile)
    r = Renderer(
        scene, system, render_mode=RenderMode[args.mode],
        train=bool(args.train), adaptive_tiles=False,
    )
    spp = args.spp
    r._maybe_build_raster()  # primary raster (round 5; env-gated)
    step = functools.partial(
        frame_step, cfg=r.cfg, net_cfg=r.net_cfg,
        train_unbiased_ratio=r.cfg.train_unbiased_ratio,
        raster_meta=r._raster_meta,
    )

    def loop(scene_d, state, image, cam, it0, sub0, lr, raster_data):
        def body(carry, _):
            image, state, it, sub = carry
            image, state, stats = step(
                scene_d, state, image, cam, it, sub, learning_rate=lr,
                raster_data=raster_data,
            )
            return (image, state, it + jnp.int32(1), sub + jnp.uint32(1)), (
                stats.traced_rays)

        return jax.lax.scan(body, (image, state, it0, sub0), None, length=spp)

    jloop = jax.jit(loop)
    cam = r._camera_arrays()
    lr = jnp.float32(r.hyper.learning_rate)

    def run_rep(image, state, it, sub):
        carry, traced = jloop(
            r.device_scene, state, image, cam, jnp.int32(it),
            jnp.uint32(sub), lr, r._raster_data
        )
        image, state = carry[0], carry[1]
        float(jnp.ravel(image)[0])
        if bool(args.train):
            float(jnp.ravel(state.params.w_in)[0])
        return image, state, traced

    t0 = time.perf_counter()
    image, state, traced = run_rep(r.image, r.net_state, 0, 0)
    compile_s = time.perf_counter() - t0
    it = sub = spp
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        image, state, traced = run_rep(image, state, it, sub)
        times.append(time.perf_counter() - t0)
        it += spp
        sub += spp
    times.sort()
    dt = times[len(times) // 2]
    tr = int(jnp.sum(traced))
    print(json.dumps({
        "label": args.label or f"{args.case}_scan",
        "case": args.case, "res": [r.cfg.width, r.cfg.height],
        "ms_per_frame": round(dt / spp * 1e3, 1),
        "fps": round(spp / dt, 3),
        "mrays_traced": round(tr / dt / 1e6, 3),
        "compile_s": round(compile_s, 1),
        "rep_times_s": [round(t, 3) for t in times],
        "timing": f"in-program {spp}-frame scan, median of {args.reps} reps",
    }), flush=True)


if __name__ == "__main__":
    main()
