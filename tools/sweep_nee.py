"""Single-process A/B of the round-5 shadow-ray levers on a hero scene.

Variants share one scene upload and one process (same tunnel conditions):
  - cutfast 0/1  (NRC_CUTOUT_FAST: any-hit pre-pass before the cutout hops)
  - tau sweep    (FrameConfig.nee_rr_tau: shadow-ray RR threshold)

Each variant is its own jitted N-frame scan (in-program timing, median of
--reps reps). One JSON line per variant.
"""

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="demo")
    ap.add_argument("--res", default="1280x720")
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--variants", default="base,cutfast,tau0.01,tau0.1")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nrc_tpu.config import RenderMode
    from nrc_tpu.render.frame import frame_step
    from nrc_tpu.render.renderer import Renderer
    from nrc_tpu.scene.scene_builder import load_scene
    from profile_frame import CASES

    os.environ["NRC_CUTOUT_FAST"] = "0"
    sysf, scnf = CASES[args.case]
    scene, system = load_scene(sysf, scnf)
    w, h = (int(x) for x in args.res.lower().split("x"))
    system.resolution = (w, h)
    scene.camera.aspect = w / h
    system.tile_size = (args.tile, args.tile)
    t0 = time.perf_counter()
    r = Renderer(scene, system, render_mode=RenderMode.FULL, train=True,
                 adaptive_tiles=False)
    print(f"upload {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    spp = args.spp

    def run_variant(name, cfg, cutfast):
        os.environ["NRC_CUTOUT_FAST"] = "1" if cutfast else "0"
        step = functools.partial(
            frame_step, cfg=cfg, net_cfg=r.net_cfg,
            train_unbiased_ratio=cfg.train_unbiased_ratio,
        )

        def loop(scene_d, state, image, cam, it0, sub0, lr):
            def body(carry, _):
                image, state, it, sub = carry
                image, state, stats = step(
                    scene_d, state, image, cam, it, sub, learning_rate=lr
                )
                return (
                    image, state, it + jnp.int32(1), sub + jnp.uint32(1)
                ), stats.traced_rays

            return jax.lax.scan(
                body, (image, state, it0, sub0), None, length=spp
            )

        jloop = jax.jit(loop)
        cam = r._camera_arrays()
        lr = jnp.float32(r.hyper.learning_rate)

        def rep(image, state, it, sub):
            carry, traced = jloop(r.device_scene, state, image, cam,
                                  jnp.int32(it), jnp.uint32(sub), lr)
            image, state = carry[0], carry[1]
            float(jnp.ravel(image)[0])
            float(jnp.ravel(state.params.w_in)[0])
            return image, state, traced

        t0 = time.perf_counter()
        image, state, traced = rep(r.image, r.net_state, 0, 0)
        compile_s = time.perf_counter() - t0
        it = sub = spp
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            image, state, traced = rep(image, state, it, sub)
            times.append(time.perf_counter() - t0)
            it += spp
            sub += spp
        times.sort()
        dt = times[len(times) // 2]
        print(json.dumps({
            "variant": name, "case": args.case, "res": [w, h],
            "ms_per_frame": round(dt / spp * 1e3, 1),
            "traced_per_frame": int(jnp.sum(traced)) // spp,
            "compile_s": round(compile_s, 1),
            "rep_times_s": [round(t, 3) for t in times],
        }), flush=True)

    from nrc_tpu.render import integrator as _integ

    wfc0 = _integ.WAVEFRONT_CHUNK
    for v in args.variants.split(","):
        _integ.WAVEFRONT_CHUNK = wfc0
        if v == "base":
            run_variant(v, r.cfg, cutfast=False)
        elif v == "cutfast":
            run_variant(v, r.cfg, cutfast=True)
        elif v.startswith("tau"):
            tau = float(v[3:])
            cfg = dataclasses.replace(r.cfg, nee_rr_tau=tau)
            run_variant(v, cfg, cutfast=False)
        elif v.startswith("wfc"):
            # wavefront band width: bounds both the compact-once prefix
            # granularity AND the traversal coherence-sort scope at
            # depths >= 2 (the 921k-vs-65k sort-scope effect)
            _integ.WAVEFRONT_CHUNK = int(v[3:])
            run_variant(v, r.cfg, cutfast=False)
        else:
            raise SystemExit(f"unknown variant {v}")


if __name__ == "__main__":
    main()
