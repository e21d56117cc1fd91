"""Reproducible host-upload budget: median-of-N same-day stage timings.

VERDICT r4 next #7: upload figures were best-observed-day single shots
while the tunnel's bulk bandwidth swings >10x day to day. This tool times
each stage N times in ONE process and quotes median +/- spread:

  load      host scene parse (load_scene)
  bvh       16-wide BVH build alone (native C; host only)
  upload    upload_scene total (BVH build + derives + device puts)
  netinit   init_network (host-CPU math + packed transfer)

    python tools/bench_upload.py --case demo --reps 3
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="demo")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    from nrc_tpu.config import NetworkConfig
    from nrc_tpu.models.network import init_network
    from nrc_tpu.ops.bvh_wide import build_wide_bvh
    from nrc_tpu.render.scene_device import upload_scene
    from nrc_tpu.scene.scene_builder import load_scene
    from profile_frame import CASES

    sysf, scnf = CASES[args.case]
    stages = {"load": [], "bvh": [], "upload": [], "netinit": []}
    for rep in range(args.reps):
        t0 = time.perf_counter()
        scene, system = load_scene(sysf, scnf)
        stages["load"].append(time.perf_counter() - t0)

        if scene.num_triangles > 16384:
            t0 = time.perf_counter()
            build_wide_bvh(scene.p0, scene.p1, scene.p2,
                           branch=16, leaf_size=16)
            stages["bvh"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        dev = upload_scene(scene)
        jax.block_until_ready(dev.tris.p0)
        stages["upload"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        st = init_network(jax.random.PRNGKey(rep), NetworkConfig())
        float(jax.numpy.ravel(st.params.w_in)[0])
        stages["netinit"].append(time.perf_counter() - t0)
        del dev, st
        print(f"rep {rep} done", file=sys.stderr, flush=True)

    out = {"case": args.case, "reps": args.reps,
           "device": str(jax.devices()[0])}
    for k, v in stages.items():
        if not v:
            continue
        v = sorted(v)
        med = v[len(v) // 2]
        spread = (max(v) - min(v)) / 2
        out[f"{k}_s_median"] = round(med, 2)
        out[f"{k}_s_spread"] = round(spread, 2)
        out[f"{k}_s_all"] = [round(x, 2) for x in v]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
