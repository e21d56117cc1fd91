"""Render high-spp NO_CACHE ground truths once (on TPU) and cache them as
npz artifacts under tests/data/ for the quality-gate tests.

The reference's implicit oracle is Full vs NoCache at high spp
(SURVEY.md §4); BASELINE.md's gate asks for PSNR vs a >=1024-spp ground
truth. Round 1 gated against a 48-spp oracle at 18 dB — noise-limited and
far too loose; this pins proper GTs.

Usage: python tools/make_ground_truth.py [--spp 1024] [--res 320]
       [--out tests/data/cornell_gt_320.npz]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=1024)
    ap.add_argument("--res", type=int, default=320)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from nrc_tpu.config import RenderMode
    from nrc_tpu.render.renderer import Renderer
    from nrc_tpu.scene.scene_builder import load_scene

    scene, system = load_scene(
        "/root/reference/data/system_mdl_cornell.txt",
        "/root/reference/data/scene_mdl_cornell.txt",
    )
    system.resolution = (args.res, args.res)
    scene.camera.aspect = 1.0
    r = Renderer(
        scene, system, render_mode=RenderMode.NO_CACHE, train=False,
        adaptive_tiles=False,
    )
    t0 = time.perf_counter()
    for i in range(args.spp):
        r.render_frame()
        if (i + 1) % 128 == 0:
            float(jnp.ravel(r.image)[0])
            el = time.perf_counter() - t0
            print(f"[{i + 1}/{args.spp}] {(i + 1) / el:.1f} fps",
                  file=sys.stderr, flush=True)
    float(jnp.ravel(r.image)[0])
    hdr = r.image_hdr().astype(np.float32)

    out = args.out or f"tests/data/cornell_gt_{args.res}.npz"
    np.savez_compressed(
        out,
        hdr=hdr,
        spp=np.int32(args.spp),
        meta=np.bytes_(
            f"NO_CACHE Cornell {args.res}x{args.res}, {args.spp} spp, "
            f"pathLengths {system.path_lengths}, generated on "
            f"{__import__('jax').devices()[0].device_kind}".encode()
        ),
    )
    print(f"wrote {out}: mean {hdr.mean(axis=(0, 1))}, max {hdr.max():.3f}")


if __name__ == "__main__":
    main()
