"""BVH traversal micro-bench: 65k incoherent rays vs the 486k-tri
vMaterials BVH (BASELINE.md's traversal progression table).

Usage: python tools/bench_traversal.py [--rays 65536] [--iters 5]
       [--impl skip|wide] [--check]

Incoherent batch = random origins inside the scene AABB, uniform sphere
directions, fixed seed — the worst case for lockstep traversal (every
chunk holds maximally divergent walks). --check verifies hits against
chunked brute force on a subsample.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


SCENES = {
    "vmat": ("system_mdl_vMaterials.txt", "scene_mdl_vMaterials.txt"),
    "demo": ("system_mdl_demo.txt", "scene_mdl_demo.txt"),
    "cornell": ("system_mdl_cornell.txt", "scene_mdl_cornell.txt"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--impl", default="skip", choices=["skip", "wide"])
    ap.add_argument("--scene", default="vmat", choices=sorted(SCENES))
    ap.add_argument(
        "--mode", default="incoherent", choices=["incoherent", "camera"],
        help="camera = primary rays from the scene camera (coherent)",
    )
    ap.add_argument("--leaf-size", type=int, default=8)
    ap.add_argument(
        "--sweep-chunks", default=None,
        help="comma list of traversal chunk sizes to measure in one process",
    )
    ap.add_argument(
        "--sort", default="none",
        help="comma list of ray orderings to A/B in one process (same "
        "compiled walk, host-permuted inputs): none | octant (direction "
        "sign bits) | morton (origin, 10 bits/axis in the scene AABB) | "
        "octmorton (octant major, origin-morton minor)",
    )
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--check-n", type=int, default=4096)
    args = ap.parse_args()

    import json

    import jax
    import jax.numpy as jnp

    from nrc_tpu.scene.scene_builder import load_scene
    from nrc_tpu.render.scene_device import upload_scene

    sysf, scnf = SCENES[args.scene]
    scene, sysdesc = load_scene(
        f"/root/reference/data/{sysf}", f"/root/reference/data/{scnf}"
    )
    dev = upload_scene(scene)
    tris = dev.tris
    print(f"tris: {tris.num}", file=sys.stderr)

    lo, hi = scene.aabb()
    rng = np.random.default_rng(0)
    if args.mode == "camera":
        # primary rays: the scene camera over a sqrt(rays)^2 grid
        from nrc_tpu.scene.camera import generate_primary_rays

        side = int(round(args.rays ** 0.5))
        n = side * side
        px = np.tile(np.arange(side), side).astype(np.float32)
        py = np.repeat(np.arange(side), side).astype(np.float32)
        pxy = np.stack([px, py], axis=-1)
        frac = rng.random((n, 2)).astype(np.float32)
        cp, cu, cv, cw = scene.camera.frustum()
        org, d = generate_primary_rays(
            jnp.asarray(pxy), jnp.asarray(frac), (side, side),
            jnp.asarray(cp), jnp.asarray(cu), jnp.asarray(cv), jnp.asarray(cw),
        )
        org = np.asarray(org, np.float32)
        d = np.asarray(d, np.float32)
        args.rays = n
    else:
        org = (lo + rng.random((args.rays, 3)) * (hi - lo)).astype(np.float32)
        d = rng.normal(size=(args.rays, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
    org_j = jnp.asarray(org)
    dir_j = jnp.asarray(d)
    tmin = jnp.zeros((args.rays,), jnp.float32)
    from nrc_tpu.ops.intersect import RT_MAX

    tmax = jnp.full((args.rays,), RT_MAX)

    if args.impl == "skip":
        from nrc_tpu.ops.intersect import intersect_bvh

        fn_raw = lambda o, dd: intersect_bvh(o, dd, dev.bvh, tris, tmin, tmax)
    else:
        from nrc_tpu.ops.intersect_wide import intersect_wbvh
        from nrc_tpu.ops.bvh_wide import build_wide_bvh

        import os

        t0 = time.perf_counter()
        if (
            args.leaf_size == 8
            and dev.bvh is not None and "rows" in dev.bvh
        ):
            wb = dev.bvh  # upload_scene already built the production wide BVH
            print(f"wide BVH from upload_scene, rows {wb['rows'].shape}",
                  file=sys.stderr)
        else:
            cache = f"/tmp/wbvh_{args.scene}_{args.leaf_size}_uni.npz"
            if os.path.exists(cache):
                wb_np = dict(np.load(cache))
            else:
                p0 = np.asarray(tris.p0)
                wb_np = build_wide_bvh(
                    p0, p0 + np.asarray(tris.e1), p0 + np.asarray(tris.e2),
                    leaf_size=args.leaf_size,
                )
                np.savez(cache, **wb_np)
            print(f"wide build: {time.perf_counter() - t0:.2f}s, "
                  f"rows {wb_np['rows'].shape}", file=sys.stderr)
            wb = jax.tree.map(jnp.asarray, wb_np)
        fn_raw = lambda o, dd: intersect_wbvh(o, dd, wb, tris, tmin, tmax)

    import os

    from nrc_tpu.ops import intersect as I

    chunks = [
        int(c) for c in (
            args.sweep_chunks.split(",") if args.sweep_chunks
            else [os.environ.get("NRC_TRAVERSAL_CHUNK", "2048")]
        )
    ]

    def _morton_key(p):
        q = np.clip((p - lo) / np.maximum(hi - lo, 1e-30), 0.0, 1.0)
        q = (q * 1023.0).astype(np.uint64)
        key = np.zeros(p.shape[0], np.uint64)
        for b in range(10):
            for ax, sh in ((0, 2), (1, 1), (2, 0)):
                # interleave: bit b of axis ax lands at 3b + (2 - ax)
                key |= ((q[:, ax] >> b) & 1) << np.uint64(3 * b + sh)
        return key

    def _order(mode):
        if mode == "none":
            return np.arange(args.rays)
        octant = ((d[:, 0] < 0).astype(np.uint64)
                  | ((d[:, 1] < 0).astype(np.uint64) << 1)
                  | ((d[:, 2] < 0).astype(np.uint64) << 2))
        if mode == "octant":
            return np.argsort(octant, kind="stable")
        m = _morton_key(org)
        if mode == "morton":
            return np.argsort(m, kind="stable")
        if mode == "octmorton":
            return np.argsort((octant << np.uint64(30)) | m, kind="stable")
        raise SystemExit(f"unknown --sort mode {mode}")

    sort_modes = args.sort.split(",")
    for chunk in chunks:
        I.TRAVERSAL_CHUNK = chunk  # read at trace time by chunked_over_rays
        # fresh lambda identity -> fresh trace under the new chunking
        cfn = jax.jit(lambda o, dd, _f=fn_raw: _f(o, dd))
        h = cfn(org_j, dir_j)  # warmup/compile
        float(h.t[0])
        for smode in sort_modes:
            perm = _order(smode)
            o_s = jnp.asarray(org[perm])
            d_s = jnp.asarray(d[perm])
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                h = cfn(o_s, d_s)
                float(h.t[0])  # true completion barrier (tunnel-safe)
                times.append(time.perf_counter() - t0)
            ms = min(times) * 1e3
            mrays = args.rays / min(times) / 1e6
            hits = int(jnp.sum(h.prim >= 0))
            print(f"{args.impl} chunk={chunk} sort={smode}: {ms:.1f} ms/batch, "
                  f"{mrays:.2f} Mrays/s, hits {hits}/{args.rays}")
            if args.json:
                print(json.dumps({
                    "scene": args.scene, "mode": args.mode, "impl": args.impl,
                    "rays": args.rays, "ms_per_batch": round(ms, 2),
                    "mrays_per_s": round(mrays, 3), "tris": int(tris.num),
                    "chunk": chunk, "sort": smode,
                }), flush=True)

    if args.check:
        from nrc_tpu.ops.intersect import intersect_bruteforce

        # the bench loop above may have left h evaluated on --sort-permuted
        # inputs; the brute-force reference below uses the UNPERMUTED rays,
        # so re-evaluate on those before comparing (ADVICE r4)
        h = cfn(org_j, dir_j)
        float(h.t[0])
        k = args.check_n
        bf = jax.jit(
            lambda o, dd: intersect_bruteforce(o, dd, tris, tmin[:k], tmax[:k])
        )(org_j[:k], dir_j[:k])
        prim_a = np.asarray(h.prim[:k])
        prim_b = np.asarray(bf.prim)
        t_a = np.asarray(h.t[:k])
        t_b = np.asarray(bf.t)
        # identical winners modulo exact-t ties
        mism = np.nonzero(prim_a != prim_b)[0]
        bad = [i for i in mism if abs(t_a[i] - t_b[i]) > 1e-5 * max(1.0, abs(t_b[i]))]
        print(f"check: {k - len(mism)}/{k} identical prims, "
              f"{len(mism) - len(bad)} t-ties, {len(bad)} REAL mismatches")
        if bad:
            i = bad[0]
            print(f"  e.g. ray {i}: got prim {prim_a[i]} t {t_a[i]}, "
                  f"want prim {prim_b[i]} t {t_b[i]}")
            sys.exit(1)


if __name__ == "__main__":
    main()
