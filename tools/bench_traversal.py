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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--impl", default="skip", choices=["skip", "wide"])
    ap.add_argument("--leaf-size", type=int, default=8)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--check-n", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nrc_tpu.scene.scene_builder import load_scene
    from nrc_tpu.render.scene_device import upload_scene

    scene, _ = load_scene(
        "/root/reference/data/system_mdl_vMaterials.txt",
        "/root/reference/data/scene_mdl_vMaterials.txt",
    )
    dev = upload_scene(scene)
    tris = dev.tris
    print(f"tris: {tris.num}", file=sys.stderr)

    lo, hi = scene.aabb()
    rng = np.random.default_rng(0)
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

        fn = jax.jit(lambda o, dd: intersect_bvh(o, dd, dev.bvh, tris, tmin, tmax))
    else:
        from nrc_tpu.ops.intersect_wide import intersect_wbvh
        from nrc_tpu.ops.bvh_wide import build_wide_bvh

        import os

        cache = f"/tmp/wbvh_{args.leaf_size}_cm.npz"
        t0 = time.perf_counter()
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
              f"nodes {wb_np['wnode'].shape}", file=sys.stderr)
        wb = jax.tree.map(jnp.asarray, wb_np)
        fn = jax.jit(lambda o, dd: intersect_wbvh(o, dd, wb, tris, tmin, tmax))

    # warmup/compile
    h = fn(org_j, dir_j)
    float(h.t[0])
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        h = fn(org_j, dir_j)
        float(h.t[0])  # true completion barrier (tunnel-safe)
        times.append(time.perf_counter() - t0)
    ms = min(times) * 1e3
    mrays = args.rays / min(times) / 1e6
    hits = int(jnp.sum(h.prim >= 0))
    print(f"{args.impl}: {ms:.1f} ms/batch, {mrays:.2f} Mrays/s, "
          f"hits {hits}/{args.rays}")

    if args.check:
        from nrc_tpu.ops.intersect import intersect_bruteforce

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
