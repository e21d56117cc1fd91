"""Pallas/Mosaic counter-experiment to the XLA row-gather floor.

BASELINE.md's round-4 gather study measured XLA:TPU row gathers at a fixed
~15 ns/index (invariant to row width, dtype, table size, locality) and
claimed "no XLA or Pallas path found" below it — without a measured Pallas
attempt (VERDICT r4 missing #2). This tool supplies the measurement at the
wide-walk's own shape: P-column f32 rows (demo 16-wide unified node+leaf
table: P=160, 640 B/row), N indices per step (the traversal chunk), random
row addresses.

Variants:
  xla         -- table[idx] row gather (the walk's production formulation)
  dma K=k     -- Pallas kernel, table stays in HBM; per-row
                 ``make_async_copy`` with a k-deep rotating semaphore
                 pipeline (k DMAs in flight; the round-3 "double-buffered
                 DMA row fetch" proposal, generalized)
  vmem        -- Pallas kernel, table VMEM-resident; serial fori_loop of
                 dynamic-slice row reads (the "pin the top levels in VMEM"
                 proposal's inner loop)
  blockspec   -- one grid step per row; Mosaic's own pipeline fetches row
                 idx[i] via a scalar-prefetch index_map (the idiomatic
                 auto-double-buffered formulation)

All variants run ``--inner`` iterations chained inside ONE jit (carry
data-dependence defeats overlap; single dispatch amortizes the tunnel),
timed over ``--reps`` calls, reported as ns per gathered row.

Usage: python tools/bench_gather_pallas.py [--variants xla,dma,vmem,blockspec]
"""

import argparse
import functools
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=131072,
                    help="table rows (HBM variants)")
    ap.add_argument("--vmem-rows", type=int, default=8192,
                    help="table rows for the VMEM-resident variant")
    ap.add_argument("--cols", type=int, default=160,
                    help="row width in f32 (demo 16-wide unified row = 160)")
    ap.add_argument("--n", type=int, default=2048,
                    help="indices per step (traversal chunk)")
    ap.add_argument("--inner", type=int, default=500,
                    help="steps chained inside one jit")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--k", type=str, default="4,16,64",
                    help="DMA pipeline depths to sweep")
    ap.add_argument("--variants", type=str, default="xla,dma,vmem,blockspec")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, P, N, INNER = args.rows, args.cols, args.n, args.inner
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    table = jax.random.normal(k1, (R, P), jnp.float32)
    # per-step index sets, precomputed (a cheap in-loop PRNG would add VPU
    # work to the thing being measured)
    idx_all = jax.random.randint(k2, (INNER, N), 0, R, jnp.int32)

    def timed(fn, *a):
        out = fn(*a)
        float(jnp.ravel(out)[0])  # compile + barrier
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            float(jnp.ravel(out)[0])
            times.append(time.perf_counter() - t0)
        times.sort()
        dt = times[len(times) // 2]
        return dt / (INNER * N) * 1e9  # ns per gathered row

    results = {"rows": R, "cols": P, "n": N, "inner": INNER}
    variants = args.variants.split(",")

    # --- A: XLA gather (reference) ---------------------------------------
    if "xla" in variants:
        @jax.jit
        def run_xla(table, idx_all):
            def body(i, carry):
                d = (carry[0] * 0.0).astype(jnp.int32)
                rows = table[(jax.lax.dynamic_index_in_dim(
                    idx_all, i, keepdims=False) + d) % R]
                return jnp.sum(rows, axis=0)  # [P] carry (data dependence)

            return jax.lax.fori_loop(0, INNER, body, jnp.zeros((P,)))

        ns = timed(run_xla, table, idx_all)
        results["xla_ns_per_row"] = round(ns, 2)
        print(f"xla: {ns:.2f} ns/row", file=sys.stderr, flush=True)

    # --- B: Pallas per-row DMA, K-deep pipeline --------------------------
    if "dma" in variants:
        # HBM DMA source slices must be 8-sublane aligned ("Slice shape
        # along dimension 0 must be aligned to tiling (8)"), so each row
        # becomes its own leading index over one whole (8, 128) f32 tile
        # (row padded 160 -> 1024 f32; measures the per-row DMA rate at the
        # hardware's minimum aligned fetch)
        R8 = min(R, 65536)
        table_8 = jnp.pad(
            table[:R8], ((0, 0), (0, 1024 - P))
        ).reshape(R8, 8, 128)
        for K in [int(x) for x in args.k.split(",")]:
            def dma_kernel(idx_ref, hbm_ref, out_ref, sems, K=K):
                def get_dma(i):
                    return pltpu.make_async_copy(
                        hbm_ref.at[idx_ref[i]],
                        out_ref.at[i],
                        sems.at[jax.lax.rem(i, K)],
                    )

                def warm(k, c):
                    get_dma(k).start()
                    return c

                jax.lax.fori_loop(0, K, warm, 0)

                def body(i, c):
                    @pl.when(i + K < N)
                    def _():
                        get_dma(i + K).start()

                    get_dma(i).wait()
                    return c

                jax.lax.fori_loop(0, N, body, 0)

            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
            )
            call = pl.pallas_call(
                dma_kernel,
                out_shape=jax.ShapeDtypeStruct((N, 8, 128), jnp.float32),
                grid_spec=grid_spec,
            )

            @jax.jit
            def run_dma(table_8, idx_all, call=call):
                def body(i, carry):
                    d = (carry[0] * 0.0).astype(jnp.int32)
                    idx = (jax.lax.dynamic_index_in_dim(
                        idx_all, i, keepdims=False) + d) % R8
                    rows = call(idx, table_8)
                    return jnp.sum(rows.reshape(N, -1), axis=0)[:P]

                return jax.lax.fori_loop(0, INNER, body, jnp.zeros((P,)))

            try:
                ns = timed(run_dma, table_8, idx_all)
                results[f"pallas_dma_k{K}_ns_per_row"] = round(ns, 2)
                print(f"dma k={K}: {ns:.2f} ns/row", file=sys.stderr,
                      flush=True)
            except Exception as e:  # noqa: BLE001 — record the failure mode
                results[f"pallas_dma_k{K}_error"] = f"{type(e).__name__}: {e}"[:300]
                print(f"dma k={K} FAILED: {e}", file=sys.stderr, flush=True)

    # tile-aligned layout for the Pallas variants: rows padded to 256 f32 =
    # one whole (2, 128) f32 tile pair, so a row fetch never crosses or
    # rotates tiles (the naive [R, 160] dynamic sublane slice measured 5x
    # WORSE than XLA — Mosaic lowers it to a tile roll)
    PT = 256
    table_t = jnp.pad(table, ((0, 0), (0, PT - P))).reshape(R, 2, 128)

    # --- C: Pallas VMEM-resident table, serial dynamic-slice loop --------
    if "vmem" in variants:
        RV = args.vmem_rows
        for name, vtab, vshape in (
            ("vmem", table[:RV], "raw"),
            ("vmem_tiled", table_t[:RV], "tiled"),
        ):
            if vshape == "raw":
                def vmem_kernel(idx_ref, tab_ref, out_ref):
                    def body(i, c):
                        out_ref[pl.ds(i, 1), :] = tab_ref[
                            pl.ds(idx_ref[i], 1), :
                        ]
                        return c

                    jax.lax.fori_loop(0, N, body, 0)

                oshape = jax.ShapeDtypeStruct((N, P), jnp.float32)
            else:
                def vmem_kernel(idx_ref, tab_ref, out_ref):
                    def body(i, c):
                        out_ref[pl.ds(i, 1)] = tab_ref[pl.ds(idx_ref[i], 1)]
                        return c

                    jax.lax.fori_loop(0, N, body, 0)

                oshape = jax.ShapeDtypeStruct((N, 2, 128), jnp.float32)

            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            call = pl.pallas_call(
                vmem_kernel, out_shape=oshape, grid_spec=grid_spec,
            )

            @jax.jit
            def run_vmem(vtab, idx_all, call=call):
                def body(i, carry):
                    d = (carry[0] * 0.0).astype(jnp.int32)
                    idx = (jax.lax.dynamic_index_in_dim(
                        idx_all, i, keepdims=False) + d) % RV
                    rows = call(idx, vtab)
                    return jnp.sum(rows.reshape(N, -1), axis=0)[:P]

                return jax.lax.fori_loop(0, INNER, body, jnp.zeros((P,)))

            try:
                ns = timed(run_vmem, vtab, idx_all)
                results[f"pallas_{name}_ns_per_row"] = round(ns, 2)
                results["vmem_rows"] = RV
                print(f"{name} (R={RV}): {ns:.2f} ns/row", file=sys.stderr,
                      flush=True)
            except Exception as e:  # noqa: BLE001
                results[f"pallas_{name}_error"] = f"{type(e).__name__}: {e}"[:300]
                print(f"{name} FAILED: {e}", file=sys.stderr, flush=True)

    # --- D: one grid step per row, scalar-prefetch index_map -------------
    if "blockspec" in variants:
        def bs_kernel(idx_ref, row_ref, out_ref):
            out_ref[:] = row_ref[:]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N,),
            in_specs=[pl.BlockSpec(
                (1, 2, 128), lambda i, idx_ref: (idx_ref[i], 0, 0)
            )],
            out_specs=pl.BlockSpec(
                (1, 2, 128), lambda i, idx_ref: (i, 0, 0)
            ),
        )
        call = pl.pallas_call(
            bs_kernel,
            out_shape=jax.ShapeDtypeStruct((N, 2, 128), jnp.float32),
            grid_spec=grid_spec,
        )

        @jax.jit
        def run_bs(table_t, idx_all):
            def body(i, carry):
                d = (carry[0] * 0.0).astype(jnp.int32)
                idx = (jax.lax.dynamic_index_in_dim(
                    idx_all, i, keepdims=False) + d) % R
                rows = call(idx, table_t)
                return jnp.sum(rows.reshape(N, -1), axis=0)[:P]

            return jax.lax.fori_loop(0, INNER, body, jnp.zeros((P,)))

        try:
            ns = timed(run_bs, table_t, idx_all)
            results["pallas_blockspec_ns_per_row"] = round(ns, 2)
            print(f"blockspec: {ns:.2f} ns/row", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            results["pallas_blockspec_error"] = f"{type(e).__name__}: {e}"[:300]
            print(f"blockspec FAILED: {e}", file=sys.stderr, flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
