"""Hash-grid gather/scatter layout experiments on the real chip.

bench_mlp measured the hash-encoding train step at ~95 ms (vs 0.12 ms
frequency) at B=16384: the 8-corner table gathers and especially the
scatter-add adjoint dominate. This tool times isolated variants of the
lookup/update to pick the layout XLA:TPU actually runs fast, following the
relayed-backend measurement rules (scalar-readback barrier, chained
inputs).

One JSON line per variant.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.ravel(x)[0])


def measure(step, state, reps=10, warmup=2):
    for _ in range(warmup):
        state = step(state)
    _sync(state)
    t0 = time.perf_counter()
    for _ in range(reps):
        state = step(state)
    _sync(state)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--levels", type=int, default=16)
    ap.add_argument("--log2-size", type=int, default=15)
    ap.add_argument("--feat", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    B, L, F = args.batch, args.levels, args.feat
    S = 2 ** args.log2_size
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    table = jax.random.normal(k1, (L * S, F), jnp.float32)
    # corner indices: 8 independent [B, L] index sets (like the 8 corners)
    idx8 = jax.random.randint(k2, (8, B, L), 0, S, jnp.int32)
    level_ofs = (jnp.arange(L, dtype=jnp.int32) * S)[None, :]
    g = jax.random.normal(k3, (B, L, F), jnp.float32)
    out = {"batch": B, "levels": L, "size": S, "feat": F}

    def chain(v, x):
        # fold a data-dependent perturbation into the carried value
        return v + jnp.max(x).astype(v.dtype) * 0

    # --- forward variants -------------------------------------------------
    # A: 8 gathers of [B, L] rows from [L*S, F] (current encode_hash shape)
    @jax.jit
    def fwd_rows(c):
        acc = jnp.zeros((B, L, F))
        for corner in range(8):
            acc = acc + table[(idx8[corner] + level_ofs + c)]
        return acc

    dt = measure(lambda s: fwd_rows(jnp.int32(0) + (s[0, 0, 0] * 0).astype(jnp.int32)), jnp.zeros((B, L, F)))
    out["fwd_rows_ms"] = round(dt * 1e3, 3)
    print("fwd_rows done", file=sys.stderr, flush=True)

    # B: ONE gather of [8, B, L] rows
    @jax.jit
    def fwd_one(c):
        return table[(idx8 + level_ofs[None] + c)].sum(axis=0)

    dt = measure(lambda s: fwd_one((s[0, 0, 0] * 0).astype(jnp.int32)), jnp.zeros((B, L, F)))
    out["fwd_onegather_ms"] = round(dt * 1e3, 3)
    print("fwd_one done", file=sys.stderr, flush=True)

    # C: per-feature element gathers from [L*S] flat f32 (no row minor dim)
    t0col = table[:, 0]
    t1col = table[:, 1] if F > 1 else table[:, 0]

    @jax.jit
    def fwd_elem(c):
        ii = idx8 + level_ofs[None] + c
        return t0col[ii].sum(axis=0) + t1col[ii].sum(axis=0)

    dt = measure(lambda s: fwd_elem((s[0, 0] * 0).astype(jnp.int32)), jnp.zeros((B, L)))
    out["fwd_elem_ms"] = round(dt * 1e3, 3)
    print("fwd_elem done", file=sys.stderr, flush=True)

    # D: packed pair gather — [L*S] rows of f32 pairs viewed as one gather
    # of width-F rows but table laid out [L, S, F] with gather on axis 1
    table3 = table.reshape(L, S, F)

    @jax.jit
    def fwd_take_along(c):
        # vmap the level axis: for each level, gather [8*B] rows from [S, F]
        ii = (idx8 + c).transpose(2, 0, 1).reshape(L, 8 * B)  # [L, 8B]
        gathered = jax.vmap(lambda t, i: t[i])(table3, ii)    # [L, 8B, F]
        return gathered.reshape(L, 8, B, F).sum(axis=1)

    dt = measure(lambda s: fwd_take_along((s[0, 0, 0] * 0).astype(jnp.int32)), jnp.zeros((L, B, F)))
    out["fwd_vmap_level_ms"] = round(dt * 1e3, 3)
    print("fwd_vmap done", file=sys.stderr, flush=True)

    # --- backward variants ------------------------------------------------
    # A: scatter-add [B, L, F] into [L*S, F] x 8 (autodiff adjoint shape)
    @jax.jit
    def bwd_scatter(c):
        acc = jnp.zeros((L * S, F))
        for corner in range(8):
            acc = acc.at[(idx8[corner] + level_ofs + c)].add(g)
        return acc

    dt = measure(lambda s: bwd_scatter((s[0, 0] * 0).astype(jnp.int32)), jnp.zeros((L * S, F)), reps=3)
    out["bwd_scatter8_ms"] = round(dt * 1e3, 3)
    print("bwd_scatter8 done", file=sys.stderr, flush=True)

    # B: ONE scatter of [8, B, L, F]
    @jax.jit
    def bwd_scatter_one(c):
        gg = jnp.broadcast_to(g, (8, B, L, F))
        return jnp.zeros((L * S, F)).at[(idx8 + level_ofs[None] + c)].add(gg)

    dt = measure(lambda s: bwd_scatter_one((s[0, 0] * 0).astype(jnp.int32)), jnp.zeros((L * S, F)), reps=3)
    out["bwd_scatter1_ms"] = round(dt * 1e3, 3)
    print("bwd_scatter1 done", file=sys.stderr, flush=True)

    # C: sort + segment-sum-by-diff (TPU-friendly: sort, then scatter of
    # unique boundaries) — approximate with jax segment_sum
    @jax.jit
    def bwd_segment(c):
        ii = (idx8 + level_ofs[None] + c).reshape(-1)           # [8*B*L]
        gg = jnp.broadcast_to(g, (8, B, L, F)).reshape(-1, F)
        order = jnp.argsort(ii)
        return jax.ops.segment_sum(gg[order], ii[order], num_segments=L * S)

    dt = measure(lambda s: bwd_segment((s[0, 0] * 0).astype(jnp.int32)), jnp.zeros((L * S, F)), reps=3)
    out["bwd_sort_segment_ms"] = round(dt * 1e3, 3)
    print("bwd_segment done", file=sys.stderr, flush=True)

    # D: sort + sorted-scatter (indices_are_sorted hint, no segment machinery)
    @jax.jit
    def bwd_sorted_scatter(c):
        ii = (idx8 + level_ofs[None] + c).reshape(-1)            # [8*B*L]
        gg = jnp.broadcast_to(g, (8, B, L, F)).reshape(-1, F)
        order = jnp.argsort(ii)
        return jnp.zeros((L * S, F)).at[ii[order]].add(
            gg[order], indices_are_sorted=True
        )

    dt = measure(lambda s: bwd_sorted_scatter((s[0, 0] * 0).astype(jnp.int32)), jnp.zeros((L * S, F)), reps=3)
    out["bwd_sorted_scatter_ms"] = round(dt * 1e3, 3)
    print("bwd_sorted done", file=sys.stderr, flush=True)

    # --- one-hot matmul reformulation (gather/scatter as MXU work) --------
    # split idx = hi*128 + lo; T2 [S/128, 128] per (level, feature).
    # fwd: rows = OH_hi @ T2  -> [Q, 128]; feat = sum(rows * OH_lo, -1)
    # bwd: dT2  = OH_hi^T @ (g[:, None] * OH_lo)
    R = S // 128
    t2 = table.reshape(L, R, 128, F)  # level-major split
    iota_r = jnp.arange(R, dtype=jnp.int32)
    iota_c = jnp.arange(128, dtype=jnp.int32)

    @jax.jit
    def fwd_onehot(c):
        ii = (idx8 + c).transpose(2, 0, 1).reshape(L, 8 * B)     # [L, Q]
        hi = ii // 128
        lo = ii % 128
        oh_hi = (hi[..., None] == iota_r).astype(jnp.bfloat16)   # [L, Q, R]
        oh_lo = (lo[..., None] == iota_c).astype(jnp.float32)    # [L, Q, 128]

        def per_level(ohh, ohl, t2l):
            # [Q, R] @ [R, 128*F] -> [Q, 128*F]
            rows = jax.lax.dot_general(
                ohh, t2l.reshape(R, 128 * F).astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(-1, 128, F)
            return jnp.einsum("qcf,qc->qf", rows, ohl)

        return jax.vmap(per_level)(oh_hi, oh_lo, t2)             # [L, Q, F]

    dt = measure(lambda s: fwd_onehot((s[0, 0, 0] * 0).astype(jnp.int32)), jnp.zeros((L, 8 * B, F)), reps=5)
    out["fwd_onehot_mm_ms"] = round(dt * 1e3, 3)
    print("fwd_onehot done", file=sys.stderr, flush=True)

    @jax.jit
    def bwd_onehot(c):
        ii = (idx8 + c).transpose(2, 0, 1).reshape(L, 8 * B)     # [L, Q]
        gg = jnp.broadcast_to(g, (8, B, L, F)).transpose(2, 0, 1, 3).reshape(L, 8 * B, F)
        hi = ii // 128
        lo = ii % 128
        oh_hi = (hi[..., None] == iota_r).astype(jnp.bfloat16)   # [L, Q, R]
        oh_lo = (lo[..., None] == iota_c).astype(jnp.bfloat16)   # [L, Q, 128]

        def per_level(ohh, ohl, g_l):
            upd = (ohl[:, :, None] * g_l[:, None, :]).reshape(-1, 128 * F)
            return jax.lax.dot_general(
                ohh, upd.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                     # [R, 128*F]

        return jax.vmap(per_level)(oh_hi, oh_lo, gg)

    dt = measure(lambda s: bwd_onehot((s[0, 0, 0] * 0).astype(jnp.int32)), jnp.zeros((L, R, 128 * F)), reps=5)
    out["bwd_onehot_mm_ms"] = round(dt * 1e3, 3)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
