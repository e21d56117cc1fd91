"""Lockstep 8-wide BVH traversal (TPU replacement for ``optixTrace``).

One gather per descend step fetches a wide-node row — all 8 children's
AABBs + pointers (``ops/bvh_wide.py``) — so the slab test prunes up to 8
subtrees per gathered row, vs one box per row in the binary skip-link walk
(``ops/intersect.py::_skip_traverse``). Per BASELINE.md's cost model the
gathered-row count is the only real lever on TPU: wide rows cut it ~4x.

There are no per-lane scatter stacks (the trap that made the round-0
vmapped-stack walk ~100x slower): the traversal stack is a dense
[N, D, 8] i32 array updated with one-hot selects over the static depth
axis D (shape-carried from the build), which is plain VPU math. Per-lane
state:

- ``children`` [N, 8] i32: remaining child metas of the current node
  (NONE = visited/missed/empty). meta >= 0 -> inner wide node; meta < 0
  -> leaf row ~meta.
- ``stack`` [N, D, 8] + ``depth`` [N]: saved sibling sets.
- two-phase like the binary walk: lanes PARK at leaf children; when every
  lane is parked or done, one batched leaf phase intersects leaf_size
  packed triangles, then lanes resume their sibling sets.

Same coherence-sorted 2048-lane chunking as the binary path
(``chunked_over_rays``): each chunk's while_loop exits at ITS slowest ray.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .intersect import RT_MAX, Hit, TriSoA, chunked_over_rays
from .bvh_wide import NONE  # empty child slot (INT32_MIN; ~meta never is)

# Profiling knob: skip the leaf triangle tests (results become wrong) to
# isolate descend-phase cost from leaf-phase cost on real scenes.
import os as _os

_SKIP_LEAF = _os.environ.get("NRC_WIDE_SKIP_LEAF", "0") == "1"


def _wide_traverse(org, direction, wb, tmin, tmax, any_hit: bool,
                   with_stats: bool = False):
    """One chunk's lockstep walk. org/direction [N,3]; returns (t, prim)
    (+ (descend_steps, outer_rounds) scalars when ``with_stats``)."""
    from .bvh_wide import BRANCH as branch

    n = org.shape[0]
    octants, W, row_w = wb["wnode"].shape
    packed = row_w == branch * 4  # bf16-packed vs plain-f32 box layout
    half = branch * 3
    nodes_flat = wb["wnode"].reshape(octants * W, row_w)
    D = wb["depth"].shape[1]  # static max depth
    leaf_size = wb["leaf_pack"].shape[1] // 10

    oct_ = (
        (direction[:, 0] > 0).astype(jnp.int32)
        | ((direction[:, 1] > 0).astype(jnp.int32) << 1)
        | ((direction[:, 2] > 0).astype(jnp.int32) << 2)
    )
    base = oct_ * W
    inv_d = jnp.where(
        jnp.abs(direction) > 1e-20,
        1.0 / jnp.where(direction != 0.0, direction, 1.0),
        np.float32(3.0e38),
    )
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (n, branch), 1)
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (n, D), 1)

    def visit(node, best_t):
        """Gather a wide row and box-test all children -> children set.

        Boxes arrive as conservatively-rounded bf16 pairs packed into f32
        slots (bvh_wide layout): the unpack is dense VPU bit math, traded
        for a 32-f32 row gather that costs the same as the binary walk's
        8-f32 row."""
        row = nodes_flat[base + node]                        # [N, 32|56]
        if packed:
            pk = jax.lax.bitcast_convert_type(row[:, :half], jnp.uint32)
            # a bf16 value IS its bit pattern in the high 16 of an f32: the
            # whole unpack is two u32 mask/shifts + bitcasts (no 16-bit
            # dtypes, whose packed TPU layouts force relayout shuffles)
            blo = jax.lax.bitcast_convert_type(
                pk << jnp.uint32(16), jnp.float32
            ).reshape(n, branch, 3)
            bhi = jax.lax.bitcast_convert_type(
                pk & jnp.uint32(0xFFFF0000), jnp.float32
            ).reshape(n, branch, 3)
            meta = row[:, half:].view(jnp.int32)             # [N, 8]
        else:
            boxes = row[:, : branch * 6].reshape(n, branch, 6)
            blo = boxes[:, :, 0:3]
            bhi = boxes[:, :, 3:6]
            meta = row[:, branch * 6:].view(jnp.int32)       # [N, 8]
        t0 = (blo - org[:, None, :]) * inv_d[:, None, :]
        t1 = (bhi - org[:, None, :]) * inv_d[:, None, :]
        near = jnp.max(jnp.minimum(t0, t1), axis=-1)         # [N, 8]
        far = jnp.min(jnp.maximum(t0, t1), axis=-1)
        cap = jnp.minimum(tmax, best_t)
        hit = jnp.maximum(near, tmin[:, None]) <= jnp.minimum(
            far, cap[:, None]
        )
        # empty slots masked by meta, not box: their inverted AABB can
        # overflow to (-inf, +inf) slabs and read as a hit (see bvh_wide)
        return jnp.where(hit & (meta != NONE), meta, NONE)

    def descend_cond(s):
        children, stack, depth, lrow, done, best_t, best_prim, nd, no = s
        return jnp.any(~done & (lrow < 0))

    def descend(s):
        children, stack, depth, lrow, done, best_t, best_prim, nd, no = s
        nd = nd + 1
        active = ~done & (lrow < 0)

        # lanes with an exhausted sibling set pop (same step)
        empty = ~jnp.any(children != NONE, axis=1)
        out_of_work = active & empty & (depth == 0)
        done = done | out_of_work
        do_pop = active & empty & (depth > 0)
        oh_pop = iota_d == (depth - 1)[:, None]              # [N, D]
        popped = jnp.sum(
            jnp.where(oh_pop[:, :, None], stack, 0), axis=1, dtype=jnp.int32
        )
        children = jnp.where(do_pop[:, None], popped, children)
        depth = jnp.where(do_pop, depth - 1, depth)
        active = active & ~out_of_work

        # near-first pick: slots are octant-sorted, so the FIRST remaining
        # slot is the nearest untested child
        has = children != NONE
        pick = jnp.argmax(has, axis=1)                       # first True
        oh = iota_b == pick[:, None]
        entry = jnp.sum(jnp.where(oh, children, 0), axis=1, dtype=jnp.int32)
        take = active & jnp.any(has, axis=1)
        children = jnp.where((take[:, None] & oh), NONE, children)

        is_leaf = take & (entry < 0) & (entry != NONE)
        is_inner = take & (entry >= 0)

        # leaf child: park for the batched leaf phase (siblings kept)
        lrow = jnp.where(is_leaf, ~entry, lrow)

        # inner child: push the remaining siblings (if any), then visit
        remain = jnp.any(children != NONE, axis=1)
        do_push = is_inner & remain
        oh_push = (iota_d == depth[:, None]) & do_push[:, None]
        stack = jnp.where(oh_push[:, :, None], children[:, None, :], stack)
        depth = depth + do_push.astype(jnp.int32)
        new_children = visit(jnp.where(is_inner, entry, 0), best_t)
        children = jnp.where(is_inner[:, None], new_children, children)

        return children, stack, depth, lrow, done, best_t, best_prim, nd, no

    def outer_cond(s):
        done = s[4]
        return ~jnp.all(done)

    def outer(s):
        children, stack, depth, lrow, done, best_t, best_prim, nd, no = (
            jax.lax.while_loop(descend_cond, descend, s)
        )
        no = no + 1
        # every lane is done or parked at a leaf
        do_leaf = lrow >= 0
        tri = wb["leaf_pack"][jnp.maximum(lrow, 0)]          # [N, ls*10]
        if not _SKIP_LEAF:
            # all leaf_size triangles tested as ONE set of [N, ls]-shaped
            # ops (a per-triangle unrolled loop emits ~15*ls tiny [N] ops,
            # each dispatch-bound at this size — measured 165 us/round vs
            # ~5 us for the equally-sized descend step math)
            blk = tri[:, : 9 * leaf_size].reshape(n, leaf_size, 9)
            p0 = blk[..., 0:3]
            e1 = blk[..., 3:6]
            e2 = blk[..., 6:9]
            pid = tri[:, 9 * leaf_size:].view(jnp.int32)     # [N, ls]
            dirn = direction[:, None, :]
            pvec = jnp.cross(dirn, e2)
            det = jnp.sum(e1 * pvec, axis=-1)                # [N, ls]
            ok = jnp.abs(det) > 1e-12
            invd = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
            tvec = org[:, None, :] - p0
            u = jnp.sum(tvec * pvec, axis=-1) * invd
            qvec = jnp.cross(tvec, e1)
            v = jnp.sum(dirn * qvec, axis=-1) * invd
            t = jnp.sum(e2 * qvec, axis=-1) * invd
            cap = jnp.minimum(tmax, best_t)
            ok = (
                do_leaf[:, None] & ok & (pid >= 0)
                & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > tmin[:, None]) & (t < cap[:, None])
            )
            t_ok = jnp.where(ok, t, RT_MAX)
            k_best = jnp.argmin(t_ok, axis=1)                # [N]
            t_best = jnp.min(t_ok, axis=1)
            hit_any = t_best < cap
            pid_best = jnp.take_along_axis(
                pid, k_best[:, None], axis=1
            )[:, 0]
            best_t = jnp.where(hit_any, t_best, best_t)
            best_prim = jnp.where(hit_any, pid_best, best_prim)
        lrow = jnp.full((n,), -1, jnp.int32)
        if any_hit:
            done = done | (best_prim >= 0)
        return children, stack, depth, lrow, done, best_t, best_prim, nd, no

    dead = tmax <= tmin
    children0 = jnp.where(dead[:, None], NONE, visit(jnp.zeros((n,), jnp.int32), tmax))
    state = (
        children0,
        jnp.full((n, D, branch), NONE),
        jnp.zeros((n,), jnp.int32),
        jnp.full((n,), -1, jnp.int32),
        dead,
        jnp.full((n,), RT_MAX),
        jnp.full((n,), -1, jnp.int32),
        jnp.int32(0),  # descend-step counter (scalar: free in the carry)
        jnp.int32(0),  # outer leaf-round counter
    )
    out = jax.lax.while_loop(outer_cond, outer, state)
    t, prim, nd, no = out[5], out[6], out[7], out[8]
    if with_stats:
        return t, prim, nd, no
    return t, prim


def _chunked_wide(org, direction, wb, tmin, tmax, any_hit: bool):
    return chunked_over_rays(
        lambda o, d, tn, tx: _wide_traverse(o, d, wb, tn, tx, any_hit),
        org, direction, (wb["root"][0], wb["root"][1]), tmin, tmax,
    )


def intersect_wbvh(org, direction, wb, tris: TriSoA, tmin, tmax) -> Hit:
    """Closest hit over the wide BVH; winner barycentrics re-derived (same
    epilogue as the binary/brute-force paths)."""
    t, prim = _chunked_wide(org, direction, wb, tmin, tmax, any_hit=False)
    valid = prim >= 0
    pi = jnp.maximum(prim, 0)
    p0, e1, e2 = tris.gather_rows(pi)
    pvec = jnp.cross(direction, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(
        jnp.abs(det) > 1e-12, 1.0 / jnp.where(det != 0, det, 1.0), 0.0
    )
    tvec = org - p0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(direction * qvec, axis=-1) * inv_det
    return Hit(
        t=jnp.where(valid, t, RT_MAX),
        prim=prim,
        u=jnp.where(valid, u, 0.0),
        v=jnp.where(valid, v, 0.0),
    )


def occluded_wbvh(org, direction, wb, tris: TriSoA, tmin, tmax) -> jnp.ndarray:
    _, prim = _chunked_wide(org, direction, wb, tmin, tmax, any_hit=True)
    return prim >= 0
