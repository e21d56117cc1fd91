"""Ray / rounded-cone intersection for hair & curve primitives.

TPU-native replacement for OptiX's built-in cubic-B-spline curve
intersector (reference ``Device.cpp:857-863`` builtin IS module +
``__closesthit__curves``, ``hit.cu:1665-2046``). Strands are tessellated on
the host into *rounded cones* — linear segments swept with linearly varying
radius (``scene/hair.py``) — which admit a closed-form quadratic
intersection that vectorizes cleanly onto the VPU: no per-thread spline
root-finding, no divergence.

The analytic round-cone test follows the standard quadratic formulation
(lateral surface + two sphere caps). Traversal mirrors the triangle BVH in
``ops/intersect.py`` (binned-SAH nodes from the native builder over segment
AABBs).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

DENOM = 1e-20
RT_MAX = np.float32(3.0e38)
MAX_STACK = 48


class CurveHit(NamedTuple):
    t: jnp.ndarray      # [N]
    prim: jnp.ndarray   # [N] segment id (-1 = miss)

    @property
    def valid(self) -> jnp.ndarray:
        return self.prim >= 0


def segment_aabb_corners(pa, pb, ra, rb):
    """Conservative per-segment AABB corner points for the BVH builder
    (fed as degenerate 'triangles' to ``bvh_build_binned_sah``)."""
    lo = np.minimum(pa - ra[:, None], pb - rb[:, None]).astype(np.float32)
    hi = np.maximum(pa + ra[:, None], pb + rb[:, None]).astype(np.float32)
    return lo, hi, lo.copy()


def _roundcone_t(o, d, pa, ba, ra, rb, m0, tmin, tmax):
    """Scalar round-cone intersection: smallest valid t, or RT_MAX.

    Lateral cone surface via the quadratic in (k2, k1, k0); sphere caps at
    both endpoints. ``d`` must be normalized. All inputs scalar/vec3; used
    inside per-ray leaf loops (vmapped over rays).
    """
    oa = o - pa
    ob = oa - ba
    rr = ra - rb
    m1 = jnp.dot(ba, oa)
    m2 = jnp.dot(ba, d)
    m3 = jnp.dot(d, oa)
    m5 = jnp.dot(oa, oa)
    m6 = jnp.dot(ob, d)
    m7 = jnp.dot(ob, ob)

    d2 = m0 - rr * rr
    k2 = d2 - m2 * m2
    k1 = d2 * m3 - m1 * m2 + m2 * rr * ra
    k0 = d2 * m5 - m1 * m1 + m1 * rr * ra * 2.0 - m0 * ra * ra

    h = k1 * k1 - k0 * k2
    safe_k2 = jnp.where(jnp.abs(k2) > DENOM, k2, 1.0)
    t_body = (-jnp.sqrt(jnp.maximum(h, 0.0)) - k1) / safe_k2
    y = m1 - ra * rr + t_body * m2
    body_ok = (
        (h >= 0.0) & (jnp.abs(k2) > DENOM)
        & (y > 0.0) & (y < d2)
        & (t_body > tmin) & (t_body < tmax)
    )
    t_body = jnp.where(body_ok, t_body, RT_MAX)

    # sphere caps
    h1 = m3 * m3 - m5 + ra * ra
    t_ca = -m3 - jnp.sqrt(jnp.maximum(h1, 0.0))
    ca_ok = (h1 >= 0.0) & (t_ca > tmin) & (t_ca < tmax)
    t_ca = jnp.where(ca_ok, t_ca, RT_MAX)

    h2 = m6 * m6 - m7 + rb * rb
    t_cb = -m6 - jnp.sqrt(jnp.maximum(h2, 0.0))
    cb_ok = (h2 >= 0.0) & (t_cb > tmin) & (t_cb < tmax)
    t_cb = jnp.where(cb_ok, t_cb, RT_MAX)

    return jnp.minimum(t_body, jnp.minimum(t_ca, t_cb))


class CurveSoA(NamedTuple):
    """Device-resident segment arrays (+ precomputed ba, m0)."""

    pa: jnp.ndarray         # [K, 3]
    ba: jnp.ndarray         # [K, 3] pb - pa
    ra: jnp.ndarray         # [K]
    rb: jnp.ndarray         # [K]
    m0: jnp.ndarray         # [K] dot(ba, ba)
    u_a: jnp.ndarray        # [K]
    u_b: jnp.ndarray        # [K]
    reference: jnp.ndarray  # [K, 3]
    color_a: jnp.ndarray    # [K, 3]
    color_b: jnp.ndarray    # [K, 3]
    material_id: jnp.ndarray  # [K] i32

    @property
    def num(self) -> int:
        return int(self.pa.shape[0])

    @staticmethod
    def build(seg) -> "CurveSoA":
        """From a host ``scene.hair.CurveSegments``."""
        ba = (seg.pb - seg.pa).astype(np.float32)
        return CurveSoA(
            pa=jnp.asarray(seg.pa),
            ba=jnp.asarray(ba),
            ra=jnp.asarray(seg.ra),
            rb=jnp.asarray(seg.rb),
            m0=jnp.asarray(np.sum(ba * ba, axis=-1)),
            u_a=jnp.asarray(seg.u_a),
            u_b=jnp.asarray(seg.u_b),
            reference=jnp.asarray(seg.reference),
            color_a=jnp.asarray(seg.color_a),
            color_b=jnp.asarray(seg.color_b),
            material_id=jnp.asarray(seg.material_id, jnp.int32),
        )


def build_curve_bvh(seg, max_leaf: int = 4):
    """Binned-SAH BVH over segment AABBs via the native builder."""
    from .bvh import build_bvh

    lo, hi, lo2 = segment_aabb_corners(seg.pa, seg.pb, seg.ra, seg.rb)
    return build_bvh(lo, hi, lo2, max_leaf=max_leaf)


def _ray_aabb(o, inv_d, lo, hi, tmin, tmax):
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    near = jnp.maximum(jnp.max(tn), tmin)
    far = jnp.minimum(jnp.min(tf), tmax)
    return near <= far, near


def _traverse_one(o, d, tmin, tmax, bvh, curves: CurveSoA, any_hit: bool):
    inv_d = jnp.where(
        jnp.abs(d) > 1e-20, 1.0 / d, np.float32(1e20) * jnp.sign(d) + 1e20
    )
    lo, hi = bvh["lo"], bvh["hi"]
    left, right = bvh["left"], bvh["right"]
    start, count = bvh["start"], bvh["count"]
    order = bvh["order"]

    # NOTE: no ``lax.cond`` between leaf/inner work. Under vmap a cond
    # lowers to select-of-both-branches, and on XLA:TPU a batched
    # dynamic-trip fori_loop nested inside that select materializes a
    # [rays, nodes, 3] temporary that overflows the int32 allocation bound
    # (observed with 200k+ nodes). The flat masked form compiles cleanly;
    # per-lane divergence cost is identical (both sides ran anyway).
    def step(state):
        sp, stack, best_t, best_prim = state
        sp = sp - 1
        node = stack[sp]
        is_leaf = count[node] > 0

        # --- leaf: scan the (<= max_leaf) primitive range, masked ---
        s = start[node]
        c = jnp.where(is_leaf, count[node], 0)

        def body(i, best):
            bt, bp = best
            p = order[s + i]
            t = _roundcone_t(
                o, d, curves.pa[p], curves.ba[p], curves.ra[p], curves.rb[p],
                curves.m0[p], tmin, jnp.minimum(bt, tmax),
            )
            ok = t < jnp.minimum(bt, tmax)
            return jnp.where(ok, t, bt), jnp.where(ok, p, bp)

        best_t, best_prim = jax.lax.fori_loop(0, c, body, (best_t, best_prim))

        # --- inner: push children ordered by entry distance, masked ---
        l = jnp.where(is_leaf, node, left[node])
        r = jnp.where(is_leaf, node, right[node])
        cap = jnp.minimum(best_t, tmax)
        hit_l, near_l = _ray_aabb(o, inv_d, lo[l], hi[l], tmin, cap)
        hit_r, near_r = _ray_aabb(o, inv_d, lo[r], hi[r], tmin, cap)
        near_first = near_l <= near_r
        first = jnp.where(near_first, l, r)
        second = jnp.where(near_first, r, l)
        hit_first = jnp.where(near_first, hit_l, hit_r) & ~is_leaf
        hit_second = jnp.where(near_first, hit_r, hit_l) & ~is_leaf
        stack = stack.at[sp].set(second)
        sp = sp + hit_second.astype(jnp.int32)
        stack = stack.at[sp].set(first)
        sp = sp + hit_first.astype(jnp.int32)
        return sp, stack, best_t, best_prim

    def cond(state):
        sp, _, _, best_prim = state
        not_done = sp > 0
        if any_hit:
            not_done = not_done & (best_prim < 0)
        return not_done

    stack0 = jnp.zeros((MAX_STACK,), jnp.int32)
    root_hit, _ = _ray_aabb(o, inv_d, lo[0], hi[0], tmin, tmax)
    state = (root_hit.astype(jnp.int32), stack0, RT_MAX, np.int32(-1))
    _, _, t, prim = jax.lax.while_loop(cond, step, state)
    return t, prim


def intersect_curves_bvh(org, direction, bvh, curves: CurveSoA, tmin, tmax) -> CurveHit:
    t, prim = jax.vmap(
        lambda o, d, a, b: _traverse_one(o, d, a, b, bvh, curves, any_hit=False)
    )(org, direction, tmin, tmax)
    return CurveHit(t=t, prim=prim)


def occluded_curves_bvh(org, direction, bvh, curves: CurveSoA, tmin, tmax) -> jnp.ndarray:
    _, prim = jax.vmap(
        lambda o, d, a, b: _traverse_one(o, d, a, b, bvh, curves, any_hit=True)
    )(org, direction, tmin, tmax)
    return prim >= 0


def intersect_curves_bruteforce(
    org, direction, curves: CurveSoA, tmin, tmax, chunk: int = 512
) -> CurveHit:
    """All-pairs [N, K] test for small segment counts (tests/oracles)."""

    def one(o, d, tn, tf):
        ts = jax.vmap(
            lambda pa, ba, ra, rb, m0: _roundcone_t(o, d, pa, ba, ra, rb, m0, tn, tf)
        )(curves.pa, curves.ba, curves.ra, curves.rb, curves.m0)
        best = jnp.argmin(ts)
        t = ts[best]
        return t, jnp.where(t < RT_MAX, best.astype(jnp.int32), np.int32(-1))

    t, prim = jax.vmap(one)(org, direction, tmin, tmax)
    return CurveHit(t=t, prim=prim)


class CurveFrame(NamedTuple):
    normal: jnp.ndarray    # [N, 3] rounded-cone surface normal
    tangent: jnp.ndarray   # [N, 3] fiber tangent (longitudinal axis)
    b1: jnp.ndarray        # [N, 3] azimuthal frame (from the strand reference)
    b2: jnp.ndarray        # [N, 3]
    u_fiber: jnp.ndarray   # [N]
    v_fiber: jnp.ndarray   # [N]
    color: jnp.ndarray     # [N, 3] interpolated strand color


def curve_shading_frame(curves: CurveSoA, prim, x) -> CurveFrame:
    """Shading attributes at hit point ``x`` on segment ``prim``: the
    rounded-cone surface normal, the fiber tangent, a per-strand-stable
    azimuthal frame, the texture coordinates the reference exposes as
    uFiber/vFiber (``hit.cu:1769-1816``), and the interpolated strand color.
    """
    p = jnp.maximum(prim, 0)
    pa = curves.pa[p]
    ba = curves.ba[p]
    m0 = jnp.maximum(curves.m0[p], DENOM)
    ra = curves.ra[p]
    rb = curves.rb[p]

    y = jnp.sum((x - pa) * ba, axis=-1)
    rr = ra - rb
    d2 = m0 - rr * rr
    on_body = (y > 0.0) & (y < d2)
    # body normal: d2*(x - pa) - ba*y ; cap normals: from the cap centers
    n_body = d2[..., None] * (x - pa) - ba * y[..., None]
    cap_a = y <= 0.0
    n_cap = jnp.where(
        cap_a[..., None], x - pa, x - (pa + ba)
    )
    n = jnp.where(on_body[..., None], n_body, n_cap)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), DENOM)

    tangent = ba / jnp.maximum(jnp.sqrt(m0)[..., None], DENOM)

    s = jnp.clip(y / m0, 0.0, 1.0)
    u_fiber = curves.u_a[p] + s * (curves.u_b[p] - curves.u_a[p])
    color = (
        curves.color_a[p]
        + s[..., None] * (curves.color_b[p] - curves.color_a[p])
    )

    # vFiber: azimuth of the surface normal around the fiber, measured
    # against the per-strand reference bitangent (Curves.cpp:186-234;
    # hit.cu fiber state). Range [0, 1).
    ref = curves.reference[p]
    b1 = ref - tangent * jnp.sum(ref * tangent, axis=-1, keepdims=True)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1, axis=-1, keepdims=True), DENOM)
    b2 = jnp.cross(tangent, b1)
    ang = jnp.arctan2(jnp.sum(n * b2, axis=-1), jnp.sum(n * b1, axis=-1))
    v_fiber = (ang / (2.0 * jnp.pi)) % 1.0

    return CurveFrame(n, tangent, b1, b2, u_fiber, v_fiber, color)
