"""Pallas ray-triangle intersection: MXU bilinear forms + VPU epilogue.

The XLA brute-force path (``ops/intersect.py``) evaluates full
Möller–Trumbore per ray-triangle pair: ~45 VPU flops/pair, measured
VPU-bound at ~2.5-3.4 ms per 102k-ray x 1224-tri pass on v5e — the
dominant cost of the whole frame (closest hit + shadow any-hit per bounce).

This kernel restructures the test so the per-pair *dot products* ride the
MXU and only ~15 flops/pair stay on the VPU, using the precomputed-plane
(Baldwin–Weber) form of the intersection test:

    triangle -> plane normal  n,  offset d0 = -n.p0
             -> barycentric planes  u(x) = a_u.x + b_u,  v(x) = a_v.x + b_v
       with  a_u = (e2 x n)/|n|^2,  a_v = (n x e1)/|n|^2

    per ray (o, d):  An = n.o + d0   Bn = n.d     t = -An/Bn
                     Au = a_u.o+b_u  Bu = a_u.d   u = Au + t*Bu
                     Av = a_v.o+b_v  Bv = a_v.d   v = Av + t*Bv
       hit iff  u >= 0, v >= 0, u+v <= 1, tmin < t < tmax

All six An..Bv planes for a (ray block x tri block) tile are six
[BN, 8] @ [8, BT] matmuls of the ray tuple X = (o, 1, d, 0) against the
per-triangle plane table W — MXU work — followed by the division, the
four compares and a lane min-reduction on the VPU. The running best
(t, prim) accumulates in the revisited output block across the tri-chunk
grid dimension (output index map constant in j), exactly the k-loop
matmul accumulator pattern. Barycentrics of the single winning triangle
are re-derived outside the kernel (O(N)), as in the XLA path.

Replaces the reference's ``optixTrace`` GAS hit program for
small-to-medium scenes (``Device.cpp:1845-1963`` builds the GAS; the
megakernel traces it from ``raygeneration.cu:227``); the BVH path in
``ops/intersect.py`` remains for large scenes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.math import cross, dot
from .intersect import Hit, RT_MAX, TriSoA

BLOCK_RAYS = 256
BLOCK_TRIS = 512
_BIG_I32 = np.int32(2 ** 30)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def build_plane_table(tris: TriSoA, block_tris: int = BLOCK_TRIS) -> jnp.ndarray:
    """[6, 8, Tp] plane table; padded triangles produce no hits (all-zero
    columns -> Bn = 0 -> t = NaN -> every compare fails)."""
    n = cross(tris.e1, tris.e2)                      # [T, 3]
    nn = dot(n, n)                                   # [T]
    ok = nn > 0.0
    inv_nn = jnp.where(ok, 1.0 / jnp.where(ok, nn, 1.0), 0.0)
    a_u = cross(tris.e2, n) * inv_nn[:, None]
    a_v = cross(n, tris.e1) * inv_nn[:, None]
    n = jnp.where(ok[:, None], n, 0.0)
    d0 = -dot(n, tris.p0)
    b_u = -dot(a_u, tris.p0)
    b_v = -dot(a_v, tris.p0)

    t = tris.num
    tp = _round_up(max(t, 1), block_tris)
    w = jnp.zeros((6, 8, tp), jnp.float32)
    # o-part rows 0-3 (x, y, z, 1); d-part rows 4-6
    w = w.at[0, 0:3, :t].set(n.T).at[0, 3, :t].set(d0)        # An
    w = w.at[1, 4:7, :t].set(n.T)                             # Bn
    w = w.at[2, 0:3, :t].set(a_u.T).at[2, 3, :t].set(b_u)     # Au
    w = w.at[3, 4:7, :t].set(a_u.T)                           # Bu
    w = w.at[4, 0:3, :t].set(a_v.T).at[4, 3, :t].set(b_v)     # Av
    w = w.at[5, 4:7, :t].set(a_v.T)                           # Bv
    return w


def _tile_hits(x, w, tn, tf):
    """Shared MXU+VPU tile body -> (t [BN, BT], ok [BN, BT])."""
    an = jnp.dot(x, w[0], preferred_element_type=jnp.float32)
    bn = jnp.dot(x, w[1], preferred_element_type=jnp.float32)
    au = jnp.dot(x, w[2], preferred_element_type=jnp.float32)
    bu = jnp.dot(x, w[3], preferred_element_type=jnp.float32)
    av = jnp.dot(x, w[4], preferred_element_type=jnp.float32)
    bv = jnp.dot(x, w[5], preferred_element_type=jnp.float32)
    t = -an / bn                                   # NaN/inf on degenerate
    u = au + t * bu
    v = av + t * bv
    ok = (
        (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > tn) & (t < tf)
    )
    return t, ok


def _closest_kernel(x_ref, w_ref, tn_ref, tf_ref, t_ref, i_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[:] = jnp.full_like(t_ref, RT_MAX)
        i_ref[:] = jnp.full_like(i_ref, -1)

    t, ok = _tile_hits(x_ref[:], w_ref[:], tn_ref[:], tf_ref[:])
    tt = jnp.where(ok, t, RT_MAX)
    local_t = jnp.min(tt, axis=1, keepdims=True)              # [BN, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 1)
    local_i = jnp.min(
        jnp.where(tt <= local_t, lane, _BIG_I32), axis=1, keepdims=True
    ) + j * tt.shape[1]
    closer = local_t < t_ref[:]
    t_ref[:] = jnp.where(closer, local_t, t_ref[:])
    i_ref[:] = jnp.where(closer & (local_t < RT_MAX), local_i, i_ref[:])


def _anyhit_kernel(x_ref, w_ref, tn_ref, tf_ref, occ_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        occ_ref[:] = jnp.zeros_like(occ_ref)

    _, ok = _tile_hits(x_ref[:], w_ref[:], tn_ref[:], tf_ref[:])
    occ_ref[:] = occ_ref[:] | jnp.any(ok, axis=1, keepdims=True).astype(
        jnp.int32
    )


def _pad_rays(org, direction, tmin, tmax):
    n = org.shape[0]
    n_pad = _round_up(n, BLOCK_RAYS)
    x = jnp.concatenate(
        [
            org,
            jnp.ones((n, 1), jnp.float32),
            direction,
            jnp.zeros((n, 1), jnp.float32),
        ],
        axis=1,
    )
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        tmin = jnp.pad(tmin, (0, n_pad - n))
        tmax = jnp.pad(tmax, (0, n_pad - n))  # pad tmax=0 -> no hits
    return x, tmin[:, None], tmax[:, None], n_pad


def _grids(n_pad: int, tp: int):
    grid = (n_pad // BLOCK_RAYS, tp // BLOCK_TRIS)
    in_specs = [
        pl.BlockSpec((BLOCK_RAYS, 8), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((6, 8, BLOCK_TRIS), lambda i, j: (0, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BLOCK_RAYS, 1), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BLOCK_RAYS, 1), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    return grid, in_specs


def intersect_planes(
    org: jnp.ndarray,
    direction: jnp.ndarray,
    planes: jnp.ndarray,    # [6, 8, Tp] from build_plane_table
    tris: TriSoA,           # for the O(N) barycentric re-derivation
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    interpret: bool = False,
) -> Hit:
    """Closest hit over all triangles. org/direction [N, 3], tmin/tmax [N]."""
    n = org.shape[0]
    tp = planes.shape[2]
    x, tn, tf, n_pad = _pad_rays(org, direction, tmin, tmax)
    grid, in_specs = _grids(n_pad, tp)

    t, prim = pl.pallas_call(
        _closest_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((BLOCK_RAYS, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_RAYS, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ),
        interpret=interpret,
    )(x, planes, tn, tf)
    t = t[:n, 0]
    prim = prim[:n, 0]
    prim = jnp.where(prim >= tris.num, -1, prim)  # padded-tri guard

    # barycentrics of the single winner (same epilogue as the XLA path)
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


def occluded_planes(
    org: jnp.ndarray,
    direction: jnp.ndarray,
    planes: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Any-hit visibility -> bool [N] (True = occluded)."""
    n = org.shape[0]
    tp = planes.shape[2]
    x, tn, tf, n_pad = _pad_rays(org, direction, tmin, tmax)
    grid, in_specs = _grids(n_pad, tp)

    occ = pl.pallas_call(
        _anyhit_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BLOCK_RAYS, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        interpret=interpret,
    )(x, planes, tn, tf)
    return occ[:n, 0] > 0
