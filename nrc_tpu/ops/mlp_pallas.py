"""Fully-fused 64-wide MLP as Pallas TPU kernels — the tiny-cuda-nn
``FullyFusedMLP`` equivalent (reference ``nrc/src/NRCNetwork.cu`` +
``NRCNetworkConfigs.h:26-33``).

One kernel runs the whole 6-matmul chain per batch tile with every
activation resident in VMEM:

- ``fused_forward``: x[B,128] -> out[B,16]; grid over batch tiles, weights
  broadcast to every step, ReLU between layers on the VPU, matmuls on the
  MXU in bf16 with f32 accumulation.
- ``fused_forward_backward`` (via ``jax.custom_vjp``): the backward kernel
  *recomputes* the forward per tile (tcnn-style — no activation round trips
  to HBM), then walks the chain backward, accumulating dW in f32 VMEM
  accumulators across grid steps and emitting dX for encoding gradients.

Install into the network with ``models.network.set_mlp_impl(make_mlp_impl())``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
WIDTH = 64
OUT_PAD = 16
TILE_B = 4096        # forward tile
TILE_B_BWD = 1024    # backward keeps ~6 activation planes in VMEM


def _cdiv(a, b):
    return -(-a // b)


def _mm(a, b):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mm_tn(a, b):
    """a^T @ b with a[B, M], b[B, N] -> [M, N] (contract over batch)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(n_hidden: int, output_relu: bool, x_ref, w_in_ref, w_h_ref,
                w_out_ref, out_ref):
    z = _mm(x_ref[:], w_in_ref[:])
    z = jnp.maximum(z, 0.0)
    for i in range(n_hidden):
        z = _mm(z, w_h_ref[i])
        z = jnp.maximum(z, 0.0)
    out = _mm(z, w_out_ref[:])
    if output_relu:
        out = jnp.maximum(out, 0.0)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("output_relu",))
def fused_forward(w_in, w_h, w_out, x, output_relu=True):
    """x [B, LANE] -> [B, OUT_PAD]. B padded to TILE_B internally."""
    b = x.shape[0]
    bp = _cdiv(b, TILE_B) * TILE_B
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0)))
    n_hidden = w_h.shape[0]
    grid = (bp // TILE_B,)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_hidden, output_relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, WIDTH), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_hidden, WIDTH, WIDTH), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((WIDTH, OUT_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_B, OUT_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, OUT_PAD), jnp.float32),
    )(x, w_in, w_h, w_out)
    return out[:b]


def _bwd_kernel(n_hidden: int, x_ref, g_ref, w_in_ref, w_h_ref, w_out_ref,
                dx_ref, dwin_ref, dwh_ref, dwout_ref):
    """Recompute forward for this tile, then backprop; accumulate dW."""
    first = pl.program_id(0) == 0

    # forward recompute, keeping activations
    a0 = x_ref[:]
    zs = []
    z = _mm(a0, w_in_ref[:])
    zs.append(z)
    a = jnp.maximum(z, 0.0)
    acts = [a]
    for i in range(n_hidden):
        z = _mm(a, w_h_ref[i])
        zs.append(z)
        a = jnp.maximum(z, 0.0)
        acts.append(a)

    # backward (linear output: no output-activation derivative)
    g = g_ref[:]  # [TB, OUT_PAD]
    dwout = _mm_tn(acts[-1], g)
    g = _mm(g, w_out_ref[:].T)
    g = jnp.where(zs[-1] > 0.0, g, 0.0)

    dwh_list = [None] * n_hidden
    for i in range(n_hidden - 1, -1, -1):
        dwh_list[i] = _mm_tn(acts[i], g)
        g = _mm(g, w_h_ref[i].T)
        g = jnp.where(zs[i] > 0.0, g, 0.0)

    dwin = _mm_tn(a0, g)
    dx_ref[:] = _mm(g, w_in_ref[:].T)

    @pl.when(first)
    def _():
        dwin_ref[:] = jnp.zeros_like(dwin_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dwout_ref[:] = jnp.zeros_like(dwout_ref)

    dwin_ref[:] += dwin
    for i in range(n_hidden):
        dwh_ref[i] += dwh_list[i]
    dwout_ref[:] += dwout


@jax.jit
def fused_backward(w_in, w_h, w_out, x, g_out):
    """Returns (dx [B, LANE], dw_in, dw_h, dw_out). g_out: [B, OUT_PAD]."""
    b = x.shape[0]
    bp = _cdiv(b, TILE_B_BWD) * TILE_B_BWD
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0)))
        g_out = jnp.pad(g_out, ((0, bp - b), (0, 0)))
    n_hidden = w_h.shape[0]
    grid = (bp // TILE_B_BWD,)
    dx, dwin, dwh, dwout = pl.pallas_call(
        functools.partial(_bwd_kernel, n_hidden),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B_BWD, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B_BWD, OUT_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, WIDTH), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_hidden, WIDTH, WIDTH), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((WIDTH, OUT_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_B_BWD, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, WIDTH), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_hidden, WIDTH, WIDTH), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((WIDTH, OUT_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, LANE), jnp.float32),
            jax.ShapeDtypeStruct((LANE, WIDTH), jnp.float32),
            jax.ShapeDtypeStruct((n_hidden, WIDTH, WIDTH), jnp.float32),
            jax.ShapeDtypeStruct((WIDTH, OUT_PAD), jnp.float32),
        ],
    )(x, g_out, w_in, w_h, w_out)
    return dx[:b], dwin, dwh, dwout


# ---------------------------------------------------------------------------
# custom_vjp glue: differentiable fused apply
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_apply(w_in, w_h, w_out, x, output_relu=False):
    return fused_forward(w_in, w_h, w_out, x, output_relu=output_relu)


def _fused_fwd(w_in, w_h, w_out, x, output_relu):
    out = fused_forward(w_in, w_h, w_out, x, output_relu=output_relu)
    return out, (w_in, w_h, w_out, x, out)


def _fused_bwd(output_relu, res, g):
    w_in, w_h, w_out, x, out = res
    if output_relu:
        g = jnp.where(out > 0.0, g, 0.0)
    dx, dwin, dwh, dwout = fused_backward(w_in, w_h, w_out, x, g)
    return dwin, dwh, dwout, dx


fused_apply.defvjp(_fused_fwd, _fused_bwd)


def make_mlp_impl(interpret: bool = False):
    """Build a drop-in for ``models.network.set_mlp_impl``.

    The installed function matches ``mlp_forward(params, x_padded,
    output_relu)`` and is differentiable through the fused backward kernel.
    """
    del interpret  # interpret mode is driven by pltpu.force_tpu_interpret_mode

    def impl(params, x_padded, output_relu=True):
        out = fused_apply(
            params.w_in, params.w_hidden, params.w_out, x_padded, output_relu
        )
        return out[:, :3]

    return impl


# ---------------------------------------------------------------------------
# Fully-fused TRAIN gradient: fwd + RelativeL2Luminance grad + bwd in ONE
# kernel (round 4). The XLA train step pays ~117 us at B=16384 (141
# Msamples/s, 11% MFU) with activations round-tripping HBM between the six
# small matmuls; here every activation stays in VMEM (bf16), the loss
# gradient is formed in-kernel, and dW accumulates in f32 VMEM across grid
# steps — the tcnn fully-fused training trick (NRCNetworkConfigs.h:26-33).
# ---------------------------------------------------------------------------

TILE_B_TRAIN = 2048


def _train_kernel(n_hidden: int, inv_count: float, x_ref, t_ref,
                  w_in_ref, w_h_ref, w_out_ref,
                  loss_ref, dwin_ref, dwh_ref, dwout_ref):
    first = pl.program_id(0) == 0

    # forward, activations resident (bf16 — they are matmul inputs anyway)
    a0 = x_ref[:]
    z = _mm(a0, w_in_ref[:])
    a = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
    acts = [a]
    for i in range(n_hidden):
        z = _mm(a, w_h_ref[i])
        a = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
        acts.append(a)
    pred = _mm(acts[-1], w_out_ref[:])          # [TB, OUT_PAD] f32, linear

    # RelativeL2Luminance on the first 3 columns (network.py:202-208):
    # loss = mean((p - t)^2 / (sg(lum(p))^2 + 0.01)); d/dp = 2(p-t)/denom/N
    t = t_ref[:]
    lum = (
        0.299 * pred[:, 0:1] + 0.587 * pred[:, 1:2] + 0.114 * pred[:, 2:3]
    )
    denom = lum * lum + 0.01                    # [TB, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, pred.shape, 1)
    valid = col < 3
    diff = jnp.where(valid, pred - t, 0.0)
    loss_tile = jnp.sum(diff * diff / denom) * inv_count
    g = (2.0 * inv_count) * diff / denom        # [TB, OUT_PAD]

    # backward
    dwout = _mm_tn(acts[-1], g)
    g = _mm(g, w_out_ref[:].T)
    # relu' masks: Mosaic has no bf16 vector compare — compare in f32
    g = jnp.where(acts[-1].astype(jnp.float32) > 0.0, g, 0.0)
    dwh_list = [None] * n_hidden
    for i in range(n_hidden - 1, -1, -1):
        dwh_list[i] = _mm_tn(acts[i], g)
        g = _mm(g, w_h_ref[i].T)
        g = jnp.where(acts[i].astype(jnp.float32) > 0.0, g, 0.0)
    dwin = _mm_tn(a0, g)

    @pl.when(first)
    def _():
        loss_ref[0, 0] = 0.0
        dwin_ref[:] = jnp.zeros_like(dwin_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dwout_ref[:] = jnp.zeros_like(dwout_ref)

    loss_ref[0, 0] += loss_tile
    dwin_ref[:] += dwin
    for i in range(n_hidden):
        dwh_ref[i] += dwh_list[i]
    dwout_ref[:] += dwout


@jax.jit
def fused_train_grad(w_in, w_h, w_out, x, target):
    """One-kernel train gradient: returns (loss, dw_in, dw_h, dw_out).

    ``x`` [B, LANE] encoded+padded queries; ``target`` [B, 3]. Matches
    ``value_and_grad(relative_l2_luminance(mlp_forward(...)))`` of the XLA
    path to bf16-matmul tolerance (parity test in test_mlp_pallas.py).
    Frequency-encoding path only (no dX — the encode has no params)."""
    b = x.shape[0]
    bp = _cdiv(b, TILE_B_TRAIN) * TILE_B_TRAIN
    tpad = jnp.zeros((bp, OUT_PAD), jnp.float32)
    tpad = tpad.at[:b, :3].set(target)
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0)))
    n_hidden = w_h.shape[0]
    grid = (bp // TILE_B_TRAIN,)
    inv_count = 1.0 / float(b * 3)
    loss, dwin, dwh, dwout = pl.pallas_call(
        functools.partial(_train_kernel, n_hidden, inv_count),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B_TRAIN, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B_TRAIN, OUT_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, WIDTH), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_hidden, WIDTH, WIDTH), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WIDTH, OUT_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((LANE, WIDTH), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_hidden, WIDTH, WIDTH), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WIDTH, OUT_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((LANE, WIDTH), jnp.float32),
            jax.ShapeDtypeStruct((n_hidden, WIDTH, WIDTH), jnp.float32),
            jax.ShapeDtypeStruct((WIDTH, OUT_PAD), jnp.float32),
        ],
    )(x, tpad, w_in, w_h, w_out)
    return loss[0, 0], dwin, dwh, dwout
