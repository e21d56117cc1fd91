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


# ---------------------------------------------------------------------------
# Fully-fused 4-STEP trainer (round 5): the whole per-frame training side —
# 4 sequential Adam steps of B=16384 each (reference NUM_BATCHES semantics,
# neural_radiance_caching.h:29-30) + L2 + bias-corrected Adam + EMA — as ONE
# Pallas kernel. Weights, moments and EMA live in VMEM scratch across all
# four batches; batch data streams through grid blocks (double-buffered DMA).
#
# MXU-width packing: the 64-wide chain wastes half the MXU's 128 output
# lanes (BASELINE.md MFU note), so each grid step processes TWO independent
# 2048-row half-tiles packed side by side — activations [2048, 128] with
# half A in lanes 0-63 and half B in 64-127, hidden weights block-diagonal
# [128, 128] (off-diagonal zeros written once) — halving MXU cycles for the
# hidden+output matmuls and their adjoints. The input layer stays half-width
# (x is a real 128-vector) and dW de-packs by summing diagonal blocks.
# ---------------------------------------------------------------------------

HALF = 2048          # rows per packed half
STREAMS = 2          # independent packed pipelines interleaved per step
TILE_T4 = STREAMS * 2 * HALF   # batch rows consumed per grid step


def _train4_kernel(n_hidden, t_tiles, nb, inv_count, b1, b2, eps, l2, decay,
                   # scalar prefetch
                   sc_ref,
                   # inputs
                   x_ref, t_ref, w_in_ref, w_h_ref, w_out_ref,
                   mu_in_ref, mu_h_ref, mu_out_ref,
                   nu_in_ref, nu_h_ref, nu_out_ref,
                   e_in_ref, e_h_ref, e_out_ref,
                   # outputs
                   loss_ref, ow_in_ref, ow_h_ref, ow_out_ref,
                   omu_in_ref, omu_h_ref, omu_out_ref,
                   onu_in_ref, onu_h_ref, onu_out_ref,
                   oe_in_ref, oe_h_ref, oe_out_ref,
                   # scratch
                   w_in_v, wh_p, wout_p,
                   mu_in_v, mu_h_v, mu_out_v,
                   nu_in_v, nu_h_v, nu_out_v,
                   e_in_v, e_h_v, e_out_v,
                   dwin_v, dwh_p, dwout_p):
    b = pl.program_id(0)
    t = pl.program_id(1)
    W = WIDTH

    @pl.when((b == 0) & (t == 0))
    def _load():
        w_in_v[:] = w_in_ref[:]
        wh_p[:] = jnp.zeros_like(wh_p)
        for i in range(n_hidden):
            wh_p[i, 0:W, 0:W] = w_h_ref[i]
            wh_p[i, W:2 * W, W:2 * W] = w_h_ref[i]
        wout_p[:] = jnp.zeros_like(wout_p)
        wout_p[0:W, 0:OUT_PAD] = w_out_ref[:]
        wout_p[W:2 * W, OUT_PAD:2 * OUT_PAD] = w_out_ref[:]
        mu_in_v[:] = mu_in_ref[:]
        mu_h_v[:] = mu_h_ref[:]
        mu_out_v[:] = mu_out_ref[:]
        nu_in_v[:] = nu_in_ref[:]
        nu_h_v[:] = nu_h_ref[:]
        nu_out_v[:] = nu_out_ref[:]
        e_in_v[:] = e_in_ref[:]
        e_h_v[:] = e_h_ref[:]
        e_out_v[:] = e_out_ref[:]

    @pl.when(t == 0)
    def _zero():
        loss_ref[b, 0] = 0.0
        dwin_v[:] = jnp.zeros_like(dwin_v)
        dwh_p[:] = jnp.zeros_like(dwh_p)
        dwout_p[:] = jnp.zeros_like(dwout_p)

    # ---- forward: STREAMS independent packed pipelines, interleaved ------
    # The 13-matmul chain is dependency-latency-bound (each matmul waits on
    # the previous layer's ReLU), so per layer the ops of S independent
    # streams are issued back to back — the MXU pipelines stream s+1's
    # matmul while stream s's ReLU runs on the VPU.
    xab = []
    for s in range(STREAMS):
        base = s * 2 * HALF
        xab.append((x_ref[0, base:base + HALF, :],
                    x_ref[0, base + HALF:base + 2 * HALF, :]))
    za_s = [_mm(xa, w_in_v[:]) for xa, _ in xab]
    zb_s = [_mm(xb, w_in_v[:]) for _, xb in xab]
    a_s = [
        jnp.concatenate(
            [jnp.maximum(za_s[s], 0.0), jnp.maximum(zb_s[s], 0.0)], axis=1
        ).astype(jnp.bfloat16)               # [HALF, 128] packed
        for s in range(STREAMS)
    ]
    acts_s = [[a] for a in a_s]
    for i in range(n_hidden):
        z_s = [_mm(a_s[s], wh_p[i]) for s in range(STREAMS)]
        a_s = [
            jnp.maximum(z_s[s], 0.0).astype(jnp.bfloat16)
            for s in range(STREAMS)
        ]
        for s in range(STREAMS):
            acts_s[s].append(a_s[s])
    pred_s = [_mm(a_s[s], wout_p[:]) for s in range(STREAMS)]

    # ---- RelativeL2Luminance grad on cols {0..2} of each half ------------
    g_s = []
    for s in range(STREAMS):
        pred = pred_s[s]                     # [HALF, 32]: A 0-15, B 16-31
        base = s * 2 * HALF
        tp = jnp.concatenate(
            [t_ref[0, base:base + HALF, :],
             t_ref[0, base + HALF:base + 2 * HALF, :]], axis=1
        )
        col = jax.lax.broadcasted_iota(jnp.int32, pred.shape, 1)
        rgb = (col % OUT_PAD) < 3
        lum_a = (
            0.299 * pred[:, 0:1] + 0.587 * pred[:, 1:2]
            + 0.114 * pred[:, 2:3]
        )
        lum_b = (
            0.299 * pred[:, OUT_PAD:OUT_PAD + 1]
            + 0.587 * pred[:, OUT_PAD + 1:OUT_PAD + 2]
            + 0.114 * pred[:, OUT_PAD + 2:OUT_PAD + 3]
        )
        denom = jnp.where(
            col < OUT_PAD, lum_a * lum_a + 0.01, lum_b * lum_b + 0.01
        )
        diff = jnp.where(rgb, pred - tp, 0.0)
        loss_ref[b, 0] += jnp.sum(diff * diff / denom) * inv_count
        g_s.append(((2.0 * inv_count) * diff / denom).astype(jnp.bfloat16))

    # ---- backward (stream-interleaved like the forward) ------------------
    def _bwd_mm(gv, wv):
        return jax.lax.dot_general(
            gv.astype(jnp.bfloat16), wv.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for s in range(STREAMS):
        dwout_p[:] += _mm_tn(acts_s[s][-1], g_s[s])
    gw_s = [_bwd_mm(g_s[s], wout_p[:]) for s in range(STREAMS)]
    gw_s = [
        jnp.where(acts_s[s][-1].astype(jnp.float32) > 0.0, gw_s[s], 0.0)
        for s in range(STREAMS)
    ]
    for i in range(n_hidden - 1, -1, -1):
        for s in range(STREAMS):
            dwh_p[i] += _mm_tn(acts_s[s][i], gw_s[s].astype(jnp.bfloat16))
        gw_s = [_bwd_mm(gw_s[s], wh_p[i]) for s in range(STREAMS)]
        # after W_i^T the gradient is wrt acts[i] = relu(z_{i-1}); the
        # relu' mask is acts[i] itself (for i=0 the input layer's
        # activation) — same indexing as the verified _bwd_kernel above
        gw_s = [
            jnp.where(acts_s[s][i].astype(jnp.float32) > 0.0, gw_s[s], 0.0)
            for s in range(STREAMS)
        ]
    for s in range(STREAMS):
        ga = gw_s[s][:, 0:W].astype(jnp.bfloat16)
        gb = gw_s[s][:, W:2 * W].astype(jnp.bfloat16)
        dwin_v[:] += _mm_tn(xab[s][0], ga) + _mm_tn(xab[s][1], gb)

    # ---- batch end: L2 + Adam (bias-corrected) + EMA, in VMEM ------------
    @pl.when(t == t_tiles - 1)
    def _optim():
        lr = sc_ref[0]
        bc1 = sc_ref[1 + b]
        bc2 = sc_ref[1 + nb + b]

        def adam(pv, gv, muv, nuv):
            gv = gv + l2 * pv
            mu = b1 * muv + (1.0 - b1) * gv
            nu = b2 * nuv + (1.0 - b2) * gv * gv
            upd = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
            return pv - lr * upd, mu, nu

        w, m, v = adam(w_in_v[:], dwin_v[:], mu_in_v[:], nu_in_v[:])
        w_in_v[:] = w
        mu_in_v[:] = m
        nu_in_v[:] = v
        e_in_v[:] = decay * e_in_v[:] + (1.0 - decay) * w
        for i in range(n_hidden):
            dw = dwh_p[i, 0:W, 0:W] + dwh_p[i, W:2 * W, W:2 * W]
            w, m, v = adam(wh_p[i, 0:W, 0:W], dw, mu_h_v[i], nu_h_v[i])
            wh_p[i, 0:W, 0:W] = w
            wh_p[i, W:2 * W, W:2 * W] = w
            mu_h_v[i] = m
            nu_h_v[i] = v
            e_h_v[i] = decay * e_h_v[i] + (1.0 - decay) * w
        dw = dwout_p[0:W, 0:OUT_PAD] + dwout_p[W:2 * W, OUT_PAD:2 * OUT_PAD]
        w, m, v = adam(wout_p[0:W, 0:OUT_PAD], dw, mu_out_v[:], nu_out_v[:])
        wout_p[0:W, 0:OUT_PAD] = w
        wout_p[W:2 * W, OUT_PAD:2 * OUT_PAD] = w
        mu_out_v[:] = m
        nu_out_v[:] = v
        e_out_v[:] = decay * e_out_v[:] + (1.0 - decay) * w

    @pl.when((b == pl.num_programs(0) - 1) & (t == t_tiles - 1))
    def _emit():
        ow_in_ref[:] = w_in_v[:]
        for i in range(n_hidden):
            ow_h_ref[i] = wh_p[i, 0:W, 0:W]
        ow_out_ref[:] = wout_p[0:W, 0:OUT_PAD]
        omu_in_ref[:] = mu_in_v[:]
        omu_h_ref[:] = mu_h_v[:]
        omu_out_ref[:] = mu_out_v[:]
        onu_in_ref[:] = nu_in_v[:]
        onu_h_ref[:] = nu_h_v[:]
        onu_out_ref[:] = nu_out_v[:]
        oe_in_ref[:] = e_in_v[:]
        oe_h_ref[:] = e_h_v[:]
        oe_out_ref[:] = e_out_v[:]


@jax.jit
def fused_train4(w_in, w_h, w_out, mu, nu, ema, x4, t4, lr, step0):
    """Four sequential Adam+EMA train steps in ONE kernel.

    ``x4`` [4, B, LANE] bf16 pre-encoded+padded batches, ``t4`` [4, B, 3]
    targets, ``mu``/``nu``/``ema`` MLP-shaped pytrees (tuples
    (in, hidden, out)), ``step0`` the Adam step count BEFORE this frame.
    Returns (losses [4], new_w tuple, new_mu, new_nu, new_ema). Matches 4x
    ``network.train_step`` (frequency path, linear output) to bf16-matmul
    tolerance; parity pinned in test_mlp_pallas.py."""
    nb, bsz, _ = x4.shape
    assert bsz % TILE_T4 == 0
    t_tiles = bsz // TILE_T4
    n_hidden = w_h.shape[0]
    from ..config import NetworkConfig

    ncfg = NetworkConfig()
    b1, b2 = ncfg.adam_beta1, ncfg.adam_beta2
    eps, l2 = ncfg.adam_eps, ncfg.adam_l2_reg
    decay = ncfg.ema_decay
    steps = step0.astype(jnp.float32) + jnp.arange(1, nb + 1, dtype=jnp.float32)
    sc = jnp.concatenate(
        [jnp.reshape(lr.astype(jnp.float32), (1,)), 1.0 - b1 ** steps,
         1.0 - b2 ** steps]
    )  # [1 + nb + nb]
    tpad = jnp.zeros((nb, bsz, OUT_PAD), jnp.float32).at[:, :, :3].set(t4)
    inv_count = 1.0 / float(bsz * 3)

    H, W = n_hidden, WIDTH
    f32 = jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, t_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE_T4, LANE), lambda b, t, sc: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_T4, OUT_PAD), lambda b, t, sc: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(12)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # [nb, 1] losses
        ] + [
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(12)
        ],
        scratch_shapes=[
            pltpu.VMEM((LANE, W), f32),          # w_in_v
            pltpu.VMEM((H, 2 * W, 2 * W), f32),  # wh_p
            pltpu.VMEM((2 * W, 2 * OUT_PAD), f32),  # wout_p
            pltpu.VMEM((LANE, W), f32),          # mu_in_v
            pltpu.VMEM((H, W, W), f32),          # mu_h_v
            pltpu.VMEM((W, OUT_PAD), f32),       # mu_out_v
            pltpu.VMEM((LANE, W), f32),          # nu_in_v
            pltpu.VMEM((H, W, W), f32),          # nu_h_v
            pltpu.VMEM((W, OUT_PAD), f32),       # nu_out_v
            pltpu.VMEM((LANE, W), f32),          # e_in_v
            pltpu.VMEM((H, W, W), f32),          # e_h_v
            pltpu.VMEM((W, OUT_PAD), f32),       # e_out_v
            pltpu.VMEM((LANE, W), f32),          # dwin_v
            pltpu.VMEM((H, 2 * W, 2 * W), f32),  # dwh_p
            pltpu.VMEM((2 * W, 2 * OUT_PAD), f32),  # dwout_p
        ],
    )
    shapes = [
        jax.ShapeDtypeStruct((nb, 1), f32),                 # losses
        jax.ShapeDtypeStruct((LANE, W), f32),
        jax.ShapeDtypeStruct((H, W, W), f32),
        jax.ShapeDtypeStruct((W, OUT_PAD), f32),
    ]
    shapes += shapes[1:] * 3  # mu, nu, ema
    out = pl.pallas_call(
        functools.partial(
            _train4_kernel, n_hidden, t_tiles, nb, inv_count,
            float(b1), float(b2), float(eps), float(l2), float(decay),
        ),
        grid_spec=grid_spec,
        out_shape=shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        sc, x4.astype(jnp.bfloat16), tpad, w_in, w_h, w_out,
        mu[0], mu[1], mu[2], nu[0], nu[1], nu[2], ema[0], ema[1], ema[2],
    )
    losses = out[0][:, 0]
    new_w = (out[1], out[2], out[3])
    new_mu = (out[4], out[5], out[6])
    new_nu = (out[7], out[8], out[9])
    new_ema = (out[10], out[11], out[12])
    return losses, new_w, new_mu, new_nu, new_ema
