"""Tonemapper: batched JAX replica of the reference's CPU/GLSL tone pipeline.

The reference implements the same formula twice — a GLSL fragment shader
(``nrc/src/Rasterizer.cpp:548-577``) and a CPU loop for screenshots
(``nrc/src/Application.cpp:2596-2645``). Here it is once, vectorized over
the whole HDR image; runs on TPU or CPU under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import TonemapperConfig
from .math import luminance


def tonemap(hdr: jnp.ndarray, cfg: TonemapperConfig) -> jnp.ndarray:
    """HDR [..., 3] float -> LDR [..., 3] float in [0, 1]."""
    inv_gamma = 1.0 / cfg.gamma
    color_balance = jnp.asarray(cfg.color_balance, dtype=hdr.dtype)
    inv_white_point = cfg.brightness / cfg.white_point
    burn = cfg.burn_highlights
    crush = cfg.crush_blacks + cfg.crush_blacks + 1.0
    saturation = cfg.saturation

    ldr = inv_white_point * color_balance * hdr
    ldr = ldr * ((ldr * burn) + 1.0) / (ldr + 1.0)

    lum = luminance(ldr)[..., None]
    ldr = lum + saturation * (ldr - lum)
    ldr = jnp.maximum(ldr, 0.0)

    lum = luminance(ldr)[..., None]
    crushed = jnp.power(jnp.maximum(ldr, 0.0), crush)
    t = jnp.sqrt(jnp.maximum(lum, 0.0))
    ldr = jnp.where(lum < 1.0, crushed + t * (ldr - crushed), ldr)
    ldr = jnp.maximum(ldr, 0.0)

    return jnp.clip(jnp.power(ldr, inv_gamma), 0.0, 1.0)


def tonemap_to_u8(hdr: jnp.ndarray, cfg: TonemapperConfig) -> jnp.ndarray:
    return (tonemap(hdr, cfg) * 255.0).astype(jnp.uint8)
