"""Network checkpoint/resume — a capability the reference lacks entirely
(SURVEY.md §5: "Checkpoint / resume: none for network weights or render
state"). Saves the full trainable state (MLP params, EMA weights, Adam
moments, hash-grid tables) so an online-trained cache survives restarts.

Two containers: a portable single-file .npz (default) and an orbax
PyTree checkpoint directory (``format='orbax'`` / CLI
``--checkpoint-format orbax``); loading auto-detects by path type.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import InputEncoding, NetworkConfig
from ..ops.encodings import HashGridParams
from .network import AdamState, MLPParams, NetworkState


def _flatten(state: NetworkState) -> dict:
    out = {
        "params.w_in": state.params.w_in,
        "params.w_hidden": state.params.w_hidden,
        "params.w_out": state.params.w_out,
        "ema.w_in": state.ema.w_in,
        "ema.w_hidden": state.ema.w_hidden,
        "ema.w_out": state.ema.w_out,
        "opt.mu.w_in": state.opt.mu.w_in,
        "opt.mu.w_hidden": state.opt.mu.w_hidden,
        "opt.mu.w_out": state.opt.mu.w_out,
        "opt.nu.w_in": state.opt.nu.w_in,
        "opt.nu.w_hidden": state.opt.nu.w_hidden,
        "opt.nu.w_out": state.opt.nu.w_out,
        "opt.step": state.opt.step,
    }
    if state.grid is not None:
        out["grid.table"] = state.grid.table
        out["ema_grid.table"] = state.ema_grid.table
        out["opt.mu_grid"] = state.opt.mu_grid
        out["opt.nu_grid"] = state.opt.nu_grid
    return out


def _orbax_checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: NetworkState, format: str = "npz") -> str:
    """``format='npz'`` writes a single portable file; ``format='orbax'``
    writes an orbax PyTree checkpoint directory (sharding-aware, the
    standard JAX ecosystem format)."""
    if format == "orbax":
        path = os.path.abspath(path)
        _orbax_checkpointer().save(
            path, {k: np.asarray(v) for k, v in _flatten(state).items()},
            force=True,
        )
        return path
    if not path.endswith(".npz"):
        path += ".npz"
    arrays = {k: np.asarray(v) for k, v in _flatten(state).items()}
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez(path, **arrays)
    return path


def load_checkpoint(path: str, cfg: Optional[NetworkConfig] = None) -> NetworkState:
    """Loads either container: an orbax checkpoint directory or a .npz."""
    if os.path.isdir(path):
        z = _orbax_checkpointer().restore(os.path.abspath(path))
    else:
        if not path.endswith(".npz"):
            path += ".npz"
        z = np.load(path)

    def j(k):
        return jnp.asarray(z[k])

    params = MLPParams(j("params.w_in"), j("params.w_hidden"), j("params.w_out"))
    ema = MLPParams(j("ema.w_in"), j("ema.w_hidden"), j("ema.w_out"))
    mu = MLPParams(j("opt.mu.w_in"), j("opt.mu.w_hidden"), j("opt.mu.w_out"))
    nu = MLPParams(j("opt.nu.w_in"), j("opt.nu.w_hidden"), j("opt.nu.w_out"))
    has_grid = "grid.table" in z
    grid = HashGridParams(j("grid.table")) if has_grid else None
    ema_grid = HashGridParams(j("ema_grid.table")) if has_grid else None
    opt = AdamState(
        mu=mu, nu=nu, step=j("opt.step"),
        mu_grid=j("opt.mu_grid") if has_grid else None,
        nu_grid=j("opt.nu_grid") if has_grid else None,
    )
    if cfg is not None:
        want_grid = cfg.encoding == InputEncoding.HASH
        if want_grid != has_grid:
            raise ValueError(
                f"checkpoint encoding mismatch: file has_grid={has_grid}, "
                f"config wants {'hash' if want_grid else 'frequency'}"
            )
    return NetworkState(params=params, ema=ema, opt=opt, grid=grid, ema_grid=ema_grid)


# ---------------------------------------------------------------------------
# Full render-state checkpoint: network + accumulation + frame counters.
# Superset of the reference (which restarts from scratch on any failure):
# a crashed or preempted render resumes mid-accumulation with the online-
# trained cache, optimizer moments, and the progressive image intact.
# ---------------------------------------------------------------------------

def save_render_state(path: str, renderer, format: str = "npz") -> str:
    """Checkpoint a ``Renderer``: network state + accumulated image +
    iteration / subframe counters + tile size."""
    arrays = {f"net.{k}": np.asarray(v)
              for k, v in _flatten(renderer.net_state).items()}
    arrays["render.image"] = np.asarray(renderer.image)
    arrays["render.iteration"] = np.int64(renderer.iteration)
    arrays["render.total_subframe"] = np.int64(renderer.total_subframe)
    arrays["render.tile_size"] = np.asarray(renderer.cfg.tile_size, np.int32)
    if format == "orbax":
        path = os.path.abspath(path)
        _orbax_checkpointer().save(path, arrays, force=True)
        return path
    if not path.endswith(".npz"):
        path += ".npz"
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)  # atomic: a crash mid-save never corrupts
    return path


def load_render_state(path: str, renderer) -> None:
    """Restore a ``Renderer`` saved by ``save_render_state`` in place
    (either container: orbax directory or .npz)."""
    import dataclasses

    if os.path.isdir(path):
        z = _orbax_checkpointer().restore(os.path.abspath(path))
    else:
        if not path.endswith(".npz"):
            path += ".npz"
        z = np.load(path)

    def j(k):
        return jnp.asarray(z[f"net.{k}"])

    params = MLPParams(j("params.w_in"), j("params.w_hidden"), j("params.w_out"))
    ema = MLPParams(j("ema.w_in"), j("ema.w_hidden"), j("ema.w_out"))
    mu = MLPParams(j("opt.mu.w_in"), j("opt.mu.w_hidden"), j("opt.mu.w_out"))
    nu = MLPParams(j("opt.nu.w_in"), j("opt.nu.w_hidden"), j("opt.nu.w_out"))
    has_grid = "net.grid.table" in z
    grid = HashGridParams(j("grid.table")) if has_grid else None
    ema_grid = HashGridParams(j("ema_grid.table")) if has_grid else None
    opt = AdamState(
        mu=mu, nu=nu, step=j("opt.step"),
        mu_grid=j("opt.mu_grid") if has_grid else None,
        nu_grid=j("opt.nu_grid") if has_grid else None,
    )
    renderer.net_state = NetworkState(
        params=params, ema=ema, opt=opt, grid=grid, ema_grid=ema_grid
    )
    renderer.image = jnp.asarray(z["render.image"])
    renderer.iteration = int(z["render.iteration"])
    renderer.total_subframe = int(z["render.total_subframe"])
    ts = tuple(int(x) for x in z["render.tile_size"])
    if ts != renderer.cfg.tile_size:
        renderer.cfg = dataclasses.replace(renderer.cfg, tile_size=ts)


def is_render_state(path: str) -> bool:
    if os.path.isdir(path):
        return "render.image" in _orbax_checkpointer().restore(
            os.path.abspath(path)
        )
    if not path.endswith(".npz"):
        path += ".npz"
    with np.load(path) as z:
        return "render.image" in z
