"""Network input encodings: TriangleWave + OneBlob + Identity, and the
multiresolution hash grid.

TPU-native equivalents of tiny-cuda-nn's composite encoding configured in
``nrc/inc/NRCNetworkConfigs.h:49-127``:

- frequency path: TriangleWave(3 position dims x 12 frequencies -> 36)
  + OneBlob(6 dims [dir2, normal2, roughness2] x 4 bins -> 24)
  + Identity(6 dims [diffuse3, specular3]) = 66 features
- hash path: HashGrid(3 dims, 16 levels, 2 features/level, 2^15 table,
  base res 16, per-level scale 2.0 -> 32) + OneBlob(24) + Identity(6) = 62

The raw query layout ([15]) comes from ``integrator.make_query``. Spherical
angles are normalized into [0,1] before OneBlob (a TPU-side improvement —
tcnn feeds radians straight in; the blob kernel works best on a unit
domain). All outputs are padded-to-lane-width by the MLP, not here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import NetworkConfig

M_PI = float(jnp.pi)

# raw query column layout (integrator.make_query)
POS = slice(0, 3)
DIR = slice(3, 5)       # (theta [0,pi], phi [-pi,pi])
NORMAL = slice(5, 7)
ROUGH = slice(7, 9)
DIFFUSE = slice(9, 12)
SPECULAR = slice(12, 15)


def triangle_wave(x: jnp.ndarray, n_frequencies: int) -> jnp.ndarray:
    """tcnn-style triangle wave over octave frequencies.

    x: [..., D] -> [..., D * n_frequencies]; tri_j(x) = tri(x * 2^j) with a
    unit-period triangle wave in [0, 1].
    """
    freqs = jnp.asarray([2.0 ** j for j in range(n_frequencies)], x.dtype)
    xs = x[..., :, None] * freqs  # [..., D, F]
    tri = jnp.abs(2.0 * (xs - jnp.floor(xs + 0.5)))
    return tri.reshape(*x.shape[:-1], x.shape[-1] * n_frequencies)


def one_blob(x: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """One-blob encoding (Gaussian kernel over bin centers), domain [0, 1].

    x: [..., D] -> [..., D * n_bins].
    """
    centers = (jnp.arange(n_bins, dtype=x.dtype) + 0.5) / n_bins
    sigma = 1.0 / n_bins
    d = x[..., :, None] - centers  # [..., D, K]
    blob = jnp.exp(-0.5 * (d / sigma) ** 2)
    return blob.reshape(*x.shape[:-1], x.shape[-1] * n_bins)


def _normalized_blob_inputs(query: jnp.ndarray) -> jnp.ndarray:
    """dir/normal/roughness -> [0, 1] domain for OneBlob."""
    theta_d = query[..., 3] / M_PI
    phi_d = (query[..., 4] + M_PI) / (2.0 * M_PI)
    theta_n = query[..., 5] / M_PI
    phi_n = (query[..., 6] + M_PI) / (2.0 * M_PI)
    return jnp.stack(
        [theta_d, phi_d, theta_n, phi_n, query[..., 7], query[..., 8]], axis=-1
    )


def encode_frequency(query: jnp.ndarray, cfg: NetworkConfig) -> jnp.ndarray:
    """Frequency-path composite encoding: [.., 15] -> [.., 66]."""
    tri = triangle_wave(query[..., POS], cfg.freq_n_frequencies)
    blob = one_blob(_normalized_blob_inputs(query), cfg.oneblob_n_bins)
    ident = query[..., 9:15]
    return jnp.concatenate([tri, blob, ident], axis=-1)


def frequency_encoded_dims(cfg: NetworkConfig) -> int:
    return 3 * cfg.freq_n_frequencies + 6 * cfg.oneblob_n_bins + 6


# ---------------------------------------------------------------------------
# Multiresolution hash grid (Instant-NGP style; tcnn HashGrid)
# ---------------------------------------------------------------------------

_PRIMES = (1, 2654435761, 805459861)


class HashGridParams(NamedTuple):
    """Trainable hash tables: [n_levels, 2^log2_size, n_features]."""

    table: jnp.ndarray


def init_hash_grid(key: jax.Array, cfg: NetworkConfig) -> HashGridParams:
    size = 2 ** cfg.hash_log2_size
    # tcnn initializes U(-1e-4, 1e-4)
    table = jax.random.uniform(
        key,
        (cfg.hash_n_levels, size, cfg.hash_n_features_per_level),
        minval=-1e-4,
        maxval=1e-4,
        dtype=jnp.float32,
    )
    return HashGridParams(table=table)


def _hash_coords(ix, iy, iz, log2_size: int):
    h = (
        ix.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
        ^ iy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
        ^ iz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2])
    )
    return (h & jnp.uint32(2 ** log2_size - 1)).astype(jnp.int32)


def _corner_index_weight(pos: jnp.ndarray, level: int, corner: int,
                         cfg: NetworkConfig):
    """Hash index + trilinear weight of one voxel corner at one level."""
    res = int(cfg.hash_base_resolution * (cfg.hash_per_level_scale ** level))
    p = pos * res
    p0 = jnp.floor(p)
    frac = p - p0
    p0 = p0.astype(jnp.int32)
    dx, dy, dz = (corner & 1), ((corner >> 1) & 1), ((corner >> 2) & 1)
    idx = _hash_coords(
        p0[..., 0] + dx, p0[..., 1] + dy, p0[..., 2] + dz, cfg.hash_log2_size
    )
    w = (
        jnp.where(dx, frac[..., 0], 1.0 - frac[..., 0])
        * jnp.where(dy, frac[..., 1], 1.0 - frac[..., 1])
        * jnp.where(dz, frac[..., 2], 1.0 - frac[..., 2])
    )
    return idx, w


def hash_grid_lookup(
    pos: jnp.ndarray, params: HashGridParams, cfg: NetworkConfig
) -> jnp.ndarray:
    """Trilinear hash-grid features. pos: [..., 3] in roughly [0, 1]^3.

    -> [..., n_levels * n_features]. Gathers run as XLA dynamic-gathers over
    the HBM-resident tables; the sharded multi-host variant (SURVEY P6) is
    ``sharded_hash_grid_lookup`` below.
    """
    feats = []
    for level in range(cfg.hash_n_levels):
        f_acc = 0.0
        for corner in range(8):
            idx, w = _corner_index_weight(pos, level, corner, cfg)
            f_acc = f_acc + w[..., None] * params.table[level, idx]
        feats.append(f_acc)
    return jnp.concatenate(feats, axis=-1)


def sharded_hash_grid_lookup(
    pos: jnp.ndarray, params: HashGridParams, cfg: NetworkConfig,
    axis_name: str,
) -> jnp.ndarray:
    """Hash-grid lookup with tables SHARDED over a mesh axis (SURVEY P6 —
    the capability the reference lacks: tcnn's table is single-GPU HBM,
    ``NRCNetworkConfigs.h:96-105``).

    Runs inside ``shard_map``. ``params.table`` is this device's block
    [L, S/D, F] of the global [L, S, F] table (block row-sharding: global
    row = shard_id * S/D + local row). Per level:

    1. every device all_gathers all devices' (corner index, trilinear
       weight) pairs — small int/f32 traffic over ICI;
    2. computes the weighted partial feature sums for the rows IT owns;
    3. ``psum_scatter`` routes each requester's completed features back.

    The whole dance is differentiable: the adjoint of ``psum_scatter`` is
    ``all_gather`` and the adjoint of the masked gather is the scatter-add
    into the local shard — i.e. autodiff derives the distributed
    embedding-gradient exchange for free.
    """
    local_size = params.table.shape[1]
    my = jax.lax.axis_index(axis_name)
    b = pos.shape[0]
    feats = []
    for level in range(cfg.hash_n_levels):
        part = None
        for corner in range(8):
            idx, w = _corner_index_weight(pos, level, corner, cfg)
            g_idx = jax.lax.all_gather(idx, axis_name)   # [D, B]
            g_w = jax.lax.all_gather(w, axis_name)       # [D, B]
            owner = g_idx // local_size
            local = g_idx - owner * local_size
            f = params.table[level, jnp.clip(local, 0, local_size - 1)]
            mine = (owner == my)[..., None]
            contrib = jnp.where(mine, g_w[..., None] * f, 0.0)
            part = contrib if part is None else part + contrib
        # [D, B, F] partial sums -> each device receives its own [B, F]
        feats.append(jax.lax.psum_scatter(part, axis_name, scatter_dimension=0))
    return jnp.concatenate(feats, axis=-1).reshape(b, -1)


def encode_hash(
    query: jnp.ndarray, params: HashGridParams, cfg: NetworkConfig
) -> jnp.ndarray:
    """Hash-path composite encoding: [.., 15] -> [.., 62].

    Positions arrive pre-scaled by ``FrameConfig.position_scale`` (roughly
    [-0.05, 0.05] for Cornell); re-center into [0,1]^3 for the grid.
    """
    pos01 = query[..., POS] * 5.0 + 0.5
    if cfg.hash_shard_axis is not None:
        grid = sharded_hash_grid_lookup(pos01, params, cfg, cfg.hash_shard_axis)
    else:
        grid = hash_grid_lookup(pos01, params, cfg)
    blob = one_blob(_normalized_blob_inputs(query), cfg.oneblob_n_bins)
    ident = query[..., 9:15]
    return jnp.concatenate([grid, blob, ident], axis=-1)


def hash_encoded_dims(cfg: NetworkConfig) -> int:
    return (
        cfg.hash_n_levels * cfg.hash_n_features_per_level
        + 6 * cfg.oneblob_n_bins
        + 6
    )
