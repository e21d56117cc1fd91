"""Parametric material system — the TPU-native replacement for MDL JIT codegen.

The reference JIT-compiles MDL materials to per-material PTX direct callables
(``nrc/src/Raytracer.cpp:1674-2536``, ``nrc/src/Device.cpp:2833-3012``). TPUs
have no function pointers, so MDL's *capabilities* become a fixed family of
BSDF archetypes dispatched with ``lax.switch`` over a SoA parameter table:
one row per material, all branches compiled once.

Archetype coverage maps the reference's ``data/mdl/*.mdl`` material set
(diffuse/glossy/specular x reflect/transmit, thin-walled, cutout, emission,
volume absorption/scattering); hair/measured/layered land in later passes.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple

import numpy as np


class Archetype(enum.IntEnum):
    """BSDF archetypes. Order is the ``lax.switch`` branch index."""

    DIFFUSE_REFLECTION = 0     # df::diffuse_reflection_bsdf
    GGX_REFLECT = 1            # df::microfacet_ggx_* / simple_glossy, scatter_reflect
    GGX_TRANSMIT = 2           # ... scatter_transmit
    GGX_REFLECT_TRANSMIT = 3   # ... scatter_reflect_transmit
    SPECULAR_REFLECT = 4       # df::specular_bsdf, scatter_reflect
    SPECULAR_TRANSMIT = 5      # ... scatter_transmit
    SPECULAR_REFLECT_TRANSMIT = 6  # ... scatter_reflect_transmit (glass)
    DIFFUSE_TRANSMISSION = 7   # df::diffuse_transmission_bsdf
    NULL_BSDF = 8              # emission-only materials (black bsdf ends path)
    HAIR = 9                   # df::chiang_hair_bsdf (curve primitives)

NUM_ARCHETYPES = len(Archetype)


class EmissionMode(enum.IntEnum):
    NONE = 0
    RADIANT_EXITANCE = 1  # intensity_radiant_exitance: radiance = I / pi
    POWER = 2             # intensity_power: divide by surface area


@dataclasses.dataclass
class Material:
    """One material row. Mirrors the knobs MDL exposes in the sample set."""

    name: str = "default"
    archetype: Archetype = Archetype.DIFFUSE_REFLECTION
    albedo: Tuple[float, float, float] = (1.0, 1.0, 1.0)   # tint
    roughness: Tuple[float, float] = (0.0, 0.0)            # (u, v)
    ior: float = 1.5
    thin_walled: bool = False
    emission_intensity: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    emission_mode: EmissionMode = EmissionMode.NONE
    # homogeneous volume coefficients (entered on transmission)
    sigma_a: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    sigma_s: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    volume_bias: float = 0.0   # HG phase anisotropy g
    cutout_opacity: float = 1.0
    # chiang hair BSDF parameters (data/mdl/bsdf_hair.mdl); albedo doubles
    # as the diffuse reflection tint
    hair_roughness: Tuple[Tuple[float, float], ...] = (
        (0.1, 0.1), (0.2, 0.2), (0.3, 0.3),
    )  # (longitudinal, azimuthal) per lobe R / TT / TRT
    hair_absorption: Tuple[float, float, float] = (0.02, 0.3, 0.6)
    hair_cuticle_angle: float = 0.0524  # radians (3 deg default)
    hair_diffuse_weight: float = 0.0

    @property
    def is_emissive(self) -> bool:
        return self.emission_mode != EmissionMode.NONE and any(
            c > 0.0 for c in self.emission_intensity
        )


@dataclasses.dataclass
class MaterialTable:
    """SoA device-ready material parameter table (float32/int32 arrays)."""

    archetype: np.ndarray           # [M] int32
    albedo: np.ndarray              # [M, 3] f32
    roughness: np.ndarray           # [M, 2] f32
    ior: np.ndarray                 # [M] f32
    thin_walled: np.ndarray         # [M] int32
    emission_intensity: np.ndarray  # [M, 3] f32
    emission_mode: np.ndarray       # [M] int32
    sigma_a: np.ndarray             # [M, 3] f32
    sigma_s: np.ndarray             # [M, 3] f32
    volume_bias: np.ndarray         # [M] f32
    cutout_opacity: np.ndarray      # [M] f32
    hair_roughness: np.ndarray      # [M, 3, 2] f32
    hair_absorption: np.ndarray     # [M, 3] f32
    hair_cuticle_angle: np.ndarray  # [M] f32
    hair_diffuse_weight: np.ndarray  # [M] f32

    @staticmethod
    def build(materials: list[Material]) -> "MaterialTable":
        if not materials:
            materials = [Material()]
        return MaterialTable(
            archetype=np.asarray([int(m.archetype) for m in materials], np.int32),
            albedo=np.asarray([m.albedo for m in materials], np.float32),
            roughness=np.asarray([m.roughness for m in materials], np.float32),
            ior=np.asarray([m.ior for m in materials], np.float32),
            thin_walled=np.asarray([int(m.thin_walled) for m in materials], np.int32),
            emission_intensity=np.asarray(
                [m.emission_intensity for m in materials], np.float32
            ),
            emission_mode=np.asarray([int(m.emission_mode) for m in materials], np.int32),
            sigma_a=np.asarray([m.sigma_a for m in materials], np.float32),
            sigma_s=np.asarray([m.sigma_s for m in materials], np.float32),
            volume_bias=np.asarray([m.volume_bias for m in materials], np.float32),
            cutout_opacity=np.asarray([m.cutout_opacity for m in materials], np.float32),
            hair_roughness=np.asarray(
                [m.hair_roughness for m in materials], np.float32
            ),
            hair_absorption=np.asarray(
                [m.hair_absorption for m in materials], np.float32
            ),
            hair_cuticle_angle=np.asarray(
                [m.hair_cuticle_angle for m in materials], np.float32
            ),
            hair_diffuse_weight=np.asarray(
                [m.hair_diffuse_weight for m in materials], np.float32
            ),
        )

    @property
    def num_materials(self) -> int:
        return int(self.archetype.shape[0])
