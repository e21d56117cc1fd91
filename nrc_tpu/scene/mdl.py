"""Mini-MDL reader: maps the reference's ``data/mdl/*.mdl`` files to archetypes.

The reference runs the full NVIDIA MDL SDK compiler (``Raytracer.cpp:1458-2536``)
to JIT each material to PTX. Our parametric material system (``materials.py``)
doesn't need codegen — this module reads the small declarative subset of MDL
actually used by the sample scenes (single df:: BSDF + optional emission +
parameter defaults) and produces a ``Material`` row.

Unknown/unsupported MDL constructs degrade gracefully to a diffuse material
so arbitrary scenes still load.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional, Tuple

import numpy as np

from .materials import Archetype, EmissionMode, Material

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"


def _parse_params(text: str) -> Dict[str, object]:
    """Extract ``uniform <type> name = default`` parameter defaults."""
    params: Dict[str, object] = {}
    # color(...) defaults
    for m in re.finditer(
        rf"(?:uniform\s+)?color\s+(\w+)\s*=\s*color\(\s*({_NUM})(?:\s*,\s*({_NUM})\s*,\s*({_NUM}))?\s*\)",
        text,
    ):
        name = m.group(1)
        if m.group(3) is not None:
            params[name] = (float(m.group(2)), float(m.group(3)), float(m.group(4)))
        else:
            v = float(m.group(2))
            params[name] = (v, v, v)
    # float2 defaults (e.g. per-lobe hair roughness)
    for m in re.finditer(
        rf"(?:uniform\s+)?float2\s+(\w+)\s*=\s*float2\(\s*({_NUM})(?:\s*,\s*({_NUM}))?\s*\)",
        text,
    ):
        a = float(m.group(2))
        b = float(m.group(3)) if m.group(3) is not None else a
        params[m.group(1)] = (a, b)
    # float defaults
    for m in re.finditer(rf"(?:uniform\s+)?float\s+(\w+)\s*=\s*({_NUM})", text):
        params.setdefault(m.group(1), float(m.group(2)))
    # bool defaults
    for m in re.finditer(r"(?:uniform\s+)?bool\s+(\w+)\s*=\s*(true|false)", text):
        params.setdefault(m.group(1), m.group(2) == "true")
    return params


def _resolve_color(expr: str, params: Dict[str, object]) -> Tuple[float, float, float]:
    expr = expr.strip()
    m = re.match(rf"color\(\s*({_NUM})\s*,\s*({_NUM})\s*,\s*({_NUM})\s*\)", expr)
    if m:
        return (float(m.group(1)), float(m.group(2)), float(m.group(3)))
    m = re.match(rf"color\(\s*({_NUM})\s*\)", expr)
    if m:
        v = float(m.group(1))
        return (v, v, v)
    if expr in params:
        v = params[expr]
        if isinstance(v, tuple):
            return v
        return (float(v),) * 3
    return (1.0, 1.0, 1.0)


def _resolve_float(expr: str, params: Dict[str, object], default: float) -> float:
    expr = expr.strip()
    m = re.match(rf"^({_NUM})$", expr)
    if m:
        return float(m.group(1))
    if expr in params and isinstance(params[expr], float):
        return float(params[expr])  # type: ignore[arg-type]
    return default


def _resolve_volume_coeff(
    expr: str, params: Dict[str, object]
) -> Tuple[float, float, float]:
    """Volume coefficient expressions.

    The sample materials express coefficients via a target transmittance
    color at a distance scale (``data/mdl/vdf_anisotropic.mdl``):
    ``(scale <= 0) ? color(0) : math::log(X + eps) / -scale``
    which is sigma = -log(X + eps)/scale per channel. Evaluate that pattern
    numerically; anything else falls back to direct color resolution.
    """
    m = re.search(
        rf"math::log\(\s*(\w+)\s*\+\s*({_NUM})\s*\)\s*/\s*-\s*(\w+)", expr
    )
    if m:
        base = _resolve_color(m.group(1), params)
        eps = float(m.group(2))
        scale = _resolve_float(m.group(3), params, 1.0)
        if scale <= 0.0:
            return (0.0, 0.0, 0.0)
        import math

        return tuple(max(0.0, -math.log(v + eps) / scale) for v in base)
    return _resolve_color(expr, params)


def _bsdf_archetype(bsdf_name: str, mode: str) -> Archetype:
    glossy = {
        "microfacet_ggx_smith_bsdf",
        "microfacet_ggx_vcavities_bsdf",
        "microfacet_beckmann_smith_bsdf",
        "microfacet_beckmann_vcavities_bsdf",
        "simple_glossy_bsdf",
        "ward_geisler_moroder_bsdf",
        "sheen_bsdf",
        "backscattering_glossy_reflection_bsdf",
    }
    if bsdf_name == "diffuse_reflection_bsdf":
        return Archetype.DIFFUSE_REFLECTION
    if bsdf_name == "diffuse_transmission_bsdf":
        return Archetype.DIFFUSE_TRANSMISSION
    if bsdf_name == "specular_bsdf":
        if "reflect_transmit" in mode:
            return Archetype.SPECULAR_REFLECT_TRANSMIT
        if "transmit" in mode:
            return Archetype.SPECULAR_TRANSMIT
        return Archetype.SPECULAR_REFLECT
    if bsdf_name in glossy:
        if "reflect_transmit" in mode:
            return Archetype.GGX_REFLECT_TRANSMIT
        if "transmit" in mode:
            return Archetype.GGX_TRANSMIT
        return Archetype.GGX_REFLECT
    return Archetype.DIFFUSE_REFLECTION


def parse_mdl_material(path: str, name: str = "") -> Material:
    """Parse one .mdl file into a Material row (best-effort subset)."""
    with open(path, "r", errors="replace") as f:
        text = f.read()
    # strip comments
    text = re.sub(r"//[^\n]*", "", text)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)

    params = _parse_params(text)
    mat = Material(name=name or os.path.splitext(os.path.basename(path))[0])

    # hair BSDF (material(hair: df::chiang_hair_bsdf(...)))
    hm = re.search(r"hair\s*:\s*df::chiang_hair_bsdf\s*\(([^;]*)\)", text, re.S)
    if hm:
        args = hm.group(1)
        mat.archetype = Archetype.HAIR

        def f2(name, default):
            mm = re.search(rf"{name}\s*:\s*([^,\n]+)", args)
            if not mm:
                return default
            expr = mm.group(1).strip()
            v = params.get(expr)
            if isinstance(v, tuple) and len(v) == 2:
                return v
            fm = re.match(rf"float2\(\s*({_NUM})(?:\s*,\s*({_NUM}))?\s*\)", expr)
            if fm:
                a = float(fm.group(1))
                return (a, float(fm.group(2)) if fm.group(2) else a)
            return default

        mat.hair_roughness = (
            f2("roughness_R", (0.1, 0.1)),
            f2("roughness_TT", (0.2, 0.2)),
            f2("roughness_TRT", (0.3, 0.3)),
        )
        mm = re.search(r"diffuse_reflection_weight\s*:\s*([^,\n]+)", args)
        if mm:
            mat.hair_diffuse_weight = _resolve_float(mm.group(1), params, 0.0)
        mm = re.search(r"diffuse_reflection_tint\s*:\s*([^,\n]+)", args)
        if mm:
            mat.albedo = _resolve_color(mm.group(1), params)
        mm = re.search(r"cuticle_angle\s*:\s*([^,\n]+)", args)
        if mm:
            expr = mm.group(1).strip()
            rm = re.match(r"math::radians\(\s*(\w+)\s*\)", expr)
            deg = _resolve_float(rm.group(1), params, 3.0) if rm else None
            mat.hair_cuticle_angle = (
                float(np.radians(deg)) if deg is not None
                else _resolve_float(expr, params, 0.0524)
            )
        # absorption: color(1.001) - parAbsorptionColor inversion
        mm = re.search(r"absorption_coefficient\s*:\s*([^,\n]+)", args)
        if mm:
            expr = mm.group(1).strip()
            im = re.match(rf"color\(\s*({_NUM})\s*\)\s*-\s*(\w+)", expr)
            if im:
                base = float(im.group(1))
                col = _resolve_color(im.group(2), params)
                mat.hair_absorption = tuple(max(base - c, 1e-4) for c in col)
            else:
                mat.hair_absorption = _resolve_color(expr, params)
        mm = re.search(r"\bior\s*:\s*([^,\n]+)", args)
        if mm:
            mat.ior = _resolve_float(mm.group(1), params, 1.55)
        return mat

    # scattering BSDF
    m = re.search(r"scattering\s*:\s*df::(\w+)\s*\(([^)]*(?:\([^)]*\)[^)]*)*)\)", text)
    if m:
        bsdf_name, args = m.group(1), m.group(2)
        mode_m = re.search(r"mode\s*:\s*(?:df::)?(\w+)", args)
        mode = mode_m.group(1) if mode_m else "scatter_reflect"
        mat.archetype = _bsdf_archetype(bsdf_name, mode)
        tint_m = re.search(r"tint\s*:\s*([^,\n]+)", args)
        if tint_m:
            mat.albedo = _resolve_color(tint_m.group(1), params)
        elif "parDiffuseTint" in params or "parGlossyTint" in params or "parSpecularTint" in params:
            key = next(
                k for k in ("parDiffuseTint", "parGlossyTint", "parSpecularTint") if k in params
            )
            v = params[key]
            mat.albedo = v if isinstance(v, tuple) else (float(v),) * 3  # type: ignore[assignment]
        ru = re.search(r"roughness_u\s*:\s*([^,\n]+)", args)
        rv = re.search(r"roughness_v\s*:\s*([^,\n]+)", args)
        mat.roughness = (
            _resolve_float(ru.group(1), params, 0.1) if ru else mat.roughness[0],
            _resolve_float(rv.group(1), params, 0.1) if rv else mat.roughness[1],
        )
    else:
        mat.archetype = Archetype.NULL_BSDF

    # material-level ior
    m = re.search(rf"^\s*ior\s*:\s*color\(\s*([^)]+?)\s*\)", text, flags=re.M)
    if m:
        mat.ior = _resolve_float(m.group(1), params, 1.5)

    # thin_walled
    m = re.search(r"thin_walled\s*:\s*(\w+)", text)
    if m:
        tw = params.get(m.group(1), m.group(1) == "true")
        mat.thin_walled = bool(tw)

    # emission
    m = re.search(r"intensity\s*:\s*([^,\n]+)", text)
    edf = re.search(r"emission\s*:\s*df::(\w+)", text)
    if edf and m:
        expr = m.group(1).strip()
        # handle "tint * scalar" products
        prod = re.match(r"(\w+)\s*\*\s*(\w+)", expr)
        if prod:
            a = params.get(prod.group(1), 1.0)
            b = params.get(prod.group(2), 1.0)
            at = a if isinstance(a, tuple) else (float(a),) * 3
            bt = b if isinstance(b, tuple) else (float(b),) * 3
            mat.emission_intensity = tuple(x * y for x, y in zip(at, bt))  # type: ignore[assignment]
        else:
            mat.emission_intensity = _resolve_color(expr, params)
        mode_m = re.search(r"mode\s*:\s*intensity_(\w+)", text)
        mat.emission_mode = (
            EmissionMode.POWER
            if (mode_m and mode_m.group(1) == "power")
            else EmissionMode.RADIANT_EXITANCE
        )

    # volume absorption/scattering coefficients + HG phase anisotropy
    m = re.search(r"absorption_coefficient\s*:\s*([^,\n]+)", text)
    if m:
        mat.sigma_a = _resolve_volume_coeff(m.group(1), params)
    m = re.search(r"scattering_coefficient\s*:\s*([^,\n]+)", text)
    if m:
        mat.sigma_s = _resolve_volume_coeff(m.group(1), params)
    m = re.search(r"anisotropic_vdf\s*\(\s*directional_bias\s*:\s*([^,\n)]+)", text)
    if m:
        mat.volume_bias = _resolve_float(m.group(1), params, 0.0)

    # cutout
    m = re.search(r"cutout_opacity\s*:\s*([^,\n)]+)", text)
    if m:
        mat.cutout_opacity = _resolve_float(m.group(1), params, 1.0)

    return mat


def load_material(
    search_paths: tuple[str, ...], rel_path: str, name: str
) -> Material:
    """Resolve ``rel_path`` against search paths and parse; diffuse fallback."""
    for sp in search_paths + ("",):
        p = os.path.join(sp, rel_path) if sp else rel_path
        if os.path.isfile(p):
            try:
                return parse_mdl_material(p, name)
            except Exception:
                break
    return Material(name=name)
