"""nrc_tpu — a TPU-native neural radiance caching engine (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of the reference OptiX 8 +
tiny-cuda-nn + MDL application ``Depersonalizc/neural-radiance-caching``
(SIGGRAPH 2021, "Real-time Neural Radiance Caching for Path Tracing"),
built TPU-first:

- the OptiX path-tracing megakernel becomes a *wavefront* integrator — a
  ``lax.scan`` over bounce depth on SoA ray batches, everything under one
  ``jit`` (reference: ``nrc/shaders/raygeneration.cu:139-289``);
- tiny-cuda-nn's fully-fused MLP becomes a Pallas fused MLP kernel with a
  pure-JAX reference path (reference: ``nrc/src/NRCNetwork.cu``);
- the atomicAdd training-record allocator becomes a static per-tile strided
  record layout (no atomics, no mid-frame host sync — reference:
  ``nrc/shaders/hit.cu:975-1028``, ``nrc/src/Device.cpp:2487-2491``);
- multi-GPU P2P islands become a ``jax.sharding.Mesh`` with XLA collectives
  (reference: ``nrc/src/Raytracer.cpp:318-458``).

Layout: ``models/`` (NRC network), ``ops/`` (kernels: intersect, encodings,
MLP, propagation), ``render/`` (integrator + frame step), ``scene/`` (parser,
geometry, lights, materials, camera), ``parallel/`` (mesh/shard_map scaling),
``utils/`` (math, RNG, tonemap, image IO), ``app/`` (CLI).
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the demo-scene frame program compiles
# for tens of minutes on the tunneled TPU; caching makes re-runs of the
# same config near-instant. Set before jax initializes (jax reads the env
# lazily at first compile); opt out with NRC_NO_COMPILE_CACHE=1.
import os as _os

if not _os.environ.get("NRC_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "nrc_tpu_xla"),
    )
    # jax 0.9.0 does not read JAX_COMPILATION_CACHE_DIR from the
    # environment (config.compilation_cache_dir stays None); it must be
    # set through jax.config. jax is a hard dependency of every entry
    # point, so importing it here only moves the import earlier.
    try:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # persist anything that takes >=1 s to compile: the demo frame
        # program (minutes) is the headline win, but the dozen ~1-2 s
        # PRNG/init programs the network bootstrap builds re-paid ~6 s per
        # process until they were cached too (round-4 upload budget)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        del _jax
    except Exception:  # pragma: no cover - cache is an optimization only
        pass
    del _cache_dir
del _os
