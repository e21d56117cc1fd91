"""Test harness config: force CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh (the capability the
reference lacks — it can only exercise multi-GPU on real hardware,
SURVEY.md §4).

This environment pre-imports jax at interpreter startup (sitecustomize)
with a remote TPU platform selected via JAX_PLATFORMS, so plain env-var
assignment is too late; instead we retarget the (lazily initialized)
backend through jax.config before any op runs.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")


def pytest_sessionstart(session):
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
