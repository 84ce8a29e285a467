"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests force the CPU backend (fast, deterministic, no TPU tunnel latency)
with 8 virtual devices so multi-chip sharding paths are exercised without
hardware — the TPU analog of the reference's QEMU cross-testing
(``/root/reference/Makefile:6-19``). Benchmarks (``bench.py``) run on the
real chip instead.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
