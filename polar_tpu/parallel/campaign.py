"""Sharded Monte-Carlo BER campaign: frames over the mesh, psum counters.

This is the distributed-communication layer the reference lacks
(SURVEY.md §5 "Distributed communication backend"): the Monte-Carlo step
body runs per-shard under ``jax.shard_map`` with an independent PRNG key
per device, and the five diagnostic counters are reduced with ``psum``
over the frame axis — the only cross-chip traffic, a few dozen bytes per
step. Scaling efficiency is therefore ~linear by construction; the
decode itself never communicates (frames are independent, exactly like
the reference's SIMD lanes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ber import make_step_body
from ..code.construction import PolarCode
from .mesh import BATCH_AXIS, frame_mesh


def make_sharded_step(
    code: PolarCode,
    mesh: Mesh | None = None,
    *,
    axis: str = BATCH_AXIS,
    systematic: bool = True,
    dtype=jnp.int8,
    decoder=None,
):
    """Build the multi-chip Monte-Carlo step.

    Returns ``(step, mesh)`` where ``step(keys, snr_db, per_device_batch)``
    takes one PRNG key per device (shape ``(n_devices, 2)`` uint32,
    sharded over ``axis``) and returns globally-psum-reduced counters
    (replicated scalars). ``per_device_batch`` frames are processed on
    every device, so the global batch is ``n_devices * per_device_batch``.
    """
    if mesh is None:
        mesh = frame_mesh(axis=axis)
    body = make_step_body(code, systematic=systematic, dtype=dtype,
                          decoder=decoder)

    def shard_fn(keys, snr_db, per_device_batch: int):
        out = body(keys[0], snr_db, per_device_batch)
        return {k: jax.lax.psum(v, axis) for k, v in out.items()}

    def step(keys, snr_db, per_device_batch: int):
        sharded = jax.shard_map(
            lambda k, s: shard_fn(k, s, per_device_batch),
            mesh=mesh,
            in_specs=(P(axis), P()),
            out_specs=P(),
        )
        return sharded(keys, jnp.float32(snr_db))

    return jax.jit(step, static_argnums=(2,)), mesh


def device_keys(key, mesh: Mesh, axis: str = BATCH_AXIS):
    """Split a key into one per device, laid out along the mesh axis."""
    n = mesh.shape[axis]
    keys = jax.random.split(key, n)
    sharding = jax.NamedSharding(mesh, P(axis))
    return jax.device_put(jax.random.key_data(keys), sharding)


def run_sharded_point(
    code: PolarCode,
    snr_db: float,
    *,
    key,
    step=None,
    mesh: Mesh | None = None,
    per_device_batch: int = 4096,
    max_global_frames: int = 1 << 20,
    target_bit_errors: int = 1000,
    systematic: bool = True,
    dtype=jnp.int8,
):
    """Multi-chip analog of :func:`polar_tpu.ber.run_point`: loops sharded
    steps until the error target or frame budget is met; returns the
    counter totals plus the global frame count."""
    if step is None:
        step, mesh = make_sharded_step(code, mesh, systematic=systematic,
                                       dtype=dtype)
    assert mesh is not None
    n_dev = mesh.devices.size
    totals: dict = {}
    frames = 0
    while (frames < max_global_frames
           and totals.get("uncorrected_errors", 0) < target_bit_errors):
        key, sub = jax.random.split(key)
        out = jax.device_get(step(device_keys(sub, mesh), snr_db,
                                  per_device_batch))
        frames += per_device_batch * n_dev
        for k, v in out.items():
            totals[k] = totals.get(k, 0) + int(v)
    totals["frames"] = frames
    return totals
