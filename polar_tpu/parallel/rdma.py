"""Direct remote-DMA ring shifts for the element-sharded decoder.

The element-sharded f/g/comb exchanges (:mod:`.seqpar_decode`) move a
partner half-shard between neighbors at every cross-shard tree level.
The default transport is ``jax.lax.ppermute`` — an XLA collective. This
module provides the TPU-native alternative the reference's world has no
analog for: a Pallas kernel issuing **one direct ICI RDMA per device**
(``pltpu.make_async_remote_copy``), bypassing the XLA collective
runtime. On real pods this is the building block for overlapping the
next subtree's exchange with the current subtree's decode (the DMA is
asynchronous hardware — start/wait can straddle compute); here it is
validated bit-exactly against ppermute on the CPU interpret backend
(``tests/test_seqpar_decode.py``).

Correctness notes:

* Every device signals its send-target and its receive-source on the
  shared barrier semaphore and waits for 2 signals before starting the
  copy, so no DMA can write a neighbor's buffer before that neighbor
  has entered the kernel (the standard neighbor-barrier pattern).
* All exchange call sites in one decode program share
  ``collective_id=0``, which is only safe if no two of these
  collectives are ever in flight concurrently. The sharded decoder
  ENFORCES that: it stacks the two formerly-independent pulls/pushes
  into single exchanges and threads a scalar token through
  ``optimization_barrier`` so every RDMA call's input carries a data
  dependency on the previous call's output
  (``seqpar_decode._ShardedTreeDecoder._ring``). Callers composing
  ``ring_shift`` themselves must either serialize the same way or use
  distinct ``collective_id``s per concurrent collective.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_kernel(peers_ref, x_ref, o_ref, send_sem, recv_sem):
    # peers_ref (SMEM): [send-target, receive-source] logical device ids,
    # computed outside the kernel (plain shard_map values keep the
    # varying-axis bookkeeping happy; in-kernel axis arithmetic does not)
    dst = peers_ref[0]
    src = peers_ref[1]
    bar = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(bar, 1, device_id=dst,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_signal(bar, 1, device_id=src,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(bar, 2)
    rdma = pltpu.make_async_remote_copy(
        src_ref=x_ref, dst_ref=o_ref, send_sem=send_sem, recv_sem=recv_sem,
        device_id=dst, device_id_type=pltpu.DeviceIdType.LOGICAL)
    rdma.start()
    rdma.wait()


def ring_shift(x, offset: int, axis: str, *, interpret: bool = False):
    """``y[d] = x[(d + offset) % n_dev]`` along the shard_map axis
    ``axis`` — the RDMA twin of the seqpar decoder's ppermute pulls
    (``offset > 0``) and pushes (``offset < 0``). Must be called inside
    a ``shard_map`` body; ``x`` is the per-device block.

    ``interpret``: run the kernel in Pallas TPU interpret mode — used by
    the CPU test meshes (the interpreter emulates remote DMAs and
    barrier semaphores across the virtual devices).
    """
    ndev = jax.lax.axis_size(axis)
    my = jax.lax.axis_index(axis)
    # receiver r gets x from (r + offset) mod n  ⇒  I send to (my - offset)
    k = jnp.int32(offset % ndev)
    n = jnp.int32(ndev)
    peers = jnp.stack([jax.lax.rem(my - k + n, n),       # send target
                       jax.lax.rem(my + k, n)])          # receive source
    # vma: the output varies along the shard axis (shard_map's varying-
    # mesh-axes check cannot infer this through a pallas_call)
    out_shape = jax.ShapeDtypeStruct(x.shape, x.dtype,
                                     vma=frozenset({axis}))
    return pl.pallas_call(
        _shift_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=out_shape,
        scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(collective_id=0),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(peers, x)
