"""Device mesh + sharding utilities.

TPU-native replacement for the reference's NCCL/DeepSpeed distribution stack
(run.py:191, trainer.py:434-453):

* data parallelism = a 1-D ``Mesh(('data',))`` over all devices; the train
  step is jit-compiled with the batch sharded over ``data`` and parameters
  replicated — XLA inserts the gradient psum over ICI automatically;
* ZeRO-equivalent optimizer-state sharding = ``NamedSharding`` placing each
  optimizer-state leaf's largest divisible axis over ``data``
  (DeepSpeed stage-2 analogue, reference trainer.py:439-442);
* the differentiable cross-rank all-gather of negatives (basemodel.py:11-22)
  needs no explicit collective here: the jit operates on the global batch, so
  every token already sees the full negative pool and XLA materializes the
  all-gather from the shardings.

Multi-host: ``jax.distributed.initialize()`` is assumed to have run; all
devices across hosts join the one mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data", tp_size: int = 1) -> Mesh:
    """1-D data mesh, or — with ``tp_size > 1`` — a 2-D ``('data','model')``
    mesh for tensor-parallel tower sharding (beyond the reference's DP-only
    stack; Megatron-style column/row parallel emerges from the param
    annotations + XLA's GSPMD propagation)."""
    devices = devices if devices is not None else jax.devices()
    devices = np.asarray(devices)
    if tp_size > 1:
        assert devices.size % tp_size == 0, (devices.size, tp_size)
        return Mesh(devices.reshape(devices.size // tp_size, tp_size),
                    (axis_name, "model"))
    return Mesh(devices, (axis_name,))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a batch onto the mesh, sharded on dim 0.

    Single process: the batch is host-global; a plain ``device_put``.
    Multi-process: each host passes its LOCAL rows (``global_dim0 =
    local_dim0 × process_count``); the global array is assembled with
    ``jax.make_array_from_process_local_data`` (host-local numpy fed straight
    to a global NamedSharding is wrong in multi-controller JAX — it would
    reinterpret the local rows as the whole global batch). Scalars and
    0-d entries replicate (every host must pass the same value).
    """
    sharding = batch_sharding(mesh, axis_name)
    rep = replicate(mesh)
    if jax.process_count() <= 1:
        return jax.tree.map(
            lambda x: jax.device_put(
                x, sharding if getattr(x, "ndim", 0) > 0 else rep
            ),
            batch,
        )
    n_proc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.make_array_from_process_local_data(rep, x)
        global_shape = (x.shape[0] * n_proc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(put, batch)


def put_replicated(mesh: Mesh, x):
    """Replicate identical host data onto the (possibly multi-host) mesh."""
    if jax.process_count() <= 1:
        return jax.device_put(x, replicate(mesh))
    return jax.make_array_from_process_local_data(replicate(mesh), np.asarray(x))


def shard_identical(mesh: Mesh, x, axis_name: str = "data"):
    """Shard dim 0 of data that every host holds IDENTICALLY (e.g. a corpus
    chunk each host built for itself): each host contributes its slice, so
    the global array has the host-global shape — unlike ``shard_batch``,
    which concatenates per-host rows."""
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() <= 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    n, pid = jax.process_count(), jax.process_index()
    B = x.shape[0]
    assert B % n == 0, (B, n)
    loc = x[pid * (B // n) : (pid + 1) * (B // n)]
    return jax.make_array_from_process_local_data(sharding, loc, x.shape)


def local_shard(arr) -> np.ndarray:
    """This host's contiguous dim-0 shard of a ``P('data')``-sharded global
    array (row order = process order), as numpy. Fully-replicated and
    single-process arrays convert directly."""
    if getattr(arr, "is_fully_replicated", True):
        return np.asarray(arr)
    shards = sorted(
        arr.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def zero_sharded_opt_state(mesh: Mesh, opt_state, axis_name: str = "data"):
    """NamedShardings that shard each optimizer-state leaf over ``data``.

    Leaves whose first divisible axis can't be split evenly stay replicated
    (they are small: scalars, counts, norms).
    """
    n = mesh.devices.size

    def spec_for(leaf):
        shape = getattr(leaf, "shape", ())
        for dim, size in enumerate(shape):
            if size % n == 0 and size >= n:
                parts = [None] * len(shape)
                parts[dim] = axis_name
                return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, opt_state)
