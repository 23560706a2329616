"""Device mesh + distributed init: the TPU-native replacement for the
reference's `accelerators/` DDP/NCCL layer (reference
accelerators/apex_ddp_accelerator.py, utils/__init__.py:388-410).

Instead of per-process NCCL groups we build a single `jax.sharding.Mesh`
with up to three axes:

- ``data``   — pure data parallelism (batch sharding). The reference's only
               parallelism mode (multi-node DDP) maps here 1:1.
- ``fsdp``   — ZeRO-3-style parameter/optimizer sharding (batch is also
               sharded over this axis; params are sharded along one dim).
- ``tensor`` — Megatron-style tensor parallelism over attention heads and
               MLP hidden units (headroom beyond the reference).

Gradient reduction is supplied implicitly by GSPMD when the loss is computed
from batch-sharded inputs against replicated/sharded params — no explicit
all_reduce calls as in apex DDP (reference accelerators/apex_ddp_accelerator.py:88).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"

# The batch dimension is sharded over both data-parallel-ish axes.
BATCH_AXES = (DATA_AXIS, FSDP_AXIS)


def maybe_init_distributed() -> None:
    """Multi-host init: single call replacing the reference's env-var/TCP NCCL
    rendezvous (reference utils/__init__.py:388-410). No-op on one host."""
    if os.environ.get("XFM_MULTIHOST", "0") == "1" and jax.process_count() == 1:
        try:
            jax.distributed.initialize()
        except Exception:
            pass


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    data: int = -1,
    fsdp: int = 1,
    tensor: int = 1,
) -> Mesh:
    """Build the global mesh. `data=-1` absorbs remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (fsdp * tensor) == 0, (n, fsdp, tensor)
        data = n // (fsdp * tensor)
    assert data * fsdp * tensor == n, (data, fsdp, tensor, n)
    dev_array = np.asarray(devices).reshape(data, fsdp, tensor)
    return Mesh(dev_array, (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS))


def mesh_from_config(config: dict, devices=None) -> Mesh:
    par = config.get("parallel", {}) or {}
    return make_mesh(
        devices=devices,
        data=par.get("data", -1),
        fsdp=par.get("fsdp", 1),
        tensor=par.get("tensor", 1),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-dim batch sharding over (data, fsdp)."""
    return NamedSharding(mesh, P(BATCH_AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a host batch with the leading dim batch-sharded; arrays
    whose leading dim doesn't divide the batch axes (e.g. remainder eval
    batches) are replicated instead."""
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    nbatch = axis_sizes.get(DATA_AXIS, 1) * axis_sizes.get(FSDP_AXIS, 1)

    def put(x):
        if x is None:
            return None
        shape = getattr(x, "shape", ())
        if len(shape) >= 1 and shape[0] % nbatch == 0 and shape[0] > 0:
            return jax.device_put(x, sh)
        return jax.device_put(x, rep)

    return jax.tree.map(put, batch)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1
    fsdp: int = 1
    tensor: int = 1
