"""Device mesh construction — the rebuild's entire "distributed backend".

Parity: the reference reaches NCCL through DeepSpeed ZeRO configs
(/root/reference/scripts/zero*.json) and an explicit differentiable
all_gather (src/model/loss/multilabel_constrastive.py:14-24). On TPU the
equivalent is a `jax.sharding.Mesh` + `NamedSharding` annotations: XLA's
SPMD partitioner inserts the collectives (all-gather / reduce-scatter /
psum) over ICI automatically, and they are differentiable by construction
(SURVEY.md §2.6). This module is deliberately small: mesh creation, axis
conventions, and multihost init.

Axis conventions:
  data  — batch / FSDP shards (ZeRO ≡ parameter sharding over `data`)
  model — tensor-parallel shards for the LLaMA trunk (optional)
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from setok_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh. With cfg=None, all devices go to `data`."""
    devices = list(devices if devices is not None else jax.devices())
    if cfg is None:
        cfg = MeshConfig(data=len(devices), model=1)
    n = cfg.data * cfg.model
    assert n <= len(devices), (
        f"mesh wants {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(cfg.data, cfg.model)
    return Mesh(arr, cfg.axis_names)


def make_sp_mesh(data: int, seq: int,
                 devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """(data, seq) mesh for sequence-parallel (ring-attention) training.

    Long-context extension (SURVEY §5): the sequence axis carries the
    K/V ring (parallel/ring_attention.py); batch stays on `data`.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = data * seq
    assert n <= len(devices), f"mesh wants {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(data, seq)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (no-op on a single host).

    Replaces the reference's deepspeed/accelerate launcher environment
    plumbing (scripts/train_setok.sh:37): on TPU pods
    `jax.distributed.initialize` discovers peers from the TPU metadata, or
    takes explicit coordinates when provided.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
