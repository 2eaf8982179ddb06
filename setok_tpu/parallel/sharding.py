"""Parameter/optimizer sharding rules (ZeRO/FSDP equivalent).

Parity: the reference's ZeRO-2/3 configs (/root/reference/scripts/zero*.json)
shard optimizer state and parameters across data-parallel ranks and gather
them on use; under `jit` + `NamedSharding` the same thing is a partition
spec on each parameter leaf — XLA all-gathers weights for the matmuls and
reduce-scatters the gradients, which is precisely ZeRO-3 semantics with the
scheduling left to the compiler.

The rule here is the standard one: shard each leaf's *largest* dimension
that divides the data-axis size; replicate anything too small to matter
(min_shard_bytes). The optimizer state inherits the parameter spec leaf-wise
(optax states are pytrees whose array leaves mirror param shapes).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from setok_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def fsdp_spec(shape, axis_size: int, axis: str = DATA_AXIS,
              min_shard_elems: int = 2 ** 15) -> P:
    """Partition spec for one array: shard the largest divisible dim."""
    if int(np.prod(shape)) < min_shard_elems:
        return P()
    dims = sorted(range(len(shape)), key=lambda d: -shape[d])
    for d in dims:
        if shape[d] % axis_size == 0 and shape[d] >= axis_size:
            spec = [None] * len(shape)
            spec[d] = axis
            return P(*spec)
    return P()


def fsdp_shardings(tree: Any, mesh: Mesh, axis: str = DATA_AXIS,
                   min_shard_elems: int = 2 ** 15) -> Any:
    """NamedSharding pytree mirroring `tree` (params or optimizer state)."""
    axis_size = mesh.shape[axis]

    def leaf_sharding(x):
        shape = getattr(x, "shape", ())
        if not shape:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh,
                             fsdp_spec(shape, axis_size, axis,
                                       min_shard_elems))

    return jax.tree.map(leaf_sharding, tree)


def shard_tree(tree: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Place an existing pytree according to the FSDP rule."""
    shardings = fsdp_shardings(tree, mesh, axis)
    return jax.tree.map(jax.device_put, tree, shardings)


# ---------------------------------------------------------------------------
# Tensor parallelism for the LLaMA trunk (Megatron-style column/row split)

_TP_COL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "lm_head")
_TP_ROW = ("o_proj", "down_proj")


def llama_tp_spec(name: str, shape, model_axis: str = MODEL_AXIS,
                  model_size: int = 1):
    """Partition spec for one LLaMA param by path name, or None if the
    param is not TP-split (caller falls back to the FSDP rule).

    Column-parallel: qkv/gate/up/lm_head kernels split on the output dim;
    row-parallel: o/down kernels split on the input dim — the standard
    Megatron layout, which makes XLA insert exactly one all-reduce per
    attention/MLP block over the `model` axis.
    """
    if model_size <= 1 or len(shape) != 2:
        return None
    if any(f"['{k}']" in name for k in _TP_COL):
        if shape[1] % model_size == 0:
            return P(None, model_axis)
    if any(f"['{k}']" in name for k in _TP_ROW):
        if shape[0] % model_size == 0:
            return P(model_axis, None)
    if "embed_tokens" in name and shape[1] % model_size == 0:
        return P(None, model_axis)
    return None


def setokim_shardings(tree: Any, mesh: Mesh,
                      data_axis: str = DATA_AXIS,
                      model_axis: str = MODEL_AXIS,
                      min_shard_elems: int = 2 ** 15) -> Any:
    """Combined TP (LLaMA trunk) + FSDP (everything else) sharding tree."""
    model_size = mesh.shape.get(model_axis, 1)
    data_size = mesh.shape[data_axis]

    def walk(path, leaf):
        name = jax.tree_util.keystr(path)
        shape = getattr(leaf, "shape", ())
        spec = llama_tp_spec(name, shape, model_axis, model_size)
        if spec is None:
            spec = (fsdp_spec(shape, data_size, data_axis, min_shard_elems)
                    if shape else P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(walk, tree)


# ---------------------------------------------------------------------------
# Host offload (the reference's zero3_offload.json equivalent): park a
# pytree (typically optimizer state) in pinned host memory and stream it
# to HBM only inside the step. Works inside AND outside jit —
# TransferToMemoryKind preserves the existing sharding.


def offload_to_host(tree: Any) -> Any:
    """Move every leaf to pinned_host memory (sharding preserved).

    Inside jit this lowers to a memory-space annotation (`jax.memory.
    Space.Host`) — effective on TPU, a no-op on the CPU backend, which
    doesn't implement the placement custom-call. Outside jit the leaf's
    own sharding is re-targeted at pinned_host."""
    import jax.memory as jm
    from jax.core import Tracer
    on_tpu = jax.devices()[0].platform == "tpu"

    def move(x):
        if not hasattr(x, "shape"):
            return x
        if isinstance(x, Tracer):
            # in-jit annotation aborts on the CPU backend — no-op there
            return jax.device_put(x, jm.Space.Host) if on_tpu else x
        return jax.device_put(x, x.sharding.with_memory_kind("pinned_host"))

    return jax.tree_util.tree_map(move, tree)


def fetch_to_device(tree: Any) -> Any:
    """Bring an offloaded pytree back to device (HBM) memory."""
    import jax.memory as jm
    from jax.core import Tracer
    on_tpu = jax.devices()[0].platform == "tpu"

    def move(x):
        if not hasattr(x, "shape"):
            return x
        if isinstance(x, Tracer):
            return jax.device_put(x, jm.Space.Device) if on_tpu else x
        return jax.device_put(x, x.sharding.with_memory_kind("device"))

    return jax.tree_util.tree_map(move, tree)
