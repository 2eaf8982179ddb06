"""QLoRA on TPU: int8 frozen base + bf16 LoRA adapters.

Parity + design note. The reference's quantized-training path is
bitsandbytes 4/8-bit (`/root/reference/src/train/train_setokim.py:228-244`,
`builder.py:32-41`): the frozen trunk is stored NF4/int8 on the GPU and
dequantized inside custom CUDA matmul epilogues, with LoRA adapters in
half precision on top.

The TPU answer is int8 weight-only quantization, not an NF4 port:

  * the v5e MXU has a native int8 systolic-array rate (2x bf16); NF4 is a
    lookup-table float format with no MXU support — unpacking 4-bit codes
    would run on the VPU and throttle every matmul it feeds;
  * storage: the frozen trunk's targeted kernels live as int8 leaves with
    per-output-channel fp32 scales (the same layout
    `kernels/quant_matmul.quantize_weight` uses for inference), halving
    HBM vs bf16 — the memory story QLoRA exists for;
  * dequantize-at-use: inside the jitted train step the int8 leaves are
    cast back to the compute dtype (`q * s`) right before `model.apply`;
    XLA fuses the dequant into the consuming matmul, so there is no
    materialized bf16 copy of the trunk between steps — only inside the
    step's live range, exactly like bnb;
  * gradients flow through the *dequantized* values into the LoRA tree
    only — the int8 base is never differentiated (bnb likewise treats the
    quantized base as constant).

4-bit is a documented non-goal: packing two nibbles per byte would halve
storage again but the unpack is elementwise VPU work on the critical path
of every matmul, and the MXU cannot consume it directly. LoRA-on-int8 is
the TPU-native point on the memory/throughput curve.

The tree surgery here is structure-preserving: quantized leaves keep their
place in the params pytree (dtype becomes int8) and the scales live in a
side dict keyed by the leaf's key-path string — the same convention
`train/lora.py` uses for the adapter tree — so sharding rules, checkpoint
code, and the optimizer-label walk keep working unchanged.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from setok_tpu.kernels.quant_matmul import quantize_weight
from setok_tpu.train.lora import default_target_filter


def quantize_base(params: Any,
                  target_filter: Callable[[str], bool] =
                  default_target_filter) -> Tuple[Any, Dict[str, jnp.ndarray]]:
    """Quantize every targeted 2-D kernel to int8 in place (pytree
    structure preserved); returns (qparams, scales-by-keypath)."""
    scales: Dict[str, jnp.ndarray] = {}

    def maybe_q(path, leaf):
        name = jax.tree_util.keystr(path)
        if getattr(leaf, "ndim", 0) == 2 and target_filter(name):
            qw = quantize_weight(leaf)
            scales[name] = qw.scales          # (1, N) fp32
            return qw.values                  # (K, N) int8
        return leaf

    qparams = jax.tree_util.tree_map_with_path(maybe_q, params)
    return qparams, scales


def dequantize(qparams: Any, scales: Dict[str, jnp.ndarray],
               dtype=jnp.bfloat16) -> Any:
    """Materialize float kernels from the int8 base. Under jit the
    `q * s` cast fuses into the consuming matmul."""

    def deq(path, leaf):
        name = jax.tree_util.keystr(path)
        if name in scales:
            return (leaf.astype(jnp.float32)
                    * scales[name]).astype(dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(deq, qparams)


# ---------------------------------------------------------------------------
# trainable-subtree overlay: differentiate only float leaves that train.


def extract_overlay(params: Any,
                    want: Callable[[str, Any], bool]
                    ) -> Dict[str, jnp.ndarray]:
    """Pull the trainable leaves out as a flat {keypath: leaf} dict."""
    out: Dict[str, jnp.ndarray] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = jax.tree_util.keystr(path)
        if want(name, leaf):
            out[name] = leaf
    return out


def apply_overlay(params: Any, overlay: Dict[str, jnp.ndarray]) -> Any:
    """Graft overlay leaves back into the full tree."""
    def graft(path, leaf):
        return overlay.get(jax.tree_util.keystr(path), leaf)

    return jax.tree_util.tree_map_with_path(graft, params)
