"""Pallas TPU kernels (all verified compiled on hardware; interpret-mode
tested on the CPU harness).

- flash_attention: masked fused attention, fwd + custom-vjp bwd
- cluster_pallas: fused DPC-KNN density/parent passes + drop-in clusterer
- quant_matmul: w8a8 matmul with dynamic activation quantization
- fused_mlp: whole-MLP int8 kernel (quant→fc1→gelu→fc2 in VMEM)
- fused_attention_int8: whole-self-attention int8 kernel (ViT blocks)
- fused_bert_attention_int8: post-norm BERT attention sublayer kernel
"""

from setok_tpu.kernels.cluster_pallas import (cluster_dpc_knn_pallas,
                                              dpc_density_parent)
from setok_tpu.kernels.flash_attention import (attention_reference,
                                               flash_attention)
from setok_tpu.kernels.fused_attention_int8 import fused_attention_int8
from setok_tpu.kernels.fused_bert_attention_int8 import (
    fused_bert_attention_int8)
from setok_tpu.kernels.fused_mlp import fused_mlp_int8
from setok_tpu.kernels.quant_matmul import (QuantizedWeight, quant_dense,
                                            quant_matmul, quantize_weight)

__all__ = ["cluster_dpc_knn_pallas", "dpc_density_parent",
           "attention_reference", "flash_attention", "fused_attention_int8",
           "fused_bert_attention_int8", "fused_mlp_int8", "QuantizedWeight",
           "quant_dense", "quant_matmul", "quantize_weight"]
