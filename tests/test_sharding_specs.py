"""Sharding-rule unit tests: TP col/row specs, combined setokim tree."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from setok_tpu import config as cfgs
from setok_tpu.parallel.mesh import make_mesh
from setok_tpu.parallel.sharding import (fsdp_spec, llama_tp_spec,
                                         setokim_shardings)


def test_llama_tp_specs():
    # column-parallel: output dim split
    assert llama_tp_spec("['llama']['model']['layer_0']['attn']['q_proj']"
                         "['kernel']", (64, 64), "model", 2) == \
        P(None, "model")
    # row-parallel: input dim split
    assert llama_tp_spec("['llama']['model']['layer_0']['attn']['o_proj']"
                         "['kernel']", (64, 64), "model", 2) == \
        P("model", None)
    assert llama_tp_spec("['llama']['model']['layer_0']['mlp']['down_proj']"
                         "['kernel']", (128, 64), "model", 2) == \
        P("model", None)
    # not TP-split → None (FSDP fallback)
    assert llama_tp_spec("['vision_tower']['out']['kernel']",
                         (64, 64), "model", 2) is None
    # indivisible dims → None
    assert llama_tp_spec("['attn']['q_proj']['kernel']", (64, 63),
                         "model", 2) is None
    # tp disabled → None
    assert llama_tp_spec("['attn']['q_proj']['kernel']", (64, 64),
                         "model", 1) is None


def test_setokim_sharding_tree():
    mesh = make_mesh(cfgs.MeshConfig(data=4, model=2))
    tree = {
        "params": {
            "llama": {"model": {"layer_0": {"attn": {"q_proj": {
                "kernel": jnp.zeros((256, 256))}}}}},
            "vision_tower": {"big": {"kernel": jnp.zeros((512, 512))},
                             "tiny": {"bias": jnp.zeros((8,))}},
        }
    }
    shardings = setokim_shardings(tree, mesh)
    qs = shardings["params"]["llama"]["model"]["layer_0"]["attn"][
        "q_proj"]["kernel"]
    assert qs.spec == P(None, "model")              # Megatron column split
    vs = shardings["params"]["vision_tower"]["big"]["kernel"]
    assert "data" in [a for a in vs.spec if a]      # FSDP over data
    ts = shardings["params"]["vision_tower"]["tiny"]["bias"]
    assert ts.spec == P()                           # too small → replicated


def test_fsdp_spec_prefers_divisible_largest_dim():
    assert fsdp_spec((1024, 384), 8) == P("data", None)
    assert fsdp_spec((384, 1024), 8) == P(None, "data")
    # largest dim indivisible → falls to next divisible dim
    assert fsdp_spec((1023, 512), 8) == P(None, "data")
