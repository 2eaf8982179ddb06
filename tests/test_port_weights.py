"""Weight-porting parity: ported HF torch models == our flax modules.

Builds tiny randomly-initialized HF models locally (no hub access needed)
and checks forward-pass equivalence after porting.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

sys.path.insert(0, "/root/repo/scripts")
import port_weights  # noqa: E402

from setok_tpu.config import LlamaConfig, ViTConfig  # noqa: E402
from setok_tpu.models.llama import LlamaForCausalLM  # noqa: E402
from setok_tpu.models.vit import ViT  # noqa: E402
from setok_tpu.utils.porting import load_flat_into  # noqa: E402


pytestmark = pytest.mark.full


def sd_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_siglip_vision_port_matches_torch():
    from transformers import SiglipVisionConfig, SiglipVisionModel
    hf_cfg = SiglipVisionConfig(hidden_size=32, intermediate_size=128,
                                num_hidden_layers=2, num_attention_heads=2,
                                image_size=32, patch_size=8)
    torch_model = SiglipVisionModel(hf_cfg).eval()

    flat = port_weights.port_siglip_vision(
        {"vision_model." + k: v for k, v in
         sd_numpy(torch_model.vision_model).items()})

    cfg = ViTConfig(image_size=32, patch_size=8, width=32, depth=2,
                    num_heads=2, select_layer=-1)
    vit = ViT(cfg)
    img = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    params = vit.init(jax.random.PRNGKey(0), jnp.asarray(img))
    params, unmatched = load_flat_into(params, flat)
    assert not unmatched, unmatched

    ours = np.asarray(vit.apply(params, jnp.asarray(img)))
    with torch.no_grad():
        theirs = torch_model(
            torch.tensor(img).permute(0, 3, 1, 2),
            output_hidden_states=True).hidden_states[-1].numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_llama_port_matches_torch():
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM as HFLlama
    hf_cfg = HFLlamaConfig(vocab_size=128, hidden_size=32,
                           intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=4,
                           max_position_embeddings=64, rms_norm_eps=1e-5,
                           attn_implementation="eager")
    torch_model = HFLlama(hf_cfg).eval()
    flat = port_weights.port_llama(sd_numpy(torch_model))

    cfg = LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=4, num_kv_heads=4, head_dim=8,
                      max_seq_len=64)
    ours_model = LlamaForCausalLM(cfg)
    ids = np.random.RandomState(0).randint(3, 128, size=(2, 10))
    params = ours_model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    params, unmatched = load_flat_into(params, flat)
    assert not unmatched, unmatched

    logits, _, _ = ours_model.apply(params, jnp.asarray(ids))
    with torch.no_grad():
        theirs = torch_model(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(logits), theirs, rtol=2e-3,
                               atol=2e-3)


def test_qformer_port_loads():
    from transformers import BertConfig, BertModel
    hf_cfg = BertConfig(vocab_size=64, hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=2,
                        intermediate_size=128, max_position_embeddings=32)
    bert = BertModel(hf_cfg).eval()
    flat = port_weights.port_qformer_bert(sd_numpy(bert), num_layers=2)

    from setok_tpu.models.qformer import QFormer
    qf = QFormer(num_layers=2, num_heads=2, cross_attention_freq=2)
    q = jnp.zeros((1, 4, 32))
    enc = jnp.zeros((1, 6, 32))
    params = qf.init(jax.random.PRNGKey(0), q, enc)
    params, unmatched = load_flat_into(params, flat)
    assert not unmatched, unmatched
    out = qf.apply(params, q, enc)
    assert out.shape == (1, 4, 32)


def test_vgg16_port_shapes():
    # synthetic torchvision-shaped state dict
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    sd = {}
    idx = 0
    in_c = 3
    for v in cfg:
        if v == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = np.zeros((v, in_c, 3, 3), np.float32)
        sd[f"features.{idx}.bias"] = np.zeros((v,), np.float32)
        in_c = v
        idx += 2
    flat = port_weights.port_vgg16(sd)
    assert len([k for k in flat if k.endswith("kernel")]) == 13
    assert flat["conv_0/kernel"].shape == (3, 3, 3, 64)
    assert flat["conv_12/kernel"].shape == (3, 3, 512, 512)

    from setok_tpu.losses.lpips import LPIPS
    lp = LPIPS()
    x = jnp.zeros((1, 32, 32, 3))
    params = lp.init(jax.random.PRNGKey(0), x, x)
    params, unmatched = load_flat_into(params, flat)
    assert not unmatched


def test_so400m_layout_key_coverage():
    """The porter's key map covers the full so400m layout — 27 encoder
    layers, patch14 — verified with a shape-reduced synthetic checkpoint
    (widths shrunk, layer count and key space exact). VERDICT r1 item 6."""
    from transformers import SiglipVisionConfig, SiglipVisionModel
    hf_cfg = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                                num_hidden_layers=27, num_attention_heads=2,
                                image_size=56, patch_size=14)
    torch_model = SiglipVisionModel(hf_cfg).eval()
    flat = port_weights.port_siglip_vision(
        {"vision_model." + k: v for k, v in
         sd_numpy(torch_model.vision_model).items()})

    cfg = ViTConfig(image_size=56, patch_size=14, width=32, depth=27,
                    num_heads=2, mlp_ratio=2.0, select_layer=-1)
    vit = ViT(cfg)
    img = np.random.RandomState(0).randn(1, 56, 56, 3).astype(np.float32)
    params = vit.init(jax.random.PRNGKey(0), jnp.asarray(img))
    params, unmatched = load_flat_into(params, flat)
    assert not unmatched, unmatched
    ours = np.asarray(vit.apply(params, jnp.asarray(img)))
    with torch.no_grad():
        theirs = torch_model(
            torch.tensor(img).permute(0, 3, 1, 2),
            output_hidden_states=True).hidden_states[-1].numpy()
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)


def test_vicuna7b_layout_key_coverage():
    """Vicuna-7B trunk layout — 32 layers, MHA (kv == heads), untied
    embeddings — key space exact, widths shrunk."""
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM as HFLlama
    hf_cfg = HFLlamaConfig(vocab_size=128, hidden_size=32,
                           intermediate_size=64, num_hidden_layers=32,
                           num_attention_heads=4, num_key_value_heads=4,
                           max_position_embeddings=64, rms_norm_eps=1e-5,
                           tie_word_embeddings=False,
                           attn_implementation="eager")
    torch_model = HFLlama(hf_cfg).eval()
    flat = port_weights.port_llama(sd_numpy(torch_model))

    cfg = LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=32, num_heads=4, num_kv_heads=4, head_dim=8,
                      max_seq_len=64)
    ours_model = LlamaForCausalLM(cfg)
    ids = np.random.RandomState(0).randint(3, 128, size=(1, 8))
    params = ours_model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    params, unmatched = load_flat_into(params, flat)
    assert not unmatched, unmatched
    logits, _, _ = ours_model.apply(params, jnp.asarray(ids))
    with torch.no_grad():
        theirs = torch_model(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(logits), theirs, rtol=4e-3,
                               atol=4e-3)
