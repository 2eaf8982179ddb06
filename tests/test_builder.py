"""Loader / delta / VQA-helper tests."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from setok_tpu import config as cfgs
from setok_tpu.data.vqa_eval import VQA, normalize_answer, vqa_accuracy
from setok_tpu.models.builder import (apply_delta, consolidate,
                                      load_pretrained_model, make_delta)
from setok_tpu.utils.checkpoint import prefix_predicate, save_subtree


pytestmark = pytest.mark.full


def test_load_fresh_and_projector_splice(tmp_path):
    model, params = load_pretrained_model("", tiny=True)
    # make a different projector and splice it in
    model2, params2 = load_pretrained_model("", tiny=True)
    leaves2 = jax.tree_util.tree_leaves(params2)
    # perturb params2 deterministically so the splice is observable
    params2 = jax.tree.map(lambda x: x + 1.0, params2)
    proj = str(tmp_path / "mm_projector.npz")
    save_subtree(proj, params2, prefix_predicate("mm_in_projector"))

    model3, params3 = load_pretrained_model("", projector_path=proj,
                                            tiny=True)
    flat1 = {jax.tree_util.keystr(p): l for p, l in
             jax.tree_util.tree_flatten_with_path(params)[0]}
    flat3 = {jax.tree_util.keystr(p): l for p, l in
             jax.tree_util.tree_flatten_with_path(params3)[0]}
    changed = [k for k in flat1
               if not np.allclose(np.asarray(flat1[k]),
                                  np.asarray(flat3[k]))]
    assert changed and all("mm_in_projector" in k for k in changed)


def test_delta_roundtrip():
    _, base = load_pretrained_model("", tiny=True)
    target = jax.tree.map(lambda x: x * 1.5 + 0.1, base)
    delta = make_delta(base, target)
    back = apply_delta(base, delta)
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(target)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    half = consolidate(base, np.float16)
    assert all(l.dtype == np.float16
               for l in jax.tree_util.tree_leaves(half))


def test_vqa_index_and_metric():
    anns = [{"question_id": 1, "image_id": 10, "question_type": "what",
             "answer_type": "other",
             "answers": [{"answer": "a red bird"}] * 6
                        + [{"answer": "bird"}] * 4},
            {"question_id": 2, "image_id": 11, "question_type": "is the",
             "answer_type": "yes/no", "answers": [{"answer": "yes"}] * 10}]
    qs = [{"question_id": 1, "question": "what is it?"},
          {"question_id": 2, "question": "is the sky blue?"}]
    vqa = VQA()
    vqa.create_index(anns, qs)
    assert vqa.get_ques_ids(img_ids=[10]) == [1]
    assert vqa.get_ques_ids(ans_types=["yes/no"]) == [2]
    assert vqa.get_img_ids([1, 2]) == [10, 11]
    assert "red bird" in vqa.show_qa(vqa.load_qa([1]))[0]

    assert normalize_answer("The Red-Bird!") == "red bird"
    acc = vqa_accuracy("red bird", [a["answer"] for a in anns[0]["answers"]])
    assert 0 < acc <= 1
    assert vqa_accuracy("yes", ["yes"] * 10) == 1.0
    assert vqa_accuracy("no", ["yes"] * 10) == 0.0


def test_lora_checkpoint_serve_roundtrip(tmp_path):
    """Train 1 LoRA step → orbax checkpoint → loader restores + merges."""
    import jax.tree_util as jtu
    from setok_tpu.train.stage2 import Stage2Trainer
    from setok_tpu.utils import checkpoint as ckpt
    from tests.test_stage2 import TC, TGT, make_batch

    tr = Stage2Trainer(cfgs.tiny_setokim(), train_cfg=TC,
                       target_token_id=TGT, lora_enable=True, lora_r=4,
                       lora_alpha=16.0)
    batch = make_batch(seed=7)
    state = tr.create_state(jax.random.PRNGKey(0), batch)
    state, _ = tr.train_step(state, batch, jax.random.PRNGKey(1))
    ckpt_dir = str(tmp_path / "checkpoints")
    ckpt.save_checkpoint(ckpt_dir, 1, state)

    model, params = load_pretrained_model(str(tmp_path), tiny=True,
                                          lora_r=4, lora_alpha=16.0)
    _, fresh = load_pretrained_model("", tiny=True)
    flat_m = {jtu.keystr(p): l
              for p, l in jtu.tree_flatten_with_path(params)[0]}
    flat_f = {jtu.keystr(p): l
              for p, l in jtu.tree_flatten_with_path(fresh)[0]}
    qk = next(k for k in flat_m if "q_proj" in k)
    # merged LoRA delta applied on top of the restored base
    assert not np.allclose(np.asarray(flat_m[qk]), np.asarray(flat_f[qk]))
