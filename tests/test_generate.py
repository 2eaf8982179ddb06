"""Generation API tests: decode consistency, EOS freezing, image spans."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from setok_tpu import config as cfgs
from setok_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from setok_tpu.models.generate import (GenerateOutput, find_image_spans,
                                       generate, generate_text)
from setok_tpu.models.setokim import Setokim

pytestmark = pytest.mark.full


TGT = 3
L = 24


@pytest.fixture(scope="module")
def setup():
    cfg = cfgs.tiny_setokim()
    model = Setokim(cfg, target_token_id=TGT)
    rs = np.random.RandomState(0)
    ids = np.zeros((2, L), np.int64)
    ids[:, 0] = 1
    ids[:, 1:9] = IMAGE_TOKEN_INDEX
    ids[:, 9:14] = rs.randint(10, 400, size=(2, 5))
    images = jnp.asarray(rs.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    labels = np.full((2, L), IGNORE_INDEX, np.int64)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), images,
                        jnp.asarray(labels), images, jax.random.PRNGKey(1),
                        method=model.init_all)
    return model, params, jnp.asarray(ids), images


def test_greedy_decode_deterministic_and_consistent(setup):
    model, params, ids, images = setup
    out1 = generate_text(model, params, ids, images, max_new_tokens=5,
                         eos_id=-1)
    out2 = generate_text(model, params, ids, images, max_new_tokens=5,
                         eos_id=-1)
    assert out1.tokens.shape == (2, 5)
    assert out1.hidden.shape == (2, 5, model.cfg.llama.hidden_size)
    np.testing.assert_array_equal(np.asarray(out1.tokens),
                                  np.asarray(out2.tokens))

    # greedy decode must match teacher-forced argmax of the full forward
    gen = np.asarray(out1.tokens)
    full_ids = jnp.concatenate(
        [ids, jnp.asarray(gen[:, :-1]), jnp.zeros((2, 1), ids.dtype)],
        axis=1)
    full = model.apply(params, full_ids, images)
    # prediction at the last prompt slot == first generated token
    last_prompt = np.asarray(full.valid[:, :L]).cumsum(1).argmax(1)
    for b in range(2):
        want = int(np.argmax(np.asarray(
            full.logits[b, last_prompt[b]])))
        assert want == gen[b, 0]


def test_eos_freezes_row(setup):
    model, params, ids, images = setup
    # find the greedy first token and use it as "EOS" for row 0
    out = generate_text(model, params, ids, images, max_new_tokens=4,
                        eos_id=-1)
    eos = int(np.asarray(out.tokens)[0, 0])
    out2 = generate_text(model, params, ids, images, max_new_tokens=4,
                         eos_id=eos, pad_id=0)
    toks = np.asarray(out2.tokens)
    assert bool(np.asarray(out2.done)[0])
    # after the EOS hit, row 0 emits pads
    assert (toks[0, 1:] == 0).all() or (toks[0] == eos).any()


def test_find_image_spans():
    ids = np.asarray([5, 90, 7, 7, 7, 91, 6, 90, 8, 91])
    assert find_image_spans(ids, 90, 91) == [(2, 5), (8, 9)]
    assert find_image_spans(np.asarray([90, 91]), 90, 91) == [(1, 1)]
    assert find_image_spans(np.asarray([91, 90]), 90, 91) == []


def test_full_generate_with_images(setup):
    model, params, ids, images = setup
    # force image markers into the "generated" stream by choosing marker ids
    # equal to whatever greedy emits — instead test the plumbing with
    # explicit marker ids that never appear (no images) and with a manual
    # span render.
    toks, imgs = generate(model, params, ids, images, max_new_tokens=3,
                          eos_id=-1, im_start_id=999999, im_end_id=999998)
    assert toks.shape == (2, 3)
    assert imgs == [[], []]

    from setok_tpu.models.generate import generate_image
    span = jnp.zeros((1, 4, model.cfg.llama.hidden_size))
    img = generate_image(model, params, span, jax.random.PRNGKey(0),
                         num_iter=2)
    assert img.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_sampled_decode_with_top_p(setup):
    model, params, ids, images = setup
    out = generate_text(model, params, ids, images, max_new_tokens=4,
                        rng=jax.random.PRNGKey(3), temperature=0.8,
                        top_p=0.9, eos_id=-1)
    assert out.tokens.shape == (2, 4)
    # sampling is reproducible under the same key
    out2 = generate_text(model, params, ids, images, max_new_tokens=4,
                         rng=jax.random.PRNGKey(3), temperature=0.8,
                         top_p=0.9, eos_id=-1)
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(out2.tokens))
