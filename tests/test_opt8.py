"""8-bit Adam moments (train/opt8.py) — bnb Adam8bit equivalent.

Parity: /root/reference/src/train/setok_trainer.py:153-183 (Adam8bit with
the nn.Embedding fp32 carve-out via GlobalOptimManager).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from setok_tpu.train.opt8 import BLOCK, adam8bit, moment_bytes


def test_adam8bit_tracks_fp32_adam():
    """On a quadratic, the int8-moment trajectory stays close to fp32 Adam
    and reaches the same optimum."""
    rs = np.random.RandomState(0)
    target = jnp.asarray(rs.randn(4, 513))     # non-multiple of BLOCK
    params8 = {"w": jnp.zeros((4, 513))}
    params32 = {"w": jnp.zeros((4, 513))}

    opt8 = adam8bit(0.05)
    opt32 = optax.adam(0.05)
    s8 = opt8.init(params8)
    s32 = opt32.init(params32)

    def loss(p):
        return jnp.mean(jnp.square(p["w"] - target))

    @jax.jit
    def step(p8, s8, p32, s32):
        g8 = jax.grad(loss)(p8)
        u8, s8 = opt8.update(g8, s8)
        p8 = optax.apply_updates(p8, u8)
        g32 = jax.grad(loss)(p32)
        u32, s32 = opt32.update(g32, s32)
        p32 = optax.apply_updates(p32, u32)
        return p8, s8, p32, s32

    for _ in range(200):
        params8, s8, params32, s32 = step(params8, s8, params32, s32)

    l8, l32 = float(loss(params8)), float(loss(params32))
    assert l8 < 0.05, l8                       # converged
    assert abs(l8 - l32) < 0.02, (l8, l32)     # tracks fp32 closely
    # moments really are int8
    int8_leaves = [l for l in jax.tree_util.tree_leaves(s8)
                   if hasattr(l, "dtype") and l.dtype == jnp.int8]
    assert int8_leaves, "moments must be stored int8"


def test_moment_memory_is_quarter_of_fp32():
    n = 1 << 16
    params = {"w": jnp.zeros((n,))}
    opt = adam8bit(1e-3)
    state = opt.init(params)
    got = moment_bytes((state.m, state.v))
    fp32 = 2 * n * 4
    # 2 int8 payloads + f32 scale per block ≈ 2n + 8n/BLOCK bytes
    expect = 2 * n + 2 * (n // BLOCK) * 4
    assert got == expect, (got, expect)
    assert got < fp32 / 3.9


def test_stage2_trainer_optim_bits8():
    """Stage-2 step with optim_bits=8: runs, finite, int8 moments in the
    optimizer state, embedding moments kept fp32 (reference carve-out)."""
    from setok_tpu import config as cfgs
    from setok_tpu.constants import IMAGE_TOKEN_INDEX
    from setok_tpu.train.stage2 import Stage2Trainer

    cfg = cfgs.tiny_setokim()
    trainer = Stage2Trainer(cfg, optim_bits=8)
    labels_fn = trainer._labels

    B, L = 2, 48
    rs = np.random.RandomState(0)
    ids = np.zeros((B, L), np.int64)
    ids[:, 0] = 1
    ids[:, 1:1 + cfg.tokenizer.k_max] = IMAGE_TOKEN_INDEX
    ids[:, 12:20] = rs.randint(10, 400, size=(B, 8))
    labels = np.full((B, L), -100, np.int64)
    labels[:, 12:20] = ids[:, 12:20]
    imgs = rs.rand(B, 32, 32, 3).astype(np.float32) * 2 - 1
    batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
             "comp_image": jnp.asarray(imgs), "gen_image": jnp.asarray(imgs)}

    state = trainer.create_state(jax.random.PRNGKey(0), batch)
    # embedding params labeled for the fp32 transform
    lbls = labels_fn({"params": state.params})
    flat = jax.tree_util.tree_flatten_with_path(lbls)[0]
    embed_labels = {v for k, v in flat
                    if "embed_tokens" in jax.tree_util.keystr(k)}
    assert embed_labels == {"embed32"}, embed_labels

    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    int8_leaves = [l for l in jax.tree_util.tree_leaves(state.opt_state)
                   if hasattr(l, "dtype") and l.dtype == jnp.int8]
    assert int8_leaves, "trunk moments must be int8"


def test_stage1_trainer_optim_bits8():
    from setok_tpu import config as cfgs
    from setok_tpu.train.stage1 import Stage1Trainer

    trainer = Stage1Trainer(
        cfgs.tiny_tokenizer(), cfgs.tiny_detokenizer(),
        gan_cfg=cfgs.GANLossConfig(disc_start=0, warm_up_end=0),
        contrastive_cfg=cfgs.ContrastiveLossConfig(text_embed_dim=32),
        optim_bits=8)
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(4, 32, 32, 3).astype(np.float32) * 2 - 1)
    batch = {"comp_image": img, "gen_image": img,
             "text_emb": jnp.asarray(rs.randn(4, 32).astype(np.float32))}
    state = trainer.create_state(jax.random.PRNGKey(0), batch)
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    int8_leaves = [l for l in jax.tree_util.tree_leaves(state.gen_opt_state)
                   if hasattr(l, "dtype") and l.dtype == jnp.int8]
    assert int8_leaves


pytestmark = pytest.mark.full
