"""Stage-1 trainer tests: learning signal, GAN pieces, mesh-sharded parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from setok_tpu import config as cfgs
from setok_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from setok_tpu.parallel.sharding import fsdp_shardings, fsdp_spec
from setok_tpu.train.stage1 import Stage1State, Stage1Trainer, psnr


pytestmark = pytest.mark.full


def make_batch(b=8, size=32, seed=0):
    rs = np.random.RandomState(seed)
    img = rs.rand(b, size, size, 3).astype(np.float32) * 2 - 1
    return {"comp_image": jnp.asarray(img), "gen_image": jnp.asarray(img),
            "text_emb": jnp.asarray(rs.randn(b, 32).astype(np.float32))}


@pytest.fixture(scope="module")
def trainer():
    return Stage1Trainer(cfgs.tiny_tokenizer(), cfgs.tiny_detokenizer(),
                         gan_cfg=cfgs.GANLossConfig(disc_start=0,
                                                    warm_up_end=0),
                         contrastive_cfg=cfgs.ContrastiveLossConfig(
                             text_embed_dim=32))


def test_psnr():
    x = jnp.zeros((1, 8, 8, 3))
    assert float(psnr(x, x)) > 90
    assert float(psnr(x, x + 1.0)) == pytest.approx(
        10 * np.log10(4.0), abs=1e-3)


def test_train_step_learns(trainer):
    batch = make_batch()
    state = trainer.create_state(jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(1)
    first = None
    for i in range(25):
        rng, k = jax.random.split(rng)
        state, metrics = trainer.train_step(state, batch, k)
        if i == 0:
            first = float(metrics["rec_loss"])
    last = float(metrics["rec_loss"])
    assert np.isfinite(last)
    assert last < first, f"rec_loss did not improve: {first} -> {last}"
    assert int(state.step) == 25
    # metric surface matches the reference's loss-dict keys
    for key in ["rec_loss", "g_loss", "d_loss", "d_weight", "logits_real",
                "logits_fake", "contrastive_loss", "total_loss"]:
        assert key in metrics


def test_adaptive_weight_is_finite_and_positive(trainer):
    batch = make_batch(seed=3)
    state = trainer.create_state(jax.random.PRNGKey(2), batch)
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(3))
    w = float(metrics["d_weight"])
    assert np.isfinite(w) and 0 <= w <= 1e4


def test_fsdp_spec_rule():
    assert fsdp_spec((64, 1024), 8)[1] == "data"      # shard largest dim
    assert fsdp_spec((7, 9), 8) == jax.sharding.PartitionSpec()  # too small
    assert fsdp_spec((1024, 1024), 8)[0] == "data"


def test_mesh_sharded_step_matches_single_device(trainer):
    """GSPMD-sharded step (batch over 8 devices, FSDP params) must produce
    the same numbers as the unsharded step — the collectives XLA inserts
    (contrastive all-gather, grad reduce-scatter) are semantically invisible."""
    batch = make_batch()
    state1 = trainer.create_state(jax.random.PRNGKey(0), batch)
    state2 = trainer.create_state(jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(7)

    _, m_single = trainer.train_step(state1, batch, rng)

    mesh = make_mesh()
    bs = data_sharding(mesh)
    sharded_batch = jax.tree.map(lambda x: jax.device_put(x, bs), batch)
    sharded_state = jax.tree.map(
        jax.device_put, state2,
        fsdp_shardings(state2, mesh))
    _, m_sharded = trainer.train_step(sharded_state, sharded_batch, rng)

    for k in ["total_loss", "rec_loss", "d_loss", "contrastive_loss"]:
        np.testing.assert_allclose(float(m_single[k]), float(m_sharded[k]),
                                   rtol=2e-3, atol=1e-4), k


def test_eval_step(trainer):
    from setok_tpu.train.stage1 import eval_step
    batch = make_batch(seed=9)
    state = trainer.create_state(jax.random.PRNGKey(4), batch)
    m = eval_step(trainer, state, batch)
    assert np.isfinite(float(m["psnr"]))
    assert -1 <= float(m["ssim"]) <= 1


def test_text_encoder_contrastive_path():
    """use_text_encoder=True: contrastive ids are encoded in-graph."""
    tr = Stage1Trainer(cfgs.tiny_tokenizer(), cfgs.tiny_detokenizer(),
                       gan_cfg=cfgs.GANLossConfig(disc_start=0,
                                                  warm_up_end=0),
                       train_cfg=cfgs.TrainConfig(warmup_steps=0),
                       use_text_encoder=True)
    rs = np.random.RandomState(0)
    img = rs.rand(8, 32, 32, 3).astype(np.float32) * 2 - 1
    batch = {"comp_image": jnp.asarray(img), "gen_image": jnp.asarray(img),
             "input_ids_for_contrastive": jnp.asarray(
                 rs.randint(3, 30000, size=(8, 12)))}
    state = tr.create_state(jax.random.PRNGKey(0), batch)
    assert "text_encoder" in state.gen_params
    before = jax.tree.map(np.asarray, state.gen_params["text_encoder"])
    state, metrics = tr.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["contrastive_loss"]))
    after = state.gen_params["text_encoder"]
    moved = any(not np.allclose(a, np.asarray(b)) for a, b in zip(
        jax.tree_util.tree_leaves(before),
        jax.tree_util.tree_leaves(after)))
    assert moved    # the text tower trains with the generator


def test_gradient_accumulation_matches_single_step():
    """Stage-1 grad_accum_steps=k: k identical micro-batches reproduce the
    single-step update for BOTH optimizers (gen + disc accumulate in
    lockstep), with no param motion before the k-th micro-step."""
    tc = cfgs.TrainConfig(warmup_steps=0)
    mk = lambda cfg: Stage1Trainer(
        cfgs.tiny_tokenizer(), cfgs.tiny_detokenizer(),
        gan_cfg=cfgs.GANLossConfig(disc_start=0, warm_up_end=0),
        contrastive_cfg=cfgs.ContrastiveLossConfig(text_embed_dim=32),
        train_cfg=cfg)
    batch = make_batch(b=4)
    rng = jax.random.PRNGKey(1)

    tr1 = mk(tc)
    s1 = tr1.create_state(jax.random.PRNGKey(0), batch)
    s1, _ = tr1.train_step(s1, batch, rng)
    want = jax.tree.map(np.asarray, (s1.gen_params, s1.disc_params))

    tr2 = mk(cfgs.replace(tc, grad_accum_steps=2))
    s2 = tr2.create_state(jax.random.PRNGKey(0), batch)
    before = jax.tree.map(np.asarray, (s2.gen_params, s2.disc_params))
    s2, _ = tr2.train_step(s2, batch, rng)
    mid = jax.tree.map(np.asarray, (s2.gen_params, s2.disc_params))
    assert all(jax.tree.leaves(jax.tree.map(np.array_equal, before, mid)))
    s2, _ = tr2.train_step(s2, batch, rng)
    got = jax.tree.map(np.asarray, (s2.gen_params, s2.disc_params))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=2e-5, atol=2e-6), want, got)


def test_max_grad_norm_clips_update():
    """Parity: HF Trainer clips grad global-norm to max_grad_norm (default
    1.0); the reference never overrides it. With an absurdly small clip the
    Adam update is ~m/eps-scaled toward zero, so params must barely move;
    with clipping disabled the same batch moves them measurably."""
    batch = make_batch()

    def step_delta(max_grad_norm):
        tr = Stage1Trainer(
            cfgs.tiny_tokenizer(), cfgs.tiny_detokenizer(),
            gan_cfg=cfgs.GANLossConfig(disc_start=0, warm_up_end=0),
            contrastive_cfg=cfgs.ContrastiveLossConfig(text_embed_dim=32),
            train_cfg=cfgs.TrainConfig(max_grad_norm=max_grad_norm,
                                       warmup_steps=0, total_steps=10))
        state = tr.create_state(jax.random.PRNGKey(0), batch)
        before = jax.tree.map(np.asarray, state.gen_params)  # donated
        new_state, _ = tr.train_step(state, batch, jax.random.PRNGKey(1))
        deltas = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                              before, new_state.gen_params)
        return max(jax.tree.leaves(deltas))

    assert step_delta(1e-30) < 1e-9
    assert step_delta(0.0) > 1e-5       # 0 disables clipping entirely
