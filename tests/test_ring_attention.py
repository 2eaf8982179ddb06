"""Ring attention over an 8-device mesh == single-device full attention."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from setok_tpu.parallel.ring_attention import ring_attention


pytestmark = pytest.mark.full


def full_attention(q, k, v, causal=True):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / (d ** 0.5)
    if causal:
        L = q.shape[2]
        mask = jnp.tril(jnp.ones((L, L), bool))
        s = jnp.where(mask[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full(causal):
    rs = np.random.RandomState(0)
    B, H, L, D = 2, 2, 64, 16          # 8 devices → 8 tokens per shard
    q = jnp.asarray(rs.randn(B, H, L, D).astype(np.float32))
    k = jnp.asarray(rs.randn(B, H, L, D).astype(np.float32))
    v = jnp.asarray(rs.randn(B, H, L, D).astype(np.float32))

    mesh = jax.make_mesh((8,), ("seq",))
    spec = P(None, None, "seq", None)

    ring = jax.jit(shard_map(
        lambda q, k, v: ring_attention(q, k, v, "seq", causal=causal),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec))

    got = np.asarray(ring(q, k, v))
    want = np.asarray(full_attention(q, k, v, causal=causal))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_ring_is_differentiable():
    rs = np.random.RandomState(1)
    B, H, L, D = 1, 2, 32, 8
    q = jnp.asarray(rs.randn(B, H, L, D).astype(np.float32))
    k = jnp.asarray(rs.randn(B, H, L, D).astype(np.float32))
    v = jnp.asarray(rs.randn(B, H, L, D).astype(np.float32))
    mesh = jax.make_mesh((8,), ("seq",))
    spec = P(None, None, "seq", None)
    ring = shard_map(lambda q, k, v: ring_attention(q, k, v, "seq"),
                     mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)

    g_ring = jax.jit(jax.grad(
        lambda q: jnp.sum(jnp.cos(ring(q, k, v)))))(q)
    g_full = jax.jit(jax.grad(
        lambda q: jnp.sum(jnp.cos(full_attention(q, k, v)))))(q)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_full),
                               rtol=2e-3, atol=2e-4)


def masked_full_attention(q, k, v, positions, valid):
    """Dense oracle with hole-aware causal+validity mask
    (models/llama.make_attention_mask semantics)."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / (d ** 0.5)
    allowed = (positions[:, :, None] >= positions[:, None, :]) \
        & valid[:, :, None] & valid[:, None, :]
    s = jnp.where(allowed[:, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(allowed[:, None], p, 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return jnp.where(valid[:, None, :, None], out, 0.0)


def test_ring_with_holes_matches_masked_dense():
    """Hole-aware positions/valid (the Setokim splice layout) rotate with
    K/V around the ring; output == the dense masked path."""
    rs = np.random.RandomState(2)
    B, H, L, D = 2, 2, 64, 16
    q = jnp.asarray(rs.randn(B, H, L, D).astype(np.float32))
    k = jnp.asarray(rs.randn(B, H, L, D).astype(np.float32))
    v = jnp.asarray(rs.randn(B, H, L, D).astype(np.float32))
    valid_np = rs.rand(B, L) > 0.25          # mid-sequence holes
    valid_np[:, 0] = True
    valid = jnp.asarray(valid_np)
    positions = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1

    mesh = jax.make_mesh((8,), ("seq",))
    spec = P(None, None, "seq", None)
    row = P(None, "seq")
    ring = jax.jit(shard_map(
        lambda q, k, v, p_, m_: ring_attention(q, k, v, "seq", causal=True,
                                               positions=p_, valid=m_),
        mesh=mesh, in_specs=(spec, spec, spec, row, row), out_specs=spec))

    got = np.asarray(ring(q, k, v, positions, valid))
    want = np.asarray(masked_full_attention(q, k, v, positions, valid))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_setokim_ring_train_step_matches_dense():
    """The wired product path (VERDICT r2 item 4): Setokim with a
    (data=2, seq=4) ring mesh — forward loss equals the dense-mask path
    and a Stage2Trainer step produces finite losses."""
    from setok_tpu import config as cfgs
    from setok_tpu.constants import IMAGE_TOKEN_INDEX
    from setok_tpu.models.setokim import Setokim
    from setok_tpu.parallel.mesh import make_sp_mesh
    from setok_tpu.train.stage2 import Stage2Trainer

    cfg = cfgs.tiny_setokim()
    mesh = make_sp_mesh(data=2, seq=4)
    TGT = 3
    B, L = 2, 64
    rs = np.random.RandomState(0)
    ids = np.zeros((B, L), np.int64)
    ids[:, 0] = 1
    ids[:, 1:1 + cfg.tokenizer.k_max] = IMAGE_TOKEN_INDEX
    ids[:, 20:28] = rs.randint(10, 400, size=(B, 8))
    labels = np.full((B, L), -100, np.int64)
    labels[:, 20:28] = ids[:, 20:28]
    labels[:, 30:30 + cfg.target_num] = TGT
    ids[:, 30:30 + cfg.target_num] = TGT
    imgs = rs.rand(B, 32, 32, 3).astype(np.float32) * 2 - 1

    dense = Setokim(cfg, target_token_id=TGT)
    ringm = Setokim(cfg, target_token_id=TGT, ring_mesh=mesh)
    rng = jax.random.PRNGKey(0)
    params = dense.init(rng, jnp.asarray(ids), jnp.asarray(imgs),
                        jnp.asarray(labels), jnp.asarray(imgs),
                        jax.random.PRNGKey(1), method=dense.init_all)

    out_d = dense.apply(params, jnp.asarray(ids), jnp.asarray(imgs),
                        jnp.asarray(labels), jnp.asarray(imgs),
                        jax.random.PRNGKey(2))
    out_r = ringm.apply(params, jnp.asarray(ids), jnp.asarray(imgs),
                        jnp.asarray(labels), jnp.asarray(imgs),
                        jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(out_r.lm_loss), float(out_d.lm_loss),
                               rtol=1e-4)
    # logits agree at VALID positions (invalid holes carry no semantics:
    # dense leaves fully-masked softmax garbage there, ring zeroes them,
    # and nothing downstream reads them — CE gathers at valid predecessors)
    v = np.asarray(out_d.valid)
    np.testing.assert_allclose(np.asarray(out_r.logits)[v],
                               np.asarray(out_d.logits)[v], rtol=2e-3,
                               atol=2e-3)

    # one full train step through the trainer with the ring mesh
    trainer = Stage2Trainer(cfg, ring_mesh=mesh)
    batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
             "comp_image": jnp.asarray(imgs), "gen_image": jnp.asarray(imgs)}
    state = trainer.create_state(jax.random.PRNGKey(3), batch)
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["total_loss"]))


def test_ring_long_context_train_step():
    """Long-context smoke (VERDICT item 4): an 8k-token text-only sequence
    through the ring-sharded tiny trunk — one loss/grad step, finite."""
    from setok_tpu import config as cfgs
    from setok_tpu.models.llama import LlamaForCausalLM
    from setok_tpu.parallel.mesh import make_sp_mesh

    L = 8192
    cfg = cfgs.replace(cfgs.tiny_llama(), max_seq_len=L)
    mesh = make_sp_mesh(data=1, seq=8)
    model = LlamaForCausalLM(cfg, ring_mesh=mesh)
    ids = jnp.asarray(
        np.random.RandomState(0).randint(4, 500, size=(1, L)))
    # init via the embed path only (cheap), then run the ring forward
    params = model.init(jax.random.PRNGKey(0), ids[:, :64])

    @jax.jit
    def loss_fn(p):
        logits, _, _ = model.apply(p, ids)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
        picked = jnp.take_along_axis(lp, ids[:, 1:, None], -1)
        return -jnp.mean(picked)

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.square(x)), grads, 0.0)
    assert np.isfinite(float(gnorm))
