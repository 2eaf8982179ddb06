"""Token-merge (smaller-N) encoder variant.

No reference equivalent — this is the PERF.md "smaller-N architecture"
experiment: ViTConfig.merge_layer folds 2x2 patch neighborhoods
(space-to-depth + linear) after a chosen block, so the remaining encoder
depth and the whole clustering/group-encode pipeline run at N/4.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from setok_tpu import config as cfgs
from setok_tpu.models.tokenizer import SetokTokenizer
from setok_tpu.models.vit import ViT


def _merged_cfg():
    tc = cfgs.tiny_tokenizer()
    vit = dataclasses.replace(tc.vit, merge_layer=0)
    return dataclasses.replace(tc, vit=vit, k_max=4, knn=3,
                               min_cluster_num=2)


def test_vit_merge_shapes():
    tc = _merged_cfg()
    m = ViT(tc.vit)
    imgs = jnp.zeros((2, tc.vit.image_size, tc.vit.image_size, 3))
    params = m.init(jax.random.PRNGKey(0), imgs)
    feats = m.apply(params, imgs)
    n_full = tc.vit.num_patches
    assert feats.shape == (2, n_full // 4, tc.vit.width)
    assert "merge_proj" in params["params"]


def test_merge_spatial_identity():
    """The 2x2 fold must group spatial NEIGHBORS, not strided patches.

    With a one-layer ViT whose block is bypassed numerically (we read the
    reshape directly), patch (2i, 2j),(2i,2j+1),(2i+1,2j),(2i+1,2j+1) land
    in merged slot (i, j). Verified via the pure reshape/transpose math on a
    labeled grid.
    """
    g = 4
    c = 1
    x = jnp.arange(g * g, dtype=jnp.float32).reshape(1, g * g, c)
    bb, nn_, cc = x.shape
    y = x.reshape(bb, g // 2, 2, g // 2, 2, cc)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(bb, (g // 2) ** 2, 4 * cc)
    # merged slot (0,0) must contain grid entries 0,1,4,5 (row-major 4x4)
    assert sorted(y[0, 0].tolist()) == [0.0, 1.0, 4.0, 5.0]
    assert sorted(y[0, 3].tolist()) == [10.0, 11.0, 14.0, 15.0]


def test_tokenizer_merged_end_to_end():
    tc = _merged_cfg()
    m = SetokTokenizer(tc)
    imgs = jax.random.uniform(jax.random.PRNGKey(1),
                              (2, tc.vit.image_size, tc.vit.image_size, 3))
    params = m.init(jax.random.PRNGKey(0), imgs)
    out = jax.jit(lambda p, x: m.apply(p, x))(params, imgs)
    n_merged = tc.vit.num_patches // 4
    assert out.tokens.shape == (2, tc.k_max, tc.token_feat_dim)
    assert out.idx_cluster.shape == (2, n_merged)
    assert bool(jnp.all(out.num_clusters >= 1))
    assert bool(jnp.all(jnp.isfinite(out.tokens)))


def test_merge_rejects_class_token():
    tc = cfgs.tiny_tokenizer()
    with pytest.raises(ValueError, match="merge_layer"):
        dataclasses.replace(tc.vit, merge_layer=0, use_class_token=True)


def test_merge_config_validation():
    tc = cfgs.tiny_tokenizer()
    # out-of-range merge point
    with pytest.raises(ValueError, match="merge_layer"):
        dataclasses.replace(tc.vit, merge_layer=tc.vit.depth)
    # odd patch grid (e.g. 40/8 = 5)
    with pytest.raises(ValueError, match="even patch grid"):
        dataclasses.replace(tc.vit, merge_layer=0, image_size=40)
    # cluster knobs larger than the merged patch count (ADVICE r3 high #1:
    # this used to crash lax.top_k deep inside the first train step)
    vit = dataclasses.replace(tc.vit, merge_layer=0)
    with pytest.raises(ValueError, match="k_max"):
        dataclasses.replace(tc, vit=vit, k_max=tc.vit.num_patches)
    with pytest.raises(ValueError, match="knn"):
        dataclasses.replace(tc, vit=vit, k_max=4, knn=16, min_cluster_num=2)


def test_merge_proj_trains_under_frozen_backbone():
    """ADVICE r3 high #2: with freeze_backbone=True (the stage-1 default)
    and a RANDOM-init merge projection (merge_pool_init=False), merge_proj
    and the post-merge blocks must still receive gradients — random-init
    merge_proj frozen scrambles merged features. Pre-merge blocks stay
    frozen. (With the default merge_pool_init the whole backbone freezes
    instead — test_pool_init_merge_fully_frozen.)"""
    tc = _merged_cfg()     # merge_layer=0 of depth 2: block_0 pre, block_1 post
    tc = dataclasses.replace(
        tc, vit=dataclasses.replace(tc.vit, merge_pool_init=False))
    m = SetokTokenizer(tc, freeze_backbone=True)
    imgs = jax.random.uniform(jax.random.PRNGKey(1),
                              (2, tc.vit.image_size, tc.vit.image_size, 3))
    params = m.init(jax.random.PRNGKey(0), imgs)

    def loss(p):
        out = m.apply(p, imgs)
        return jnp.sum(out.tokens ** 2)

    g = jax.grad(loss)(params)["params"]["image_feature_encoder"]
    l2 = lambda t: sum(float(jnp.sum(x ** 2))
                       for x in jax.tree.leaves(t))
    assert l2(g["merge_proj"]) > 0.0
    assert l2(g["block_1"]) > 0.0          # post-merge: trainable
    assert l2(g["block_0"]) == 0.0         # pre-merge: frozen
    assert l2(g["patch_embed"]) == 0.0
    assert float(jnp.sum(g["pos_embed"] ** 2)) == 0.0


def test_merge_fully_frozen_without_merge():
    """Without merge_layer the whole backbone stays frozen (unchanged)."""
    tc = cfgs.tiny_tokenizer()
    m = SetokTokenizer(tc, freeze_backbone=True)
    imgs = jax.random.uniform(jax.random.PRNGKey(1),
                              (2, tc.vit.image_size, tc.vit.image_size, 3))
    params = m.init(jax.random.PRNGKey(0), imgs)

    def loss(p):
        return jnp.sum(m.apply(p, imgs).tokens ** 2)

    g = jax.grad(loss)(params)["params"]["image_feature_encoder"]
    assert all(float(jnp.sum(x ** 2)) == 0.0 for x in jax.tree.leaves(g))


def test_detok_patch_variant_shapes():
    """--detok-patch 32 counterpart (PERF.md 'token-merge'): patch 2x →
    grid^2/4 mapper+decoder queries, same output image size."""
    from setok_tpu.models.detokenizer import SetokDeTokenizer

    det = dataclasses.replace(cfgs.tiny_detokenizer(), patch_size=16)
    assert det.image_size % det.patch_size == 0
    m = SetokDeTokenizer(det)
    toks = jax.random.normal(jax.random.PRNGKey(0),
                             (2, 5, det.token_feat_dim))
    out = m.apply(m.init(jax.random.PRNGKey(1), toks), toks)
    assert out.image.shape == (2, det.image_size, det.image_size, 3)
    assert out.hidden.shape == (2, det.grid ** 2, det.decoder_embed_dim)
    # halving the grid: 4x fewer queries, identical image shape
    det2 = dataclasses.replace(det, patch_size=det.patch_size * 2)
    m2 = SetokDeTokenizer(det2)
    out2 = m2.apply(m2.init(jax.random.PRNGKey(1), toks), toks)
    assert out2.image.shape == (2, det.image_size, det.image_size, 3)
    assert out2.hidden.shape[1] == out.hidden.shape[1] // 4


def test_detok_depth_variant_shapes_and_train_step():
    """--detok-depth D: shallower pixel decoder, SAME query grid — the
    speed lever that stays inside the quality-proven patch-16 decode
    geometry (the detok_patch>16 family trains into a constant-token
    basin; PERF.md round-5 quality program)."""
    from setok_tpu.models.detokenizer import SetokDeTokenizer
    from setok_tpu.models.setok import SeTok
    from setok_tpu.train.stage1 import Stage1Trainer
    import numpy as np

    det = dataclasses.replace(cfgs.tiny_detokenizer(), decoder_depth=1)
    m = SetokDeTokenizer(det)
    toks = jax.random.normal(jax.random.PRNGKey(0),
                             (2, 5, det.token_feat_dim))
    out = m.apply(m.init(jax.random.PRNGKey(1), toks), toks)
    assert out.image.shape == (2, det.image_size, det.image_size, 3)
    # query grid unchanged vs the full-depth decoder
    assert out.hidden.shape == (2, det.grid ** 2, det.decoder_embed_dim)
    # fewer decoder params than full depth (tiny default is depth 2)
    full = SetokDeTokenizer(cfgs.tiny_detokenizer())
    n_shallow = sum(x.size for x in jax.tree.leaves(
        m.init(jax.random.PRNGKey(1), toks)))
    n_full = sum(x.size for x in jax.tree.leaves(
        full.init(jax.random.PRNGKey(1), toks)))
    assert n_shallow < n_full

    # merge1 + shallow decoder trains one stage-1 step (shipping recipe)
    tc = cfgs.tiny_tokenizer()
    vit = dataclasses.replace(tc.vit, merge_layer=0)
    n_out = vit.num_output_patches
    tc = dataclasses.replace(tc, vit=vit, k_max=min(tc.k_max, n_out),
                             knn=min(tc.knn, n_out),
                             min_cluster_num=min(tc.min_cluster_num, n_out))
    model = SeTok(tc, det)
    size = tc.vit.image_size
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (2, size, size, 3),
                              jnp.float32, -1.0, 1.0)
    o = model.apply(model.init(jax.random.PRNGKey(1), imgs), imgs)
    assert o.recon.shape == (2, size, size, 3)
    trainer = Stage1Trainer(tc, det,
                            train_cfg=cfgs.TrainConfig(batch_size=2,
                                                       warmup_steps=0))
    batch = {"comp_image": imgs, "gen_image": imgs}
    state = trainer.create_state(jax.random.PRNGKey(0), batch)
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total_loss"]))


def test_setok_merge_plus_detok_patch_end_to_end():
    """The combined fast recipe (merge_layer + coarse detok patch) runs as
    one SeTok forward and a stage-1 train step."""
    from setok_tpu.models.setok import SeTok
    from setok_tpu.train.stage1 import Stage1Trainer
    import numpy as np

    tc = cfgs.tiny_tokenizer()
    vit = dataclasses.replace(tc.vit, merge_layer=0)
    n_out = vit.num_output_patches
    tc = dataclasses.replace(tc, vit=vit, k_max=min(tc.k_max, n_out),
                             knn=min(tc.knn, n_out),
                             min_cluster_num=min(tc.min_cluster_num, n_out))
    det = dataclasses.replace(cfgs.tiny_detokenizer(),
                              patch_size=cfgs.tiny_detokenizer().patch_size
                              * 2)
    model = SeTok(tc, det)
    size = tc.vit.image_size
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (2, size, size, 3),
                              jnp.float32, -1.0, 1.0)
    out = model.apply(model.init(jax.random.PRNGKey(1), imgs), imgs)
    assert out.recon.shape == (2, size, size, 3)

    trainer = Stage1Trainer(tc, det,
                            train_cfg=cfgs.TrainConfig(batch_size=2,
                                                       warmup_steps=0))
    batch = {"comp_image": imgs, "gen_image": imgs}
    state = trainer.create_state(jax.random.PRNGKey(0), batch)
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total_loss"]))


def test_merge_out_norm_pins_feature_scale():
    """Regression (r4 quality run): with trainable post-merge blocks every
    feature consumer is scale-invariant, so norms drift unopposed — the
    merge_layer=1 chip run drifted to |feat|~2e3, saturated DPC-KNN at
    K=N (score is exp-scale-sensitive) and collapsed reconstruction to a
    constant. The merge_out_norm LayerNorm must pin the clustering/token
    interface to unit RMS regardless of resid-stream scale."""
    tc = _merged_cfg()
    m = SetokTokenizer(tc)
    imgs = jax.random.uniform(jax.random.PRNGKey(1),
                              (2, tc.vit.image_size, tc.vit.image_size, 3))
    params = m.init(jax.random.PRNGKey(0), imgs)
    assert "merge_out_norm" in params["params"]

    # simulate runaway resid drift: scale the merge projection 100x
    import jax.tree_util as jtu
    def scale_merge(path, x):
        keys = [getattr(p, "key", "") for p in path]
        return x * 100.0 if "merge_proj" in keys and "kernel" in keys else x
    drifted = jtu.tree_map_with_path(scale_merge, params)

    feats = m.apply(drifted, imgs, method=m.encode_features)
    rms = float(jnp.sqrt(jnp.mean(jnp.square(feats))))
    base = m.apply(params, imgs, method=m.encode_features)
    rms0 = float(jnp.sqrt(jnp.mean(jnp.square(base))))
    # LN-anchored: 100x weight drift must not move the interface scale
    assert rms < 4.0 * rms0, (rms, rms0)

    out = m.apply(drifted, imgs)
    assert int(out.num_clusters.max()) <= tc.k_max


def test_unmerged_tokenizer_has_no_merge_norm():
    """Parity guard: the reference path (merge_layer=None) must not grow
    a normalization layer — its threshold is calibrated on raw frozen
    features (tokenizer.py cluster_dpc_knn, threshold=0.53)."""
    tc = cfgs.tiny_tokenizer()
    m = SetokTokenizer(tc)
    imgs = jnp.zeros((1, tc.vit.image_size, tc.vit.image_size, 3))
    params = m.init(jax.random.PRNGKey(0), imgs)
    assert "merge_out_norm" not in params["params"]


def test_pool_init_merge_is_exact_average_at_init():
    """merge_pool_init (default): merge_proj starts as the exact 2x2
    average-pool operator — kernel 0.25·[I;I;I;I], zero bias — so the
    merged path is meaningful at init and the frozen-backbone recipe has
    baseline-identical training dynamics (r4 quality A/B: a trainable
    random post-merge tail is a moving target the detokenizer can't
    chase)."""
    import numpy as np
    tc = _merged_cfg()
    m = ViT(tc.vit)
    imgs = jnp.zeros((1, tc.vit.image_size, tc.vit.image_size, 3))
    params = m.init(jax.random.PRNGKey(0), imgs)["params"]
    k = np.asarray(params["merge_proj"]["kernel"])
    c = k.shape[1]
    want = 0.25 * np.concatenate([np.eye(c)] * 4, axis=0)
    np.testing.assert_allclose(k, want)
    np.testing.assert_allclose(np.asarray(params["merge_proj"]["bias"]), 0)


def test_pool_init_merge_fully_frozen():
    """With the default merge_pool_init, freeze_backbone freezes the WHOLE
    ViT (merge_proj included) — only the tokenizer encoders/out and
    merge_out_norm train, exactly like the unmerged path."""
    tc = _merged_cfg()
    m = SetokTokenizer(tc, freeze_backbone=True)
    imgs = jax.random.uniform(jax.random.PRNGKey(1),
                              (2, tc.vit.image_size, tc.vit.image_size, 3))
    params = m.init(jax.random.PRNGKey(0), imgs)

    def loss(p):
        return jnp.sum(m.apply(p, imgs).tokens ** 2)

    g = jax.grad(loss)(params)["params"]
    enc = g["image_feature_encoder"]
    assert all(float(jnp.sum(x ** 2)) == 0.0 for x in jax.tree.leaves(enc))
    # the norm + tokenizer encoders still train
    l2 = lambda t: sum(float(jnp.sum(x ** 2)) for x in jax.tree.leaves(t))
    assert l2(g["merge_out_norm"]) > 0.0
