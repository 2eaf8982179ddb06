"""SetokTokenizer: image → variable-K semantic tokens (fixed-K_max padded).

Parity: /root/reference/src/model/setok/tokenizer.py:13-182. Pipeline is
identical — frozen ViT features, +2-D sin-cos pos-emb, DPC-KNN clustering
under stop-gradient (the reference wraps it in torch.no_grad, line 79),
per-cluster transformer + mean-pool, inter-cluster transformer, output
linear — but every stage is batched and static-shaped:

  * the reference processes one image at a time (unsqueeze/squeeze,
    tokenizer.py:162-169); here clustering vmaps over the batch;
  * the ragged per-cluster loop (group_encoding, lines 123-155) becomes one
    attention over all N patch tokens under a block-diagonal same-cluster
    mask + a one-hot segment-mean — mathematically identical, MXU-shaped;
  * output is (B, k_max, token_feat_dim) + boolean `token_valid` instead of
    a per-image variable length.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from setok_tpu.config import TokenizerConfig
from setok_tpu.models.vit import ViT
from setok_tpu.ops.blocks import Block
from setok_tpu.ops.clustering import (
    ClusterResult, cluster_dpc_knn, same_cluster_mask, segment_mean)
from setok_tpu.ops.posenc import posenc_2d_flat


class TokenizerOutput(NamedTuple):
    tokens: jnp.ndarray        # (B, k_max, token_feat_dim) concept tokens
    token_valid: jnp.ndarray   # (B, k_max) bool
    idx_cluster: jnp.ndarray   # (B, N) cluster id per patch token
    score: jnp.ndarray         # (B, N) density-peak score
    num_clusters: jnp.ndarray  # (B,) int32


class SetokTokenizer(nn.Module):
    cfg: TokenizerConfig
    freeze_backbone: bool = True
    quant8: bool = False    # int8 inference for the frozen matmuls
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        # With merge_layer and a RANDOM-init merge projection, "frozen
        # backbone" freezes only the pre-merge blocks — merge_proj must
        # train (ADVICE r3: frozen at random init it scrambles merged
        # features), so the ViT stop-gradients internally and
        # encode_features skips its outer stop_gradient. With the default
        # merge_pool_init the projection IS meaningful at init (exact 2x2
        # average-pool), so the whole ViT stays frozen like the unmerged
        # path — the r4 quality A/B showed the trainable post-merge tail
        # is a moving target the detokenizer cannot chase.
        self._split_freeze = (self.freeze_backbone
                              and self.cfg.vit.merge_layer is not None
                              and not self.cfg.vit.merge_pool_init)
        self.image_feature_encoder = ViT(
            cfg.vit, quant8=self.quant8,
            freeze_pre_merge=self._split_freeze,
            dtype=self.dtype, param_dtype=self.param_dtype)
        # The reference assumes vit width == hidden_dim (it adds the pos-emb
        # and feeds encoders in place, tokenizer.py:164-180, which only works
        # when they match); we add an explicit projection when they differ.
        self.feat_proj = (None if cfg.vit.width == cfg.hidden_dim else
                          nn.Dense(cfg.hidden_dim, dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name="feat_proj"))
        # Merge variant only: a trainable LayerNorm on the ViT output.
        # The post-merge blocks are trainable while every consumer of the
        # features is scale-invariant (normalized contrastive, LN-fronted
        # detokenizer) — so feature norms drift unopposed under Adam, and
        # the DPC-KNN score (dist·exp(-d²)) is exponentially scale-
        # sensitive: the r4 merge_layer=1 quality run drifted to |feat|≈2e3,
        # saturating clustering at K=N and collapsing the reconstruction to
        # a constant (SSIM 0.008 vs 0.18). The LN pins the clustering and
        # token interface to unit scale; resid-stream drift inside the
        # trainable blocks becomes harmless. The parity path (no merge) is
        # untouched — the reference's threshold is calibrated on raw
        # frozen-backbone features.
        self.merge_out_norm = (nn.LayerNorm(dtype=self.dtype,
                                            param_dtype=self.param_dtype,
                                            name="merge_out_norm")
                               if cfg.vit.merge_layer is not None else None)
        self.inner_encoder = Block(num_heads=cfg.nheads,
                                   mlp_hidden_dim=cfg.dim_feedforward,
                                   depth=cfg.inner_cluster_layers,
                                   proj_drop=cfg.proj_drop,
                                   attn_drop=cfg.attn_drop,
                                   quant8=self.quant8, dtype=self.dtype,
                                   param_dtype=self.param_dtype)
        self.inter_encoder = Block(num_heads=cfg.nheads,
                                   mlp_hidden_dim=cfg.dim_feedforward,
                                   depth=cfg.intra_cluster_layers,
                                   proj_drop=cfg.proj_drop,
                                   attn_drop=cfg.attn_drop,
                                   quant8=self.quant8, dtype=self.dtype,
                                   param_dtype=self.param_dtype)
        self.out = nn.Dense(cfg.token_feat_dim, dtype=self.dtype,
                            param_dtype=self.param_dtype)

    def encode_features(self, images: jnp.ndarray, *,
                        deterministic: bool = True) -> jnp.ndarray:
        """ViT features + 2-D sin-cos pos-emb, (B, N, hidden_dim).

        Parity: tokenizer.py:161-168 (+ frozen backbone,
        clip_encoder.py:50-62 @torch.no_grad).
        """
        feats = self.image_feature_encoder(images, deterministic=deterministic)
        if self.freeze_backbone and not self._split_freeze:
            # _split_freeze (random-init merge only): the ViT already
            # stop-gradients pre-merge features internally, leaving
            # merge_proj + post-merge blocks trainable — do not re-freeze
            # the output there. Every other frozen config (unmerged, or
            # pool-init merge) freezes the whole output here.
            feats = jax.lax.stop_gradient(feats)
        if self.merge_out_norm is not None:
            feats = self.merge_out_norm(feats)
        if self.feat_proj is not None:
            feats = self.feat_proj(feats)
        n = feats.shape[-2]
        h = w = int(round(n ** 0.5))
        pos = posenc_2d_flat(h, w, feats.shape[-1], dtype=feats.dtype)
        return feats + pos[None]

    def tokenize_features(self, x: jnp.ndarray,
                          token_mask: Optional[jnp.ndarray] = None,
                          threshold: Optional[float] = None,
                          k: Optional[int] = None, *,
                          deterministic: bool = True) -> TokenizerOutput:
        """Cluster + group-encode pre-computed features x: (B, N, D)."""
        cfg = self.cfg
        thr = threshold if threshold is not None else cfg.threshold
        knn = k if k is not None else cfg.knn

        def cluster_one(xi, mi):
            return cluster_dpc_knn(xi, k=knn, k_max=cfg.k_max,
                                   min_cluster_num=cfg.min_cluster_num,
                                   threshold=thr, token_mask=mi,
                                   dist_norm=cfg.cluster_dist_norm)

        # no_grad in the reference (tokenizer.py:79): assignments are data,
        # not a differentiable path
        xs = jax.lax.stop_gradient(x.astype(jnp.float32))
        from setok_tpu.kernels.cluster_pallas import (cluster_dpc_knn_pallas,
                                                      cluster_fits_vmem)
        use_pallas = (cfg.use_pallas_cluster and token_mask is None
                      and not cfg.cluster_dist_norm
                      and jax.devices()[0].platform == "tpu"
                      and cluster_fits_vmem(xs.shape[-2], xs.shape[-1]))
        if use_pallas:
            res: ClusterResult = jax.vmap(
                lambda xi: cluster_dpc_knn_pallas(
                    xi, k=knn, k_max=cfg.k_max,
                    min_cluster_num=cfg.min_cluster_num,
                    threshold=thr))(xs)
        elif token_mask is None:
            res = jax.vmap(lambda xi: cluster_one(xi, None))(xs)
        else:
            res = jax.vmap(cluster_one)(xs, token_mask)

        # group encoding (tokenizer.py:123-155) as masked attention + pool
        attn_mask = jax.vmap(same_cluster_mask)(
            res.idx_cluster,
            token_mask if token_mask is not None else None)
        grouped = self.inner_encoder(x, mask=attn_mask,
                                     deterministic=deterministic)
        pooled, counts = jax.vmap(
            lambda g, i, m: segment_mean(g, i, cfg.k_max, m))(
            grouped, res.idx_cluster,
            token_mask if token_mask is not None
            else jnp.ones(x.shape[:2], x.dtype))
        cluster_valid = counts > 0

        # inter-cluster encoder over valid concept tokens (tokenizer.py:179)
        inter_mask = cluster_valid[:, None, :] & cluster_valid[:, :, None]
        tokens = self.inter_encoder(pooled, mask=inter_mask,
                                    deterministic=deterministic)
        tokens = self.out(tokens)
        tokens = tokens * cluster_valid[..., None].astype(tokens.dtype)

        return TokenizerOutput(tokens=tokens, token_valid=cluster_valid,
                               idx_cluster=res.idx_cluster, score=res.score,
                               num_clusters=res.num_clusters)

    def __call__(self, images: jnp.ndarray,
                 token_mask: Optional[jnp.ndarray] = None,
                 threshold: Optional[float] = None, k: Optional[int] = None,
                 *, deterministic: bool = True) -> TokenizerOutput:
        """images: (B, H, W, 3) → TokenizerOutput. Parity: tokenizer.py:157-182."""
        x = self.encode_features(images, deterministic=deterministic)
        return self.tokenize_features(x, token_mask=token_mask,
                                      threshold=threshold, k=k,
                                      deterministic=deterministic)
