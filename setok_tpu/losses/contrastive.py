"""Image↔text contrastive loss with differentiable cross-device gather.

Parity: /root/reference/src/model/loss/multilabel_constrastive.py:27-155.
The reference gathers negatives across GPUs with `diffdist.all_gather` (a
wrapper that re-threads gradients through NCCL, lines 14-24) and offsets the
positive labels by `batch_size * rank` (line 58). In JAX the same thing is
one `jax.lax.all_gather` inside the jitted/shard_mapped step — differentiable
by construction, riding ICI — and the rank offset is `jax.lax.axis_index`.

Reference bugs *not* reproduced (SURVEY.md §7 decision 5): the reference
encodes the text *after* computing the loss on raw token ids
(multilabel_constrastive.py:140-142) and calls `super().__init__` with a
class argument (line 35). Here the loss consumes already-encoded embeddings;
text encoding belongs to the model.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from setok_tpu.config import ContrastiveLossConfig


def _normalize(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-8)


def _gather(x: jnp.ndarray, axis_name: Optional[str]) -> jnp.ndarray:
    """dist_collect (multilabel_constrastive.py:14-24): (b, ...) →
    (world·b, ...), differentiable."""
    if axis_name is None:
        return x
    return jax.lax.all_gather(x, axis_name).reshape(-1, *x.shape[1:])


class ContrastiveLoss(nn.Module):
    """CLIP-style InfoNCE + optional GroupViT multi-label soft-CE branch."""

    cfg: ContrastiveLossConfig

    def setup(self):
        init = float(np.log(1.0 / self.cfg.contrast_temperature))
        self.logit_scale = self.param("logit_scale",
                                      nn.initializers.constant(init), ())
        if self.cfg.multi_label > 0 and not self.cfg.share_temperature:
            self.multi_label_logit_scale = self.param(
                "multi_label_logit_scale", nn.initializers.constant(init), ())

    def _scale(self, shared: bool = True) -> jnp.ndarray:
        """exp(logit_scale) clamped to 100 (multilabel_constrastive.py:67)."""
        p = (self.logit_scale if shared or self.cfg.share_temperature
             else self.multi_label_logit_scale)
        return jnp.clip(jnp.exp(p), max=100.0)

    def info_nce(self, image_x, text_x,
                 axis_name: Optional[str] = None) -> jnp.ndarray:
        """Global-negative InfoNCE (multilabel_constrastive.py:53-73).

        image_x/text_x: (B, C) embeddings of the local shard.
        """
        b = image_x.shape[0]
        rank = jax.lax.axis_index(axis_name) if axis_name is not None else 0
        labels = jnp.arange(b) + b * rank

        image_x = _normalize(image_x.astype(jnp.float32))
        text_x = _normalize(text_x.astype(jnp.float32))
        logits_per_img = image_x @ _gather(text_x, axis_name).T
        logits_per_text = text_x @ _gather(image_x, axis_name).T

        scale = self._scale()
        loss_img = _cross_entropy(logits_per_img * scale, labels)
        loss_text = _cross_entropy(logits_per_text * scale, labels)
        return 0.5 * (loss_img + loss_text)

    def multi_label_loss(self, image_feat, text_feat,
                         axis_name: Optional[str] = None) -> jnp.ndarray:
        """GroupViT multi-label soft-CE over (B, L, C) sets
        (multilabel_constrastive.py:75-137)."""
        b, l1, _ = image_feat.shape
        l2 = text_feat.shape[1]
        world = jax.lax.axis_size(axis_name) if axis_name is not None else 1
        rank = jax.lax.axis_index(axis_name) if axis_name is not None else 0

        image_feat = _normalize(image_feat.astype(jnp.float32))
        text_feat = _normalize(text_feat.astype(jnp.float32))
        scale = self._scale(shared=False)

        image_x = image_feat.reshape(b * l1, -1)
        text_x = text_feat.reshape(b * l2, -1)
        logits_per_img = image_x @ _gather(text_x, axis_name).T  # (bl1, Wbl2)
        logits_per_text = text_x @ _gather(image_x, axis_name).T

        # Soft targets put uniform 1/L_col mass ONLY on own-sample pairs in
        # the own-rank slot (multilabel_constrastive.py:104-131: the target
        # rows for logits_per_img carry `ones/dist_per_text.size(1)` = 1/L2
        # on each of their L2 own-block columns) — so instead of
        # materializing the dense (b, L, b, L, world) label tensor (the
        # r2 memory hazard at GroupViT scale), slice the log-probs down to
        # the own-rank, own-sample block and sum there. Identical math
        # (oracle: tests/test_reference_parity_losses.py, L1≠L2 included).
        def _masked_ce(logits, l_row, l_col):
            logp = jax.nn.log_softmax(logits * scale, axis=-1)
            lp = logp.reshape(b, l_row, world, b, l_col)
            lp_rank = jax.lax.dynamic_index_in_dim(lp, rank, axis=2,
                                                   keepdims=False)
            own = lp_rank[jnp.arange(b), :, jnp.arange(b), :]  # (b,lr,lc)
            return jnp.mean(-jnp.sum(own, axis=-1) / l_col)

        loss_img = _masked_ce(logits_per_img, l1, l2)
        loss_text = _masked_ce(logits_per_text, l2, l1)
        return 0.5 * (loss_img + loss_text)

    def __call__(self, image_x, text_x, axis_name: Optional[str] = None):
        """Returns (loss, metrics-dict). image_x: (B, C) pooled image tokens;
        text_x: (B, C) encoded text. Parity: forward (lines 139-155) minus
        the encode-after-loss bug."""
        loss = self.info_nce(image_x, text_x, axis_name)
        metrics = {"contrastive_loss": loss}
        if self.cfg.multi_label > 0:
            ml = self.multi_label_loss(image_x[:, None, :], text_x[:, None, :],
                                       axis_name)
            ml = ml * self.cfg.multi_label_loss_weight
            loss = loss + ml
            metrics["multi_label_loss"] = ml
        return loss, metrics


def _cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def _soft_cross_entropy(logits, soft_targets):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(jnp.sum(-soft_targets * logp, axis=-1))
