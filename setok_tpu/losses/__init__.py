"""Loss exports. Parity: /root/reference/src/model/loss/__init__.py:1-6."""

from setok_tpu.losses.contrastive import ContrastiveLoss
from setok_tpu.losses.diffloss import DiffLoss
from setok_tpu.losses.gan import (NLayerDiscriminator, adaptive_weight,
                                  adopt_weight, discriminator_loss,
                                  generator_loss, hinge_d_loss,
                                  vanilla_d_loss)
from setok_tpu.losses.lpips import LPIPS
from setok_tpu.losses.mse import l1_loss, weighted_mse_loss

__all__ = [
    "ContrastiveLoss", "DiffLoss", "NLayerDiscriminator", "LPIPS",
    "adaptive_weight", "adopt_weight", "discriminator_loss",
    "generator_loss", "hinge_d_loss", "vanilla_d_loss", "l1_loss",
    "weighted_mse_loss",
]
