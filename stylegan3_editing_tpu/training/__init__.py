"""Encoder training (coaches), optimizers, latent discriminator."""

from .ranger import ranger
from .latent_discriminator import LatentCodesDiscriminator, LatentCodesPool
from .options import TrainOptions, E4eTrainOptions

__all__ = ["ranger", "LatentCodesDiscriminator", "LatentCodesPool",
           "TrainOptions", "E4eTrainOptions"]
