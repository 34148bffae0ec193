"""SetGAN: set-conditioned GAN training stack (the fork's addition).

Set transformers over style latents, a set-conditioned generator wrapping
the alias-free decoder, a projected set discriminator, DiffAugment, the
ProjectedSetGANLoss, class-consistent multi-set data sampling, and a pjit
data-parallel training loop with tick/snapshot/FID machinery.
"""

from .metrics import ConditionalFID, ConditionalMetrics, FeatureStats  # noqa: E402,F401
