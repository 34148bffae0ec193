"""Model zoo: alias-free StyleGAN3 generator (sg3), inversion encoders,
set-conditioned GAN (setgan), and loss/feature backbones."""
