"""Latent editing: InterFaceGAN boundaries, StyleCLIP global directions in
StyleSpace, StyleCLIP latent mappers."""
