"""TPU-native StyleGAN3 editing framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capabilities of krylea/stylegan3-editing
(alias-free StyleGAN3 synthesis, ReStyle pSp/e4e inversion, InterFaceGAN /
StyleCLIP editing, PTI, video pipeline, SetGAN training) for TPU hardware.

Layout convention: all image tensors are **NHWC** (TPU-native). The public
converters in `utils.image` translate to/from the reference's NCHW layout.
"""

__version__ = "0.1.0"
