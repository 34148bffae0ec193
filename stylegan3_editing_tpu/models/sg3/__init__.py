"""Alias-free StyleGAN3 generator, TPU-native."""

from .config import SG3Config, sg3_r_config, sg3_t_config
from .generator import Generator, MappingNetwork, SynthesisNetwork

__all__ = [
    "SG3Config",
    "sg3_r_config",
    "sg3_t_config",
    "Generator",
    "MappingNetwork",
    "SynthesisNetwork",
]
