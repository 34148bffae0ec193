"""ReStyle pSp / e4e inversion encoders (flax, NHWC)."""

from .map2style import GradualStyleBlock
from .backbones import (
    BackboneEncoder,
    ProgressiveBackboneEncoder,
    ResNetBackboneEncoder,
    ResNetProgressiveBackboneEncoder,
)
from .restyle import RestyleNet, get_average_image, run_restyle_iterations

__all__ = [
    "GradualStyleBlock",
    "BackboneEncoder",
    "ResNetBackboneEncoder",
    "ProgressiveBackboneEncoder",
    "ResNetProgressiveBackboneEncoder",
    "RestyleNet",
    "get_average_image",
    "run_restyle_iterations",
]
