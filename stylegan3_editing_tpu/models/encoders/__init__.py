"""ReStyle pSp / e4e inversion encoders (flax, NHWC)."""

from .map2style import GradualStyleBlock
from .backbones import (
    INFERENCE_STAGE,
    BackboneEncoder,
    ProgressiveBackboneEncoder,
    ResNetBackboneEncoder,
    ResNetProgressiveBackboneEncoder,
)
from .convert import (
    convert_restyle_encoder_state,
    encoder_state_from_model_checkpoint,
)
from .restyle import RestyleNet, get_average_image, run_restyle_iterations

__all__ = [
    "INFERENCE_STAGE",
    "convert_restyle_encoder_state",
    "encoder_state_from_model_checkpoint",
    "GradualStyleBlock",
    "BackboneEncoder",
    "ResNetBackboneEncoder",
    "ProgressiveBackboneEncoder",
    "ResNetProgressiveBackboneEncoder",
    "RestyleNet",
    "get_average_image",
    "run_restyle_iterations",
]
