"""Loss networks / criteria (jit-compiled, NHWC), mirroring SURVEY.md §2e.

LPIPS, ID (IR-SE-50), MoCo (ResNet-50), MS-SSIM, W-norm, CLIP. The feature
backbones live in `models.backbones` with torch-weight converters; each
criterion here is a flax module (or pure function) usable inside jitted
training steps.
"""

from .ms_ssim import ssim, msssim
from .w_norm import w_norm_loss
from .lpips import LPIPS
from .id_loss import IDLoss
from .moco_loss import MocoLoss

__all__ = ["ssim", "msssim", "w_norm_loss", "LPIPS", "IDLoss", "MocoLoss"]
