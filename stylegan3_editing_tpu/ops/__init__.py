"""Signal-processing op core (TPU-native).

Each op here is the TPU equivalent of one of the reference's CUDA kernels
(see /root/reference/torch_utils/ops). Semantics follow the reference's
pure `impl='ref'` paths; implementation is XLA-first (conv_general_dilated,
lax.pad) with Pallas fusions for the hot path.
"""

from .filter_design import design_lowpass_filter, setup_filter
from .upfirdn2d import upfirdn2d, filter2d, upsample2d, downsample2d
from .bias_act import bias_act, activation_funcs
from .filtered_lrelu import filtered_lrelu
from .modulated_conv import modulated_conv2d

__all__ = [
    "design_lowpass_filter",
    "setup_filter",
    "upfirdn2d",
    "filter2d",
    "upsample2d",
    "downsample2d",
    "bias_act",
    "activation_funcs",
    "filtered_lrelu",
    "modulated_conv2d",
]
