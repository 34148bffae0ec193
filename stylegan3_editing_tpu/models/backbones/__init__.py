"""Feature/metric backbones (flax, NHWC) with torch-state-dict converters.

Each backbone mirrors the architecture its reference counterpart loads
pretrained weights into (SURVEY.md §2e): IR-SE-50/IR-101 face nets, AlexNet /
VGG16 LPIPS stacks, MoCo ResNet-50, CLIP ViT-B/32. Converters map torchvision
/ InsightFace / OpenAI naming onto our trees so released weights drop in.
"""

from .irse import IRSEBackbone, convert_irse_state
from .alexnet import AlexNetFeatures, convert_alexnet_state
from .vgg import VGG16Features, convert_vgg16_state
from .resnet import ResNet50Features, convert_resnet50_state

__all__ = [
    "IRSEBackbone",
    "convert_irse_state",
    "AlexNetFeatures",
    "convert_alexnet_state",
    "VGG16Features",
    "convert_vgg16_state",
    "ResNet50Features",
    "convert_resnet50_state",
]
