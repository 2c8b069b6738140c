from maed_tpu.models.maed import MAED
from maed_tpu.models.ktd import KTD
from maed_tpu.models.spin import IterativeRegressor
from maed_tpu.models.resnet import ResNet50
from maed_tpu.models.resnetv2 import ResNetV2
from maed_tpu.models.vit import (
    VisionTransformer,
    StAttention,
    vit_custom_resnet50_224_in21k,
    vit_base_resnet50_224_in21k,
)
