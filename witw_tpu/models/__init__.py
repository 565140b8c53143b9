from witw_tpu.models.baseline import BaselineEncoder
from witw_tpu.models.fov_dsm import FovDsm, fov_dsm_trainable_mask
from witw_tpu.models.backbones.vgg16 import Vgg16Features

__all__ = [
    "BaselineEncoder",
    "FovDsm",
    "fov_dsm_trainable_mask",
    "Vgg16Features",
]
