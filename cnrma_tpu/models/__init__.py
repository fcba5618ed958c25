from cnrma_tpu.models.resnet_fpn import ResNetFPN2D
from cnrma_tpu.models.unet3d import UNet3D
from cnrma_tpu.models.tsdf_head import TSDFHead
from cnrma_tpu.models.fcaf3d import FCAF3DDetector
from cnrma_tpu.models.cn_rma import CNRMA, Atlas
