from .resnet import ResNet  # noqa: F401
from .fpn import FPN  # noqa: F401
from .detector import GraphDETR4D  # noqa: F401

__all__ = ["ResNet", "FPN", "GraphDETR4D"]

# heavier families import lazily from their modules:
#   .vovnet.VoVNet, .mobilenet.MobileNetV2, .head.Detr3DHeadPE,
#   .petr_head.PETRHead, .petr_seg.PETRHeadSeg, .dgcnn.ObjDGCNN,
#   .attention_variants.{Detr3DCrossAtten,Detr3DCrossAttenV2,
#   Deform3DCrossAttnMP}, .camera_aware.{DepthNet,CAMConv}
