from .resnet import ResNet  # noqa: F401
from .fpn import FPN  # noqa: F401
from .detector import GraphDETR4D  # noqa: F401
