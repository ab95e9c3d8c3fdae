from rxtpu.models.twosites import TwoSitesNN, DummyClassifier  # noqa: F401
from rxtpu.models.resnet import (  # noqa: F401
    ResNet,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    make_backbone,
    BACKBONE_FEATURES,
)
from rxtpu.models.densenet import densenet121  # noqa: F401
from rxtpu.models.heads import MLPHead, ArcFaceHead  # noqa: F401
from rxtpu.models.pretrained import (  # noqa: F401
    stem_kernel_from_rgb,
    port_torch_resnet50,
    load_torch_state_dict,
)
