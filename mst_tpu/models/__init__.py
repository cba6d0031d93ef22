"""Model zoo: DINOv2-style ViTs, slice fusion, MST classifiers, ResNets."""

from mst_tpu.models.layers import Attention, Block, Mlp, PatchEmbed, SwiGLU  # noqa: F401
from mst_tpu.models.mst import (  # noqa: F401
    DinoSliceClassifier,
    dino_v2_classifier_slice,
    dino_v3_classifier_slice,
)
from mst_tpu.models.slice_fusion import (  # noqa: F401
    MultiheadAttention,
    TransformerEncoderLayer,
)
from mst_tpu.models.convert import (  # noqa: F401
    convert_dinov2_vit,
    convert_hf_dinov2,
    convert_torch_resnet,
    load_pretrained_encoder,
    load_torch_state_dict,
)
from mst_tpu.models.resnet import (  # noqa: F401
    ResNet3DClassifier,
    ResNetBackbone,
    ResNetSliceTrans,
)
from mst_tpu.models.vit import (  # noqa: F401
    VisionTransformer,
    build_vit,
    vit_base,
    vit_giant2,
    vit_large,
    vit_small,
)
