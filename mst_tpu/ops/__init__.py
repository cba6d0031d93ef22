"""Pure-function numerics and Pallas kernels (no module/parameter state)."""

from mst_tpu.ops.attention import (
    attention_reference,
    flash_attention,
    make_key_padding_bias,
)
from mst_tpu.ops.rotary import (
    apply_liere,
    apply_rope,
    flat_to_skew,
    liere_rotations,
    num_skew_params,
    rope_angles,
)
from mst_tpu.ops.fused_block import (  # noqa: F401,E402
    fused_attention_sublayer,
    fused_mlp_sublayer,
)
from mst_tpu.ops.gradcam import (  # noqa: F401,E402
    argmax_logit_gradcam,
    grad_cam_map,
    grad_cam_weights,
)
from mst_tpu.ops.rotary import rope_2d_angles  # noqa: F401,E402
from mst_tpu.ops.saliency import (  # noqa: F401,E402
    attention_rollout,
    combined_saliency,
    plane_attention,
    slice_attention,
    upsample_saliency,
)
