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
