from .quant import (
    QuantizerParams,
    calc_scales_and_zero_points,
    clamp_ste,
    dequantize_int,
    pseudo_quantize,
    quantize_to_int,
    round_ste,
)
from .rotation import (
    PermutationForm,
    RotationParams,
    apply_rotation_matrices,
    apply_rotation_stages,
    build_rotation_matrices,
    effective_theta,
    generate_random_pairs,
    make_rotation_params,
    pack_pairs,
    pairs_to_permutation,
    scaled_pairwise_rotation,
    to_permutation_form,
)
from .packing import pack_awq, pack_w4_tpu, unpack_awq, unpack_w4_tpu
from .qlinear import (
    QuantizedLinear,
    dequantized_weight,
    effective_weight,
    make_quantized_linear,
    quantized_linear_forward,
)
