from .config import PRESETS, ModelConfig, from_hf_dict, load_config
from .decoder import (
    DenseLinear,
    KVCache,
    apply_linear,
    decode_step,
    greedy_generate,
    init_params,
    model_forward,
    prefill,
)
