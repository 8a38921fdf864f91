from .checkpoint import load_checkpoint, save_awq_checkpoint, save_paro_checkpoint
from .gptq import gptq_quantize_model, gptq_quantize_weight
from .rtn import quantize_experts_rtn, quantize_linear_rtn, quantize_model_rtn
