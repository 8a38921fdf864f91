from .checkpoint import load_checkpoint, save_awq_checkpoint, save_paro_checkpoint
from .rtn import quantize_experts_rtn, quantize_linear_rtn, quantize_model_rtn
