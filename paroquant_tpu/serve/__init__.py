from .engine import Engine, Request
from .router import EngineRouter
from .generator import (
    GenerationResult,
    GenerationStats,
    Generator,
    create_generator,
    detect_backend,
    load_tokenizer,
)
from .paged import PagedKVCache, paged_decode_step
from .sampling import SamplingParams, sample_token
