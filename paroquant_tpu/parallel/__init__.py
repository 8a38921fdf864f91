from .pipeline import make_pp_mesh, pipeline_logits
from .ring import ring_attention, sp_sharding
from .shard import (
    cache_specs,
    make_mesh,
    param_specs,
    replicate,
    shard_cache,
    shard_params,
)
