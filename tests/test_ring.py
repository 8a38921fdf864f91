"""Ring-attention SP: exactness vs the single-device attention math.

Runs on the 8-virtual-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from paroquant_tpu.models.decoder import attention
from paroquant_tpu.parallel.ring import ring_attention

pytestmark = pytest.mark.fast


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("sp",))


def _mk(B, S, Hq, Hkv, D, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    return q, k, v, pos


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("window,softcap", [(None, None), (96, None), (None, 30.0)])
def test_ring_matches_single_device(n_dev, window, softcap):
    B, S, Hq, Hkv, D = 2, 256, 4, 2, 32
    q, k, v, pos = _mk(B, S, Hq, Hkv, D)
    scale = 1.0 / np.sqrt(D)
    ref = attention(
        q, k, v, pos, jnp.int32(S), scale=scale,
        sliding_window=window, logit_softcap=softcap,
    )
    mesh = _mesh(n_dev)
    sh = NamedSharding(mesh, P(None, "sp", None, None))
    psh = NamedSharding(mesh, P(None, "sp"))
    out = ring_attention(
        jax.device_put(q, sh), jax.device_put(k, sh), jax.device_put(v, sh),
        jax.device_put(pos, psh), mesh, scale=scale,
        sliding_window=window, logit_softcap=softcap,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_ring_shards_memory():
    """Each device's addressable q/k/v shard is S/P of the sequence."""
    B, S, Hq, Hkv, D = 1, 512, 4, 2, 32
    q, k, v, pos = _mk(B, S, Hq, Hkv, D)
    mesh = _mesh(8)
    sh = NamedSharding(mesh, P(None, "sp", None, None))
    qd = jax.device_put(q, sh)
    assert qd.addressable_shards[0].data.shape == (B, S // 8, Hq, D)


def test_ring_bf16_inputs():
    """bf16 q/k/v (the production dtype) stay within bf16 tolerance."""
    B, S, Hq, Hkv, D = 1, 128, 4, 4, 64
    q, k, v, pos = _mk(B, S, Hq, Hkv, D, seed=3)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    scale = 1.0 / np.sqrt(D)
    ref = attention(qb, kb, vb, pos, jnp.int32(S), scale=scale)
    mesh = _mesh(4)
    sh = NamedSharding(mesh, P(None, "sp", None, None))
    psh = NamedSharding(mesh, P(None, "sp"))
    out = ring_attention(
        jax.device_put(qb, sh), jax.device_put(kb, sh), jax.device_put(vb, sh),
        jax.device_put(pos, psh), mesh, scale=scale,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_sp_prefill_matches_prefill():
    """Full-model SP prefill (ring attention, sequence sharded over 8
    devices) matches the single-device einsum prefill logits."""
    from paroquant_tpu.models import PRESETS, init_params
    from paroquant_tpu.models.decoder import model_forward
    from paroquant_tpu.parallel.ring import sp_prefill

    config = PRESETS["tiny"]
    params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(
        rng.integers(0, config.vocab_size, (2, 64)), jnp.int32)
    ref, _ = model_forward(params, config, tokens, None, quant_mode="xla")
    out = sp_prefill(params, config, tokens, _mesh(8))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_sp_prefill_rejects_indivisible():
    from paroquant_tpu.models import PRESETS, init_params
    from paroquant_tpu.parallel.ring import sp_prefill

    config = PRESETS["tiny"]
    params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.float32)
    tokens = jnp.zeros((1, 30), jnp.int32)
    with pytest.raises(ValueError):
        sp_prefill(params, config, tokens, _mesh(8))


def test_sp_prefill_striped_matches():
    """Zigzag (load-balanced) layout returns identical logits."""
    from paroquant_tpu.models import PRESETS, init_params
    from paroquant_tpu.models.decoder import model_forward
    from paroquant_tpu.parallel.ring import sp_prefill

    config = PRESETS["tiny"]
    params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(9)
    tokens = jnp.asarray(
        rng.integers(0, config.vocab_size, (2, 128)), jnp.int32)
    ref, _ = model_forward(params, config, tokens, None, quant_mode="xla")
    out = sp_prefill(params, config, tokens, _mesh(4), layout="striped")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("bq,bkv", [(16, 16), (32, 64), (7, 13)])
def test_ring_chunked_matches(bq, bkv):
    """kv-scan + q-map chunking is exact for any chunk target (non-divisor
    targets round down to a divisor)."""
    B, S, Hq, Hkv, D = 1, 256, 4, 2, 32
    q, k, v, pos = _mk(B, S, Hq, Hkv, D, seed=11)
    scale = 1.0 / np.sqrt(D)
    ref = attention(q, k, v, pos, jnp.int32(S), scale=scale)
    mesh = _mesh(4)
    sh = NamedSharding(mesh, P(None, "sp", None, None))
    psh = NamedSharding(mesh, P(None, "sp"))
    out = ring_attention(
        jax.device_put(q, sh), jax.device_put(k, sh), jax.device_put(v, sh),
        jax.device_put(pos, psh), mesh, scale=scale,
        block_q=bq, block_kv=bkv,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_sp_prefill_fused_kernels():
    """sp_prefill with quant_mode="fused": quantized layers wrap token-
    sharded (parallel/tp.sp_wrap_params) so each ring device launches the
    Pallas kernels on its own rows — logits match the single-device fused
    forward to fused-numerics tolerance (bf16 rotation storage)."""
    import dataclasses

    from paroquant_tpu.convert import quantize_model_rtn
    from paroquant_tpu.models import PRESETS
    from paroquant_tpu.models.decoder import (
        init_params, merge_projections, model_forward,
    )
    from paroquant_tpu.parallel.ring import sp_prefill

    config = dataclasses.replace(
        PRESETS["tiny"], hidden_size=256, intermediate_size=512,
        num_attention_heads=4, num_key_value_heads=2, head_dim=64,
    )
    params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = merge_projections(
        quantize_model_rtn(params, config, n_bits=4, group_size=128, seed=1),
        config,
    )
    toks = jnp.asarray(
        np.random.default_rng(2).integers(0, config.vocab_size, (1, 64)),
        jnp.int32,
    )
    ref, _ = model_forward(qparams, config, toks, None, quant_mode="fused")
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    for layout in ("contiguous", "striped"):
        out = sp_prefill(qparams, config, toks, mesh, quant_mode="fused",
                         layout=layout)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)
        # most positions should agree on the argmax (fused-vs-fused; the
        # tolerance above is ring-softmax + bf16-rotation reassociation)
        agree = np.mean(
            np.argmax(np.asarray(out), -1) == np.argmax(np.asarray(ref), -1))
        assert agree > 0.9, agree


@pytest.mark.slow
def test_sp_prefill_fused_moe_shared_expert():
    """Regression (round-4 review): MoE models flatten tokens to [T', H]
    before the shared-expert linears; the tok-sharded TP wrappers must
    accept 2-D activations or `evaluate --sp` crashes at trace time on
    every shared-expert model under the TPU-default quant_mode."""
    import dataclasses

    from paroquant_tpu.convert import quantize_model_rtn
    from paroquant_tpu.models import PRESETS
    from paroquant_tpu.models.decoder import init_params, model_forward
    from paroquant_tpu.parallel.ring import sp_prefill

    config = dataclasses.replace(
        PRESETS["tiny-moe"], hidden_size=256, intermediate_size=512,
        moe_intermediate_size=128, shared_expert_intermediate_size=256,
        num_attention_heads=4, num_key_value_heads=2, head_dim=64,
    )
    params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_model_rtn(params, config, n_bits=4, group_size=128, seed=1)
    toks = jnp.asarray(
        np.random.default_rng(3).integers(0, config.vocab_size, (1, 32)),
        jnp.int32,
    )
    ref, _ = model_forward(qparams, config, toks, None, quant_mode="fused")
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    out = sp_prefill(qparams, config, toks, mesh, quant_mode="fused")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
