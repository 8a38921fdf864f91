"""int8 quantized KV cache (vLLM --kv-cache-dtype counterpart).

The paged pools hold symmetric per-(token, head) int8 values with f32
dequant scales [L, P, Hkv, ps]; quantization happens at page-write time
(prefill scatter + decode/verify writes) and dequantization inside the
attention reads (einsum path and the Pallas kernels). Reference behavior:
vLLM kv_cache_dtype (SURVEY.md §2.3/§5.7 serving stack).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paroquant_tpu.kernels.attention import (
    paged_decode_attention,
    paged_window_attention_kernel,
)
from paroquant_tpu.models import PRESETS, init_params
from paroquant_tpu.serve import Engine, SamplingParams
from paroquant_tpu.serve.paged import (
    PagedKVCache,
    _dequant_pages,
    kv_quantize,
    paged_attention,
    paged_window_attention,
    scatter_prefill_kv,
)
from paroquant_tpu.serve.paged import gather_prefix_rows


def test_kv_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 5, 64)) * 7.0, jnp.float32)
    q, s = kv_quantize(x)
    assert q.dtype == jnp.int8
    deq = q.astype(jnp.float32) * s[..., None]
    # symmetric int8: |err| <= scale/2 = amax/254 per element
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    assert np.all(np.abs(np.asarray(deq - x)) <= amax / 254 + 1e-7)


def _mk_quant_pool(rng, L, P, ps, Hkv, D):
    """Random float pool -> (float pool, int8 pool + scales)."""
    kf = jnp.asarray(rng.normal(size=(L, P, ps, Hkv, D)), jnp.float32)
    q, s = kv_quantize(kf)  # scales [L, P, ps, Hkv]
    s = jnp.swapaxes(s, -1, -2)  # -> [L, P, Hkv, ps]
    return _dequant_pages(q, s), q, s


def test_paged_decode_kernel_matches_einsum_dequant():
    rng = np.random.default_rng(1)
    L, P, ps, Hkv, D, Hq, B, maxP = 1, 6, 16, 2, 32, 4, 2, 3
    kd, kq, ks = _mk_quant_pool(rng, L, P, ps, Hkv, D)
    vd, vq, vs = _mk_quant_pool(rng, L, P, ps, Hkv, D)
    q = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.float32)
    table = jnp.asarray(rng.permutation(P)[: B * maxP].reshape(B, maxP), jnp.int32)
    lens = jnp.asarray([13, 37], jnp.int32)

    out_kernel = paged_decode_attention(
        q, kq[0], vq[0], table, lens, scale=0.3,
        k_scales=ks[0], v_scales=vs[0], interpret=True,
    )
    out_ref = paged_attention(
        q, kd[0][table], vd[0][table], lens, scale=0.3,
    )
    np.testing.assert_allclose(
        np.asarray(out_kernel), np.asarray(out_ref), rtol=2e-5, atol=2e-5
    )


def test_paged_window_kernel_matches_einsum_dequant():
    rng = np.random.default_rng(2)
    L, P, ps, Hkv, D, Hq, B, maxP, W = 1, 6, 16, 2, 32, 4, 2, 3, 3
    kd, kq, ks = _mk_quant_pool(rng, L, P, ps, Hkv, D)
    vd, vq, vs = _mk_quant_pool(rng, L, P, ps, Hkv, D)
    q = jnp.asarray(rng.normal(size=(B, W, Hq, D)), jnp.float32)
    table = jnp.asarray(rng.permutation(P)[: B * maxP].reshape(B, maxP), jnp.int32)
    lens = jnp.asarray([9, 30], jnp.int32)  # lengths BEFORE the window

    out_kernel = paged_window_attention_kernel(
        q, kq[0], vq[0], table, lens, scale=0.3,
        k_scales=ks[0], v_scales=vs[0], interpret=True,
    )
    positions = np.asarray(lens)[:, None] + np.arange(W)[None, :]
    out_ref = paged_window_attention(
        q, kd[0][table], vd[0][table], jnp.asarray(positions, jnp.int32),
        scale=0.3,
    )
    np.testing.assert_allclose(
        np.asarray(out_kernel), np.asarray(out_ref), rtol=2e-5, atol=2e-5
    )


def test_scatter_gather_roundtrip_quantized():
    config = PRESETS["tiny"]
    ps, n_pages = 8, 6
    cache = PagedKVCache.create(config, n_pages, ps, kv_quant="int8")
    L = config.num_hidden_layers
    Hkv, D = config.num_key_value_heads, config.head_dim
    rng = np.random.default_rng(3)
    T = 19
    layer_k = jnp.asarray(rng.normal(size=(L, T, Hkv, D)), jnp.float32)
    layer_v = jnp.asarray(rng.normal(size=(L, T, Hkv, D)), jnp.float32)
    pages = jnp.asarray([4, 0, 2, 5], jnp.int32)
    cache = scatter_prefill_kv(config, cache, layer_k, layer_v, pages)
    assert cache.k.dtype == jnp.int8

    # gather returns the KVCache layout: per-layer head-major tuples
    # [1, Hkv, rows, D]
    k, v = gather_prefix_rows(cache, pages, T, out_dtype=jnp.float32)
    amax = np.abs(np.asarray(layer_k)).max(axis=-1, keepdims=True)
    k_rows = np.stack(
        [np.swapaxes(np.asarray(kl[0]), 0, 1)[:T] for kl in k])
    err = np.abs(k_rows - np.asarray(layer_k))
    assert np.all(err <= amax / 250 + 1e-6)


def _tiny_engine(kv_quant=None, **kw):
    config = PRESETS["tiny"]
    params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.float32)
    return config, Engine(
        params, config, max_batch=2, max_len=64, page_size=8,
        quant_mode="xla", cache_dtype=jnp.float32, kv_quant=kv_quant, **kw
    )


@pytest.mark.parametrize("features", [{}, {"decode_burst": 3},
                                      {"prefix_caching": True},
                                      {"spec_k": 2}])
def test_engine_int8_kv_matches_float(features):
    """On the tiny random model the int8-KV engine's greedy tokens match the
    float-KV engine exactly (quant noise is far below the logit margins);
    burst decode, prefix caching and speculative decoding all compose."""
    config, ref_eng = _tiny_engine(None)
    _, q8_eng = _tiny_engine("int8", **features)
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(0, config.vocab_size, 21))
    sp = SamplingParams(max_tokens=12, temperature=0.0)
    ref = ref_eng.generate_sync(prompt, sp)
    got = q8_eng.generate_sync(prompt, sp)
    assert got == ref
    if features.get("prefix_caching"):
        # second identical request rides the quantized cached prefix
        got2 = q8_eng.generate_sync(prompt, sp)
        assert got2 == ref
        assert q8_eng.metrics["prefix_hit_tokens"] > 0


def test_engine_int8_kv_tp_matches_single_device():
    from paroquant_tpu.parallel import make_mesh

    config, ref_eng = _tiny_engine("int8")
    params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.float32)
    tp_eng = Engine(
        params, config, max_batch=2, max_len=64, page_size=8,
        quant_mode="xla", cache_dtype=jnp.float32, kv_quant="int8",
        mesh=make_mesh(n_data=4, n_model=2),
    )
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(0, config.vocab_size, 21))
    sp = SamplingParams(max_tokens=10, temperature=0.0)
    assert tp_eng.generate_sync(prompt, sp) == ref_eng.generate_sync(prompt, sp)


def test_gemma3n_rejects_kv_quant():
    config = PRESETS["tiny-gemma3n"]
    params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.float32)
    with pytest.raises(ValueError, match="gemma3n"):
        Engine(params, config, max_batch=2, max_len=64, page_size=8,
               quant_mode="xla", cache_dtype=jnp.float32, kv_quant="int8")
