"""Decoder model tests: KV-cache consistency, quantized-model parity at high
bit width, MoE dispatch-path equivalence, greedy decode determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paroquant_tpu.convert import quantize_model_rtn
from paroquant_tpu.models import PRESETS, KVCache, greedy_generate, init_params, model_forward
from paroquant_tpu.ops import moe as moe_ops


@pytest.fixture(scope="module")
def tiny():
    config = PRESETS["tiny"]
    params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.float32)
    return config, params


def test_forward_shapes(tiny):
    config, params = tiny
    tokens = jnp.asarray(np.arange(12).reshape(2, 6) % config.vocab_size, jnp.int32)
    logits, _ = model_forward(params, config, tokens)
    assert logits.shape == (2, 6, config.vocab_size)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()


def test_kv_cache_matches_full_forward(tiny):
    """prefill(t[:4]) + decode steps == one full forward (cache correctness)."""
    config, params = tiny
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, (1, 8)), jnp.int32)
    full_logits, _ = model_forward(params, config, tokens)

    cache = KVCache.create(config, 1, 16, jnp.float32)
    _, cache = model_forward(params, config, tokens[:, :4], cache)
    outs = []
    for i in range(4, 8):
        logits, cache = model_forward(params, config, tokens[:, i : i + 1], cache)
        outs.append(np.asarray(logits[:, 0]))
    inc = np.stack(outs, axis=1)
    np.testing.assert_allclose(inc, np.asarray(full_logits[:, 4:]), rtol=2e-3, atol=2e-3)


def test_causality(tiny):
    """Changing a future token must not affect earlier logits."""
    config, params = tiny
    rng = np.random.default_rng(1)
    t1 = rng.integers(0, config.vocab_size, (1, 6))
    t2 = t1.copy()
    t2[0, -1] = (t2[0, -1] + 7) % config.vocab_size
    l1, _ = model_forward(params, config, jnp.asarray(t1, jnp.int32))
    l2, _ = model_forward(params, config, jnp.asarray(t2, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(l1[:, :-1]), np.asarray(l2[:, :-1]), atol=1e-5
    )


def test_quantized_model_8bit_close_to_dense(tiny):
    """At 8 bits the quantized model's logits track the dense model closely."""
    config, params = tiny
    qparams = quantize_model_rtn(params, config, n_bits=8, group_size=64, seed=0)
    tokens = jnp.asarray(
        np.random.default_rng(2).integers(0, config.vocab_size, (1, 6)), jnp.int32
    )
    dense_logits, _ = model_forward(params, config, tokens)
    q_logits, _ = model_forward(qparams, config, tokens)
    d, q = np.asarray(dense_logits), np.asarray(q_logits)
    rel = np.linalg.norm(q - d) / np.linalg.norm(d)
    assert rel < 0.05, rel
    # greedy tokens should agree at 8 bit on a tiny model
    assert (d.argmax(-1) == q.argmax(-1)).mean() > 0.9


def test_quantized_model_4bit_runs(tiny):
    config, params = tiny
    qparams = quantize_model_rtn(params, config, n_bits=4, group_size=64, seed=0)
    out = greedy_generate(
        qparams, config, np.array([[1, 2, 3]], np.int64), max_new_tokens=5,
        cache_dtype=jnp.float32,
    )
    assert out.shape == (1, 5)


def test_quant_mode_auto_matches_xla(tiny):
    """mode='auto' (per-M fused/xla dispatch) plumbs through the full model
    path; on CPU it must resolve to the xla path bit-for-bit."""
    config, params = tiny
    qparams = quantize_model_rtn(params, config, n_bits=4, group_size=64, seed=0)
    tokens = jnp.asarray(
        np.random.default_rng(4).integers(0, config.vocab_size, (1, 6)), jnp.int32
    )
    l_xla, _ = model_forward(qparams, config, tokens, quant_mode="xla")
    l_auto, _ = model_forward(qparams, config, tokens, quant_mode="auto")
    np.testing.assert_array_equal(np.asarray(l_xla), np.asarray(l_auto))


def test_greedy_generate_deterministic(tiny):
    config, params = tiny
    prompt = np.array([[5, 9, 2, 14]], np.int64)
    a = greedy_generate(params, config, prompt, 6, cache_dtype=jnp.float32)
    b = greedy_generate(params, config, prompt, 6, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(a, b)


def test_moe_dispatch_paths_agree():
    """gather path (decode) and capacity path (prefill) produce the same MoE output."""
    rng = np.random.default_rng(3)
    E, H, I, T, K = 8, 64, 32, 16, 2
    experts = {
        "gate_proj": jnp.asarray(rng.normal(0, 0.1, (E, H, I)), jnp.float32),
        "up_proj": jnp.asarray(rng.normal(0, 0.1, (E, H, I)), jnp.float32),
        "down_proj": jnp.asarray(rng.normal(0, 0.1, (E, I, H)), jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(T, H)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, E, (T, K)), jnp.int32)
    gates = jnp.asarray(rng.uniform(0, 1, (T, K)), jnp.float32)
    y_gather = moe_ops._moe_gather(experts, x, idx, gates)
    y_cap = moe_ops._moe_capacity(experts, x, idx, gates, capacity_factor=8.0)
    np.testing.assert_allclose(np.asarray(y_gather), np.asarray(y_cap), rtol=1e-4, atol=1e-5)


def test_moe_model_forward():
    config = PRESETS["tiny-moe"]
    params = init_params(config, jax.random.PRNGKey(1), dtype=jnp.float32)
    tokens = jnp.asarray(np.arange(10).reshape(2, 5), jnp.int32)
    logits, _ = model_forward(params, config, tokens)
    assert logits.shape == (2, 5, config.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    out = greedy_generate(params, config, np.array([[1, 2]], np.int64), 4, cache_dtype=jnp.float32)
    assert out.shape == (1, 4)


def test_quantized_lm_head():
    import dataclasses

    config = dataclasses.replace(PRESETS["tiny"], tie_word_embeddings=False)
    params = init_params(config, jax.random.PRNGKey(2), dtype=jnp.float32)
    q = quantize_model_rtn(params, config, n_bits=8, group_size=64, quantize_lm_head=True)
    from paroquant_tpu.ops.qlinear import QuantizedLinear

    assert isinstance(q["lm_head"], QuantizedLinear)
    tokens = jnp.asarray(np.random.default_rng(5).integers(0, config.vocab_size, (1, 6)), jnp.int32)
    l_d, _ = model_forward(params, config, tokens)
    l_q, _ = model_forward(q, config, tokens)
    rel = float(jnp.linalg.norm(l_q - l_d) / jnp.linalg.norm(l_d))
    assert rel < 0.05, rel


def test_moe_ragged_exact_under_imbalance():
    """The ragged (drop-free) prefill dispatch must equal the gather path
    even when every token routes to one expert — where the capacity path at
    factor 2.0 drops most assignments (VERDICT r1 item 10)."""
    from paroquant_tpu.ops import moe as moe_ops

    rng = np.random.default_rng(17)
    E, H, I, T, K = 8, 128, 64, 48, 2
    experts = {
        "gate_proj": jnp.asarray(rng.normal(0, 0.1, (E, H, I)), jnp.float32),
        "up_proj": jnp.asarray(rng.normal(0, 0.1, (E, H, I)), jnp.float32),
        "down_proj": jnp.asarray(rng.normal(0, 0.1, (E, I, H)), jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(T, H)), jnp.float32)
    # pathological routing: everyone picks experts 0 and 1
    idx = jnp.asarray(np.stack([np.zeros(T), np.ones(T)], axis=1), jnp.int32)
    gates = jnp.asarray(rng.uniform(0, 1, (T, K)), jnp.float32)

    y_exact = moe_ops._moe_ragged(experts, x, idx, gates)
    y_gather = moe_ops._moe_gather(experts, x, idx, gates)
    np.testing.assert_allclose(np.asarray(y_exact), np.asarray(y_gather),
                               rtol=1e-4, atol=1e-5)
    # the capacity path at factor 2.0 WOULD drop here (sanity: differs)
    y_cap = moe_ops._moe_capacity(experts, x, idx, gates, capacity_factor=2.0)
    assert np.abs(np.asarray(y_cap) - np.asarray(y_gather)).max() > 1e-3

    # balanced routing: ragged == gather == capacity
    idx_b = jnp.asarray(rng.integers(0, E, (T, K)), jnp.int32)
    yb_exact = moe_ops._moe_ragged(experts, x, idx_b, gates)
    yb_gather = moe_ops._moe_gather(experts, x, idx_b, gates)
    np.testing.assert_allclose(np.asarray(yb_exact), np.asarray(yb_gather),
                               rtol=1e-4, atol=1e-5)


def test_mlp_only_layers_force_dense():
    """HF Qwen2/3-MoE `mlp_only_layers`: listed layers run a dense MLP even
    in an otherwise-sparse model (init + forward respect it)."""
    import dataclasses

    from paroquant_tpu.models import from_hf_dict

    cfg = from_hf_dict(dict(
        model_type="qwen3_moe", vocab_size=64, hidden_size=64,
        intermediate_size=96, num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, rope_theta=10000.0,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        mlp_only_layers=[1], tie_word_embeddings=True,
    ))
    assert cfg.layer_is_sparse(0) and not cfg.layer_is_sparse(1) and cfg.layer_is_sparse(2)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    assert "experts" in params["layers"][0]["mlp"]
    assert "experts" not in params["layers"][1]["mlp"]
    logits, _ = model_forward(params, cfg, jnp.asarray([[1, 2, 3]], jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()


def test_quant_mode_auto_a8_at_big_geometry():
    """At >=8M-weight matrices (7B-class), auto serves the a8 rounding at
    decode M and stays BIT-exact W4A16 at prefill M (VERDICT r4 item 3).
    The small-geometry companion (test_quant_mode_auto_matches_xla) pins
    that sub-crossover models keep exact W4A16 everywhere."""
    import dataclasses

    from paroquant_tpu.models import PRESETS, init_params

    # one layer, gate_up 1024x16384 = 16.8M / down 8192x1024 = 8.4M weights
    # (above AUTO_W4A8_MIN_KN); qkv/o stay far below (exact W4A16)
    config = dataclasses.replace(
        PRESETS["tiny"], hidden_size=1024, intermediate_size=8192,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        head_dim=64)
    params = init_params(config, jax.random.PRNGKey(9), dtype=jnp.float32)
    qparams = quantize_model_rtn(params, config, n_bits=4, group_size=128,
                                 seed=0)
    tok = jnp.asarray([[7]], jnp.int32)  # decode M=1
    l_xla, _ = model_forward(qparams, config, tok, quant_mode="xla")
    l_auto, _ = model_forward(qparams, config, tok, quant_mode="auto")
    # a8 engaged on the big MLP matrices: logits differ from exact W4A16...
    assert np.abs(np.asarray(l_auto) - np.asarray(l_xla)).max() > 0
    # ...by activation-rounding noise only
    np.testing.assert_allclose(np.asarray(l_auto), np.asarray(l_xla),
                               rtol=0.1, atol=0.1)
    # prefill M (> AUTO_FUSED_MAX_M=128 tokens): bit-exact W4A16
    toks = jnp.asarray(
        np.random.default_rng(5).integers(0, config.vocab_size, (1, 160)),
        jnp.int32)
    p_xla, _ = model_forward(qparams, config, toks, quant_mode="xla")
    p_auto, _ = model_forward(qparams, config, toks, quant_mode="auto")
    np.testing.assert_array_equal(np.asarray(p_xla), np.asarray(p_auto))


def test_kv_cache_per_layer_leaves(tiny):
    """KVCache stores PER-LAYER tuple leaves, not one stacked [L, ...]
    array (round-5: the stacked scan carry cost ~2 full-cache copies per
    decode step — slice-out + jnp.stack-back every step; per-layer leaves
    let each layer's one-token DUS alias in place). Pin the structure so
    a refactor doesn't quietly re-stack it."""
    config, params = tiny
    cache = KVCache.create(config, 2, 16, jnp.float32)
    assert isinstance(cache.k, tuple) and isinstance(cache.v, tuple)
    assert len(cache.k) == config.num_full_attn_layers
    # per-layer head-major leaves [B, Hkv, S, D]
    assert cache.k[0].shape == (
        2, config.num_key_value_heads, 16, config.head_dim)
    tokens = jnp.asarray([[3, 1, 4]], jnp.int32)
    cache1 = KVCache.create(config, 1, 16, jnp.float32)
    _, c2 = model_forward(params, config, tokens, cache1)
    assert isinstance(c2.k, tuple) and len(c2.k) == len(cache1.k)
    assert c2.k[0].shape == cache1.k[0].shape
